"""Encode/decode stages: Arrow table ⇄ encoded segment table.

A *segment* is the encoded form of one partition: an Arrow table with
one row per source column carrying the codec name, metadata and raw
buffers.  Segments are persisted as Parquet, so the storage layer stays
pure Parquet like the reference (``IPersistentStreams``,
``Parquet.Producers/IPersistentStreams.cs:10-17``) while the encoding
layer is explicit (SURVEY.md §2.3).

``EncoderPool`` is the stateful actor-pool stage: FSST symbol tables
are trained once per (actor, column) and reused across ``map_batches``
calls — setup-per-actor, work-per-batch.
"""

from __future__ import annotations

import pyarrow as pa

from ..codecs import CODECS, Encoded, select_codec
from ..codecs import fsst as fsst_codec
from ..codecs import plain as plain_codec
from ..codecs import prefix as prefix_codec

SEGMENT_SCHEMA = pa.schema([
    pa.field("column", pa.string(), nullable=False),
    pa.field("codec", pa.string(), nullable=False),
    pa.field("n", pa.int64(), nullable=False),
    pa.field("field", pa.large_binary(), nullable=False),
    pa.field("meta", pa.string(), nullable=False),
    pa.field("buffers", pa.large_list(pa.large_binary()), nullable=False),
])


def encode_table(table: pa.Table, allowed: list | None = None,
                 fsst_tables: dict | None = None) -> tuple[pa.Table, dict]:
    """Encode every column; returns (segment table, {col: codec})."""
    rows, choices = [], {}
    for name in table.column_names:
        arr = table.column(name).combine_chunks()
        sel_state: dict = {}
        codec_name = select_codec(arr, allowed, sel_state)
        try:
            if codec_name == fsst_codec.NAME:
                tbl = (fsst_tables.get(name)
                       if fsst_tables is not None else None)
                if tbl is None:
                    # symbol table trained on the selection sample —
                    # reused, never re-trained on the full column
                    tbl = (sel_state.get("fsst_table")
                           or fsst_codec.train_from_array(arr))
                    if fsst_tables is not None:
                        fsst_tables[name] = tbl
                enc = fsst_codec.encode(arr, tbl)
            elif codec_name == prefix_codec.NAME:
                # reuse the selector's sample-trained table for the
                # FSST-suffix candidate — never retrain per column
                enc = prefix_codec.encode(
                    arr, fsst_table=sel_state.get("fsst_table"))
            else:
                enc = CODECS[codec_name].encode(arr)
        except (ValueError, pa.ArrowInvalid,
                pa.lib.ArrowNotImplementedError):
            enc = plain_codec.encode(arr)
        choices[name] = enc.codec
        rows.append(enc.to_row(name))
    seg = pa.Table.from_pylist(rows, schema=SEGMENT_SCHEMA)
    seg = seg.replace_schema_metadata(
        {b"source_schema": table.schema.serialize().to_pybytes()})
    return seg, choices


def decode_segment(seg: pa.Table, columns: list | None = None) -> pa.Table:
    """Inverse of :func:`encode_table` — bit-identical reconstruction.

    ``columns`` restricts the output (and the decode work) to a subset;
    a segment that was already read column-pruned (Parquet row-group
    filters on the ``column`` field — each column row is its own row
    group) decodes only what it carries either way."""
    from ..codecs import decode as decode_one
    meta = seg.schema.metadata or {}
    schema = pa.ipc.read_schema(pa.py_buffer(meta[b"source_schema"])) \
        if b"source_schema" in meta else None
    if schema is not None and columns is not None:
        schema = pa.schema([schema.field(i) for i in range(len(schema))
                            if schema.field(i).name in columns])
    if seg.num_rows == 0:
        # an empty block may still carry segment-schema metadata
        return schema.empty_table() if schema is not None \
            else pa.table({})
    cols = {}
    for row in seg.to_pylist():
        if columns is not None and row["column"] not in columns:
            continue
        enc = Encoded.from_row(row)
        cols[row["column"]] = decode_one(enc)
    if schema is None:
        schema = pa.schema([pa.field(n, a.type) for n, a in cols.items()])
    return pa.table(cols, schema=schema)


def decode_segments_batch(batch: pa.Table) -> pa.Table:
    """Decode a batch holding one or MORE concatenated segments.

    Ray Data may coalesce the outputs of several encode calls into one
    block between ``map_batches`` stages; each segment lists every
    source column exactly once and segments are contiguous, so a repeat
    of an already-seen column name marks a segment boundary.
    """
    names = batch.column("column").to_pylist()
    bounds, seen = [0], set()
    for i, n in enumerate(names):
        if n in seen:
            bounds.append(i)
            seen = {n}
        else:
            seen.add(n)
    bounds.append(len(names))
    parts = [decode_segment(batch.slice(s, e - s))
             for s, e in zip(bounds[:-1], bounds[1:])]
    return pa.concat_tables(parts)


class EncoderPool:
    """Actor-pool encode stage for ``map_batches``.

    State (trained FSST symbol tables per column, pinned codec choices)
    lives for the life of the actor and is reused across batches —
    the north-rule "stateful actor pools own FSST/dict symbol tables
    across map_batches calls".
    """

    def __init__(self, allowed: list | None = None,
                 pin_codecs_after_first_batch: bool = True):
        self.allowed = allowed
        self.pin = pin_codecs_after_first_batch
        self.fsst_tables: dict = {}
        self.pinned: list | dict | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        allowed = self.allowed
        if self.pinned is not None:
            seg, _ = _encode_pinned(batch, self.pinned, self.fsst_tables)
            return seg
        seg, choices = encode_table(batch, allowed, self.fsst_tables)
        if self.pin:
            self.pinned = choices
        return seg


def _encode_pinned(table: pa.Table, choices: dict,
                   fsst_tables: dict) -> tuple[pa.Table, dict]:
    rows = {}
    out = []
    for name in table.column_names:
        arr = table.column(name).combine_chunks()
        codec_name = choices.get(name, "plain")
        try:
            if codec_name == fsst_codec.NAME:
                tbl = fsst_tables.get(name)
                if tbl is None:
                    tbl = fsst_codec.train_from_array(arr)
                    fsst_tables[name] = tbl
                enc = fsst_codec.encode(arr, tbl)
            elif codec_name == prefix_codec.NAME:
                enc = prefix_codec.encode(
                    arr, fsst_table=fsst_tables.get(name))
            else:
                enc = CODECS[codec_name].encode(arr)
        except (ValueError, pa.ArrowInvalid,
                pa.lib.ArrowNotImplementedError):
            enc = plain_codec.encode(arr)
        rows[name] = enc.codec
        out.append(enc.to_row(name))
    seg = pa.Table.from_pylist(out, schema=SEGMENT_SCHEMA)
    seg = seg.replace_schema_metadata(
        {b"source_schema": table.schema.serialize().to_pybytes()})
    return seg, rows
