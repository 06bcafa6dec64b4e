"""Codec framework: Encoded container + shared helpers.

The reference delegates all columnar encoding to Parquet.Net defaults
(``Parquet.Producers/ParquetProducerPlatformOptions.cs:17``,
row-group sizing ``ParquetProducerOptions.cs:5``); this engine makes
that layer explicit (SURVEY.md §2.3).  Every codec is a pure
Arrow/NumPy kernel with no Ray dependency:

    encode(pa.Array) -> Encoded
    decode(Encoded)  -> pa.Array       (bit-identical, incl. type+nulls)

``Encoded`` is a plain container of ``bytes`` buffers plus JSON-able
metadata so it can travel through Arrow tables / Parquet segment files.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa


@dataclass
class Encoded:
    """Result of encoding one column (or one component of a column)."""

    codec: str
    n: int                      # logical row count
    field_bytes: bytes          # serialized pa.Schema of one field (the original type)
    meta: dict = field(default_factory=dict)
    buffers: list = field(default_factory=list)   # list[bytes]

    @property
    def nbytes(self) -> int:
        return sum(len(b) for b in self.buffers) + len(json.dumps(self.meta))

    def to_row(self, name: str) -> dict:
        """Flatten for storage in an Arrow segment table."""
        return {
            "column": name,
            "codec": self.codec,
            "n": self.n,
            "field": self.field_bytes,
            "meta": json.dumps(self.meta),
            "buffers": list(self.buffers),
        }

    @staticmethod
    def from_row(row: dict) -> "Encoded":
        return Encoded(
            codec=row["codec"],
            n=int(row["n"]),
            field_bytes=bytes(row["field"]),
            meta=json.loads(row["meta"]),
            buffers=[bytes(b) for b in row["buffers"]],
        )


# ---------------------------------------------------------------------------
# field / schema serialization

def field_to_bytes(typ: pa.DataType) -> bytes:
    return pa.schema([pa.field("v", typ)]).serialize().to_pybytes()


def field_from_bytes(b: bytes) -> pa.DataType:
    return pa.ipc.read_schema(pa.py_buffer(b)).field(0).type


# ---------------------------------------------------------------------------
# Arrow IPC round-trip for arbitrary arrays (used by `plain` and as a
# component container by other codecs)

def ipc_bytes(arr: pa.Array) -> bytes:
    t = pa.table({"v": arr})
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue().to_pybytes()


def ipc_array(b: bytes) -> pa.Array:
    t = pa.ipc.open_stream(pa.py_buffer(b)).read_all()
    return t.column("v").combine_chunks()


# ---------------------------------------------------------------------------
# validity bitmaps

def validity_to_bytes(arr: pa.Array) -> tuple[bytes, bool]:
    """Return (packed validity bits, has_nulls)."""
    if arr.null_count == 0:
        return b"", False
    valid = np.asarray(arr.is_valid())
    return np.packbits(valid, bitorder="little").tobytes(), True


def validity_from_bytes(buf: bytes, n: int) -> np.ndarray | None:
    """Return bool ndarray of validity, or None when there were no nulls."""
    if not buf:
        return None
    return np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n,
                         bitorder="little").astype(bool)


def apply_validity(arr: pa.Array, valid: np.ndarray | None) -> pa.Array:
    if valid is None:
        return arr
    mask = pa.array(~valid)  # True = null for pc.if_else path; use nulls via mask
    # Rebuild with nulls: replace masked positions with null.
    import pyarrow.compute as pc
    return pc.if_else(mask, pa.nulls(len(arr), arr.type), arr)


# ---------------------------------------------------------------------------
# bit-packing primitives (little-endian bit order)

PACK_CHUNK = 1 << 20   # bound the n×width bit-matrix temporary


def pack_ints(vals: np.ndarray, width: int) -> bytes:
    """Pack non-negative uint64 values, each < 2**width, LSB-first.
    Chunked so the intermediate bit matrix stays ≤ ~64 MiB regardless
    of column length (width is a multiple of 8 bits per chunk boundary
    only when n*width % 8 == 0 — chunks are sized so it always is)."""
    if width == 0 or len(vals) == 0:
        return b""
    vals = vals.astype(np.uint64, copy=False)
    shifts = np.arange(width, dtype=np.uint64)
    if len(vals) <= PACK_CHUNK:
        bits = ((vals[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        return np.packbits(bits.reshape(-1), bitorder="little").tobytes()
    # chunk at multiples of 8 values → every chunk's bitstream is
    # byte-aligned, so byte concatenation equals one-shot packing
    step = PACK_CHUNK - PACK_CHUNK % 8
    out = []
    for s in range(0, len(vals), step):
        chunk = vals[s: s + step]
        bits = ((chunk[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        out.append(np.packbits(bits.reshape(-1),
                               bitorder="little").tobytes())
    return b"".join(out)


def unpack_ints(buf: bytes, width: int, n: int) -> np.ndarray:
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n * width,
                         bitorder="little")
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


def bits_needed(max_val: int) -> int:
    return int(max_val).bit_length() if max_val > 0 else 0


# ---------------------------------------------------------------------------
# bit-identity check (NaN-aware: NaN == NaN for round-trip purposes)

def arrays_bit_identical(a: pa.Array, b: pa.Array) -> bool:
    if a.type != b.type or len(a) != len(b):
        return False
    if (pa.types.is_list(a.type) or pa.types.is_large_list(a.type)
            or pa.types.is_fixed_size_list(a.type)):
        # Arrow's equals() is NaN != NaN even inside lists; compare
        # structure (validity + lengths) then the flattened values
        # bit-wise.  flatten() emits values of non-null slots only, so
        # equal structure ⇒ aligned flattened children.
        import pyarrow.compute as pc
        if not np.array_equal(np.asarray(a.is_valid()),
                              np.asarray(b.is_valid())):
            return False
        la = pc.list_value_length(a).fill_null(-1)
        lb = pc.list_value_length(b).fill_null(-1)
        if not la.equals(lb):
            return False
        return arrays_bit_identical(a.flatten(), b.flatten())
    if pa.types.is_floating(a.type):
        # BIT identity, not value equality: -0.0 != 0.0 and NaN
        # payloads must survive — compare the raw bit patterns of the
        # valid slots
        if a.null_count != b.null_count:
            return False
        va, vb = np.asarray(a.is_valid()), np.asarray(b.is_valid())
        if not np.array_equal(va, vb):
            return False
        width = a.type.bit_width
        itype = {16: np.uint16, 32: np.uint32, 64: np.uint64}[width]
        na = np.ascontiguousarray(
            a.to_numpy(zero_copy_only=False)[va]).view(itype)
        nb = np.ascontiguousarray(
            b.to_numpy(zero_copy_only=False)[vb]).view(itype)
        return bool(np.array_equal(na, nb))
    return a.equals(b)
