"""Front-coding (incremental prefix) codec for string/binary columns.

Each value stores only the byte length of the prefix it shares with the
PREVIOUS value plus its remaining suffix — the same layout as Parquet's
DELTA_BYTE_ARRAY encoding and the classic front coding of sorted string
dictionaries.  It shines exactly where this engine's flagship puts it:
partitions sorted by ``url`` (BASELINE.json north rule), where
consecutive urls share scheme+host+path prefixes far longer than any
FSST symbol (8 bytes max).  The suffix payload is itself trial-encoded
with FSST (codecs/fsst.py) and the smaller of raw-vs-FSST wins, a
two-level cascade in the BtrBlocks style (see PAPERS.md); the reference
repo has no encoding layer at all (defers to Parquet.Net defaults —
``Parquet.Producers/ParquetProducerPlatformOptions.cs:17``,
SURVEY.md §2.3).

The hot path is a pair of cc-compiled kernels (prefix_encode /
prefix_decode in codecs/_fsst_kernel.c — sequential memcmp/memcpy
loops, GB/s); the portable NumPy fallback computes prefix lengths by a
16-byte-chunk compare over all adjacent pairs at once and decodes with
a "last writer wins" running-maximum over a bounded row×byte matrix
(cross-parity between both paths is property-tested).  Nulls ride the
shared validity bitmap and participate in the chain as empty strings,
so round-trip is bit-identical including nulls and empty values
(`arrays_bit_identical`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import _native
from .base import (Encoded, apply_validity, bits_needed, field_from_bytes,
                   field_to_bytes, pack_ints, unpack_ints)

NAME = "prefix"

_CMP_CHUNK = 16            # bytes compared per vectorized iteration
_DECODE_CAP = 16 << 20     # bytes per decode matrix chunk

_ZSTD = pa.Codec("zstd")
_ZTRIAL = 2 << 20          # bytes actually compressed per cost trial


def _zcost(buf: bytes) -> int:
    """Estimated post-zstd size; big payloads trial a 2 MiB slice and
    extrapolate the ratio (the segment store recompresses with zstd,
    so stored bytes — not raw bytes — decide raw-vs-FSST suffixes)."""
    if not buf:
        return 0
    if len(buf) <= _ZTRIAL:
        return len(_ZSTD.compress(buf))
    mid = (len(buf) - _ZTRIAL) // 2
    z = len(_ZSTD.compress(buf[mid: mid + _ZTRIAL]))
    return int(z * len(buf) / _ZTRIAL)


def applicable(typ: pa.DataType) -> bool:
    return (pa.types.is_string(typ) or pa.types.is_large_string(typ)
            or pa.types.is_binary(typ) or pa.types.is_large_binary(typ))


# ---------------------------------------------------------------------------
# vectorized adjacent-pair common-prefix lengths

def _common_prefixes(data: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """p[i] = shared-prefix bytes between rows i and i+1 (len n-1)."""
    n = len(offs) - 1
    if n <= 1:
        return np.zeros(0, dtype=np.int64)
    lens = np.diff(offs)
    maxcmp = np.minimum(lens[:-1], lens[1:])
    p = np.zeros(n - 1, dtype=np.int64)
    alive = np.nonzero(maxcmp > 0)[0]
    total = len(data)
    t = np.arange(_CMP_CHUNK)
    while alive.size:
        ia = np.minimum(offs[alive] + p[alive], total - 1)[:, None] + t
        ib = np.minimum(offs[alive + 1] + p[alive], total - 1)[:, None] + t
        eq = data[np.minimum(ia, total - 1)] == data[np.minimum(ib, total - 1)]
        rem = maxcmp[alive] - p[alive]
        eq &= t[None, :] < rem[:, None]
        lead = np.cumprod(eq, axis=1).sum(axis=1)
        p[alive] += lead
        alive = alive[(lead == _CMP_CHUNK) & (rem > _CMP_CHUNK)]
    return p


def _gather_ranges(data: np.ndarray, starts: np.ndarray,
                   lens: np.ndarray) -> np.ndarray:
    """Concatenate data[starts[i] : starts[i]+lens[i]] for all i."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=data.dtype)
    cs = np.cumsum(lens)
    prev = np.concatenate(([0], cs[:-1]))
    idx = np.repeat(starts - prev, lens) + np.arange(total)
    return data[idx]


# ---------------------------------------------------------------------------

def encode(arr: pa.Array, trial: bool = False,
           fsst_table=None) -> Encoded:
    """``trial=True`` skips the FSST-suffix candidate (raw suffix only)
    — used by the auto-selector's sample trials, where retraining an
    FSST table per sample costs more than the estimate is worth.
    ``fsst_table`` reuses an already-trained symbol table (e.g. the
    selector's, trained on whole-row samples) for the FSST-suffix
    candidate instead of training a fresh one; a mismatched table just
    makes the candidate lose its post-zstd trial and the raw suffix
    path win."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    typ = arr.type
    n = len(arr)
    valid = (np.asarray(arr.is_valid()) if arr.null_count else None)
    binvals = arr.cast(pa.large_binary())
    if arr.null_count:
        binvals = binvals.fill_null(b"")
    if n == 0:
        return Encoded(NAME, 0, field_to_bytes(typ),
                       {"suffix": "raw", "wp": 0, "ws": 0},
                       [b"", b"", b"", b""])

    offs = np.frombuffer(binvals.buffers()[1], dtype=np.int64)[
        binvals.offset: binvals.offset + n + 1]
    base = int(offs[0])
    offs = (offs - base).astype(np.int64)
    dbuf = binvals.buffers()[2]
    data = (np.frombuffer(dbuf, dtype=np.uint8)[base: base + int(offs[-1])]
            if dbuf is not None else np.zeros(0, dtype=np.uint8))

    lens = np.diff(offs)
    if _native.available():
        pfull, suffix, _suf_offs = _native.prefix_encode(data, offs)
        slens = np.diff(_suf_offs)
    else:
        pfull = np.concatenate(([0], _common_prefixes(data, offs)))
        slens = lens - pfull
        suffix = _gather_ranges(data, offs[:-1] + pfull, slens)

    wp = bits_needed(int(pfull.max()) if n else 0)
    ws = bits_needed(int(slens.max()) if n else 0)
    pbuf = pack_ints(pfull.astype(np.uint64), wp)
    vbuf = (np.packbits(valid, bitorder="little").tobytes()
            if valid is not None else b"")
    meta = {"wp": wp, "ws": ws}

    # suffix payload: raw blob vs FSST over the per-row suffix array.
    # Sized POST-zstd (subsampled for big payloads) because the segment
    # store is zstd Parquet — raw-vs-raw comparison over-favours FSST,
    # whose output the outer zstd can barely squeeze further.
    raw_cost = (_zcost(suffix.tobytes())
                + _zcost(pack_ints(slens.astype(np.uint64), ws)))
    fsst_enc = None
    if len(suffix) >= 1024 and not trial:
        from . import fsst
        suf_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(slens, out=suf_offs[1:])
        suf_arr = pa.Array.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(suf_offs.tobytes()),
             pa.py_buffer(suffix.tobytes())])
        try:
            cand = fsst.encode(suf_arr, fsst_table)
            if sum(_zcost(b) for b in cand.buffers) < raw_cost:
                fsst_enc = cand
        except (ValueError, pa.ArrowInvalid):
            fsst_enc = None

    if fsst_enc is not None:
        meta["suffix"] = "fsst"
        buffers = [vbuf, pbuf] + list(fsst_enc.buffers)
    else:
        meta["suffix"] = "raw"
        buffers = [vbuf, pbuf, pack_ints(slens.astype(np.uint64), ws),
                   suffix.tobytes()]
    return Encoded(NAME, n, field_to_bytes(typ), meta, buffers)


def decode(enc: Encoded) -> pa.Array:
    typ = field_from_bytes(enc.field_bytes)
    n = enc.n
    if n == 0:
        return pa.array([], type=typ)

    pfull = unpack_ints(enc.buffers[1], enc.meta["wp"], n).astype(np.int64)
    if enc.meta["suffix"] == "fsst":
        from . import fsst
        sub = Encoded(fsst.NAME, n, field_to_bytes(pa.large_binary()),
                      {}, enc.buffers[2:4])
        suf_arr = fsst.decode(sub)
        soffs = np.frombuffer(suf_arr.buffers()[1], dtype=np.int64)[
            suf_arr.offset: suf_arr.offset + n + 1]
        sbase = int(soffs[0])
        slens = np.diff(soffs)
        sdbuf = suf_arr.buffers()[2]
        suffix = (np.frombuffer(sdbuf, dtype=np.uint8)
                  [sbase: sbase + int(soffs[-1] - soffs[0])]
                  if sdbuf is not None else np.zeros(0, dtype=np.uint8))
    else:
        slens = unpack_ints(enc.buffers[2], enc.meta["ws"], n).astype(np.int64)
        suffix = np.frombuffer(enc.buffers[3], dtype=np.uint8)

    out_lens = pfull + slens
    out_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_lens, out=out_offs[1:])
    suf_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(slens, out=suf_offs[1:])

    maxlen_global = int(out_lens.max()) if n else 0
    if maxlen_global > 0 and _native.available():
        out, out_offs = _native.prefix_decode(suffix, suf_offs, pfull,
                                              int(out_offs[-1]))
        result = pa.Array.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(out_offs.tobytes()),
             pa.py_buffer(out.tobytes())])
        result = result.cast(typ)
        vbuf = enc.buffers[0]
        valid = (np.unpackbits(np.frombuffer(vbuf, dtype=np.uint8),
                               count=n, bitorder="little").astype(bool)
                 if vbuf else None)
        return apply_validity(result, valid)
    out = np.zeros(int(out_offs[-1]), dtype=np.uint8)
    if maxlen_global > 0:
        rows_per_chunk = max(1, _DECODE_CAP // (5 * maxlen_global))
        prev = np.zeros(0, dtype=np.uint8)
        s = 0
        while s < n:
            e = min(n, s + rows_per_chunk)
            m = e - s
            ml = int(out_lens[s:e].max())
            if ml == 0:
                s = e
                continue
            M = np.zeros((m + 1, ml), dtype=np.uint8)
            M[0, :min(len(prev), ml)] = prev[:ml]
            # scatter suffix bytes of rows s..e-1 into M rows 1..m
            chunk_sl = slens[s:e]
            tot = int(chunk_sl.sum())
            if tot:
                row_i = np.repeat(np.arange(1, m + 1), chunk_sl)
                cs = np.cumsum(chunk_sl)
                prevcs = np.concatenate(([0], cs[:-1]))
                col_i = (np.repeat(pfull[s:e] - prevcs, chunk_sl)
                         + np.arange(tot))
                M[row_i, col_i] = suffix[suf_offs[s]: suf_offs[s] + tot]
            # last-writer row index per (row, byte): running max of rows
            # whose suffix covers that byte position
            col = np.arange(ml)
            writers = np.where(col[None, :] >= pfull[s:e, None],
                               np.arange(1, m + 1, dtype=np.int32)[:, None],
                               np.int32(0))
            W = np.maximum.accumulate(
                np.vstack([np.zeros((1, ml), dtype=np.int32), writers]),
                axis=0)
            F = np.take_along_axis(M, W.astype(np.int64), axis=0)
            # flatten rows 1..m out to the destination buffer
            chunk_ol = out_lens[s:e]
            tot_o = int(chunk_ol.sum())
            if tot_o:
                cso = np.cumsum(chunk_ol)
                prevo = np.concatenate(([0], cso[:-1]))
                flat = (np.repeat(np.arange(1, m + 1) * ml - prevo, chunk_ol)
                        + np.arange(tot_o))
                out[out_offs[s]: out_offs[s] + tot_o] = F.reshape(-1)[flat]
            prev = F[m, :int(out_lens[e - 1])].copy()
            s = e

    result = pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(out_offs.tobytes()), pa.py_buffer(out.tobytes())])
    result = result.cast(typ)
    vbuf = enc.buffers[0]
    valid = (np.unpackbits(np.frombuffer(vbuf, dtype=np.uint8), count=n,
                           bitorder="little").astype(bool) if vbuf else None)
    return apply_validity(result, valid)
