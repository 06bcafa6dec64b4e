"""ALP-style lossless float compression via decimal re-scaling.

Most real-world float columns (prices, rates, measurements) are
decimals: ``v == round(v * 10^e) / 10^e`` exactly, for some small
``e``.  Such values are stored as the scaled int64s (which the existing
delta / frame-of-reference integer codecs then crush) plus a patch
list for the values that don't rescale exactly (NaN, inf, true
drift) — after Afroozeh & Boncz, "ALP: Adaptive Lossless
floating-Point Compression" (SIGMOD 2023), public literature; the
reference repo has no float compression story (defers to Parquet.Net
defaults, SURVEY.md §2.3).

Bit-identity is guaranteed by construction: the encoder only accepts a
value into the int path when ``ints / 10^e`` — the exact arithmetic the
decoder performs, in the column's own dtype — reproduces the original
bit pattern (so -0.0 and NaN payloads always land in the patch list).
Exponent selection samples the column once; the whole codec is
vectorized NumPy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import delta, for_, plain
from .base import (Encoded, apply_validity, field_from_bytes,
                   field_to_bytes, pack_ints, unpack_ints,
                   validity_from_bytes, validity_to_bytes)

NAME = "alp"

_MAX_E = 14               # 10^14 < 2^53: float64 decimals stay exact
_SAMPLE = 2048
_MAX_PATCH_FRAC = 0.2     # more exceptions than this → codec declines


def applicable(typ: pa.DataType) -> bool:
    return typ in (pa.float32(), pa.float64())


def _exact_mask(vals: np.ndarray, e: int, dtype) -> tuple[np.ndarray,
                                                          np.ndarray]:
    """(scaled int64s, bool mask of slots the decoder reproduces)."""
    scale = np.float64(10.0) ** e
    with np.errstate(invalid="ignore", over="ignore"):
        scaled = vals.astype(np.float64) * scale
        ok = np.isfinite(scaled) & (np.abs(scaled) < 2**62)
        ints = np.zeros(len(vals), dtype=np.int64)
        ints[ok] = np.rint(scaled[ok]).astype(np.int64)
        back = (ints / scale).astype(dtype)
    # BIT equality (NaN / -0.0 aware): compare the raw patterns
    itype = {4: np.uint32, 8: np.uint64}[dtype.itemsize]
    ok &= back.view(itype) == vals.view(itype)
    return ints, ok


def _pick_exponent(vals: np.ndarray, dtype) -> int:
    n = len(vals)
    s = vals[:: max(1, n // _SAMPLE)]
    best_e, best_exact = 0, -1
    for e in range(_MAX_E + 1):
        _, ok = _exact_mask(s, e, dtype)
        exact = int(ok.sum())
        if exact > best_exact:
            best_e, best_exact = e, exact
        if exact == len(s):
            break
    return best_e


def encode(arr: pa.Array) -> Encoded:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    typ = arr.type
    n = len(arr)
    dtype = np.dtype(np.float32 if typ == pa.float32() else np.float64)
    vbuf, _ = validity_to_bytes(arr)
    if n == 0:
        return Encoded(NAME, 0, field_to_bytes(typ),
                       {"e": 0, "ic": "for", "np": 0, "wp": 0},
                       [b"", b"", b"", b""])
    vals = np.asarray(arr.fill_null(0.0).to_numpy(zero_copy_only=False),
                      dtype=dtype)
    e = _pick_exponent(vals, dtype)
    ints, ok = _exact_mask(vals, e, dtype)
    n_patch = int((~ok).sum())
    if n_patch > _MAX_PATCH_FRAC * n:
        raise ValueError("alp: column is not decimal-like")
    ints[~ok] = 0  # keep the int stream smooth for delta/FOR

    int_arr = pa.array(ints, type=pa.int64())
    cands = []
    for mod in (delta, for_):
        try:
            cands.append(mod.encode(int_arr))
        except (ValueError, pa.ArrowInvalid):
            pass
    if not cands:
        cands = [plain.encode(int_arr)]
    ienc = min(cands, key=lambda c: c.nbytes)

    # patches: positions (bit-packed) + raw float bits
    pos = np.flatnonzero(~ok).astype(np.uint64)
    wp = int(n - 1).bit_length() if n > 1 else 0
    pos_buf = pack_ints(pos, wp)
    patch_buf = np.ascontiguousarray(vals[~ok]).tobytes()

    meta = {"e": e, "ic": ienc.codec, "np": n_patch, "wp": wp,
            "imeta": ienc.meta}
    return Encoded(NAME, n, field_to_bytes(typ), meta,
                   [vbuf, pos_buf, patch_buf] + list(ienc.buffers))


def decode(enc: Encoded) -> pa.Array:
    typ = field_from_bytes(enc.field_bytes)
    n = enc.n
    dtype = np.dtype(np.float32 if typ == pa.float32() else np.float64)
    if n == 0:
        return pa.array([], type=typ)
    from . import CODECS
    sub = Encoded(enc.meta["ic"], n, field_to_bytes(pa.int64()),
                  enc.meta.get("imeta", {}), enc.buffers[3:])
    ints = np.asarray(CODECS[enc.meta["ic"]].decode(sub)
                      .to_numpy(zero_copy_only=False), dtype=np.int64)
    scale = np.float64(10.0) ** enc.meta["e"]
    vals = (ints / scale).astype(dtype)
    n_patch = enc.meta["np"]
    if n_patch:
        pos = unpack_ints(enc.buffers[1], enc.meta["wp"],
                          n_patch).astype(np.int64)
        vals[pos] = np.frombuffer(enc.buffers[2], dtype=dtype)
    out = pa.array(vals, type=typ)
    valid = validity_from_bytes(enc.buffers[0], n)
    return apply_validity(out, valid)
