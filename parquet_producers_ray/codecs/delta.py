"""Delta codec: first value + zigzag-encoded deltas, bit-packed.

For sorted / near-sorted integer and temporal columns (surrogate ids,
event timestamps, the content tables' key columns — which the engine
keeps sorted by construction, SURVEY.md §1).  Deltas of a sorted column
are tiny regardless of the absolute value range, beating
frame-of-reference whenever the range is wide but increments are small.

Arithmetic is modular int64 (two's complement): diffs and the decode
cumsum may wrap, which is harmless — zigzag and the prefix sum are
exact mod 2^64, so reconstruction is bit-identical for any input.
Nulls are forward-filled before differencing (zero deltas), then the
validity bitmap restores them on decode.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import (Encoded, apply_validity, bits_needed, field_from_bytes,
                   field_to_bytes, pack_ints, unpack_ints,
                   validity_from_bytes, validity_to_bytes)
from .for_ import _is_temporal, _to_int64

NAME = "delta"


def applicable(typ: pa.DataType) -> bool:
    return (pa.types.is_integer(typ) and not
            (pa.types.is_unsigned_integer(typ) and typ.bit_width == 64)) \
        or _is_temporal(typ)


def encode(arr: pa.Array) -> Encoded:
    valid_buf, _ = validity_to_bytes(arr)
    if len(arr) == 0 or arr.null_count == len(arr):
        return Encoded(NAME, len(arr), field_to_bytes(arr.type),
                       {"first": 0, "width": 0}, [b"", valid_buf])
    ints = _to_int64(arr)
    vals = pc.fill_null(ints, 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    if arr.null_count:
        # forward-fill nulls (zero deltas, exact int64 — no float
        # round-trip); leading nulls take the first valid value
        mask = pc.is_null(ints).to_numpy(zero_copy_only=False)
        idx = np.where(~mask, np.arange(len(vals)), 0)
        np.maximum.accumulate(idx, out=idx)
        vals = vals[idx]
        first_valid = int(np.flatnonzero(~mask)[0])
        vals[: first_valid] = vals[first_valid]
    with np.errstate(over="ignore"):
        d = np.empty(len(vals) - 1, dtype=np.int64)
        np.subtract(vals[1:], vals[:-1], out=d)
        z = (d.astype(np.uint64) << np.uint64(1)) \
            ^ (d >> np.int64(63)).astype(np.uint64)
    width = bits_needed(int(z.max())) if len(z) else 0
    return Encoded(NAME, len(arr), field_to_bytes(arr.type),
                   {"first": int(vals[0]), "width": width},
                   [pack_ints(z, width), valid_buf])


def decode(enc: Encoded) -> pa.Array:
    typ = field_from_bytes(enc.field_bytes)
    valid = validity_from_bytes(enc.buffers[1], enc.n)
    if enc.n == 0 or (valid is not None and not valid.any()):
        return pa.nulls(enc.n, typ) if enc.n else pa.nulls(0, typ)
    z = unpack_ints(enc.buffers[0], enc.meta["width"], enc.n - 1)
    with np.errstate(over="ignore"):
        d = ((z >> np.uint64(1)) ^ (np.uint64(0) -
                                    (z & np.uint64(1)))).view(np.int64)
        vals = np.empty(enc.n, dtype=np.int64)
        vals[0] = enc.meta["first"]
        vals[1:] = d
        np.cumsum(vals, out=vals)
    out = pa.array(vals)
    if _is_temporal(typ) and typ.bit_width == 32:
        out = out.cast(pa.int32())
    out = out.cast(typ)
    return apply_validity(out, valid)
