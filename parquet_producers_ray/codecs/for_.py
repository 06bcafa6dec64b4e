"""Frame-of-reference codec: min-subtract + bit-pack.

For integers and temporal columns with a narrow value range — e.g. the
web-page ``warc_ts`` timestamps that span days (FIXTURES.md F-1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import (Encoded, apply_validity, bits_needed, field_from_bytes,
                   field_to_bytes, pack_ints, unpack_ints,
                   validity_from_bytes, validity_to_bytes)

NAME = "for"

_TEMPORAL = (pa.types.is_timestamp, pa.types.is_date, pa.types.is_time,
             pa.types.is_duration)


def _is_temporal(typ: pa.DataType) -> bool:
    return any(f(typ) for f in _TEMPORAL)


def applicable(typ: pa.DataType) -> bool:
    return pa.types.is_integer(typ) or _is_temporal(typ)


def _to_int64(arr: pa.Array) -> pa.Array:
    if _is_temporal(arr.type):
        # date32/time32 are 32-bit; widen through int64
        return arr.cast(pa.int64() if arr.type.bit_width == 64 else pa.int32()).cast(pa.int64())
    if pa.types.is_unsigned_integer(arr.type) and arr.type.bit_width == 64:
        raise ValueError("for codec does not support uint64")
    return arr.cast(pa.int64())


def encode(arr: pa.Array) -> Encoded:
    valid_buf, _ = validity_to_bytes(arr)
    ints = _to_int64(arr)
    if len(arr) == 0 or arr.null_count == len(arr):
        return Encoded(NAME, len(arr), field_to_bytes(arr.type),
                       {"min": 0, "width": 0}, [b"", valid_buf])
    vmin = int(pc.min(ints).as_py())
    vmax = int(pc.max(ints).as_py())
    if vmax - vmin >= 2 ** 64:
        raise ValueError("range too wide for frame-of-reference")
    vals = pc.fill_null(ints, vmin).to_numpy(zero_copy_only=False).astype(np.int64)
    deltas = (vals - vmin).astype(np.uint64)
    width = bits_needed(vmax - vmin)
    return Encoded(NAME, len(arr), field_to_bytes(arr.type),
                   {"min": vmin, "width": width},
                   [pack_ints(deltas, width), valid_buf])


def decode(enc: Encoded) -> pa.Array:
    typ = field_from_bytes(enc.field_bytes)
    valid = validity_from_bytes(enc.buffers[1], enc.n)
    if not enc.buffers[0] and enc.meta["width"] == 0 and valid is not None and not valid.any():
        return pa.nulls(enc.n, typ)
    deltas = unpack_ints(enc.buffers[0], enc.meta["width"], enc.n)
    vals = deltas.astype(np.int64) + np.int64(enc.meta["min"])
    out = pa.array(vals)
    if _is_temporal(typ) and typ.bit_width == 32:
        out = out.cast(pa.int32())
    out = out.cast(typ)
    return apply_validity(out, valid)
