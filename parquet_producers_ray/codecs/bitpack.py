"""Bit-packing codec for non-negative integers (ids, counts, indices)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import (Encoded, apply_validity, bits_needed, field_from_bytes,
                   field_to_bytes, pack_ints, unpack_ints,
                   validity_from_bytes, validity_to_bytes)

NAME = "bitpack"


def applicable(typ: pa.DataType) -> bool:
    return pa.types.is_integer(typ)


def encode(arr: pa.Array) -> Encoded:
    valid_buf, _ = validity_to_bytes(arr)
    vals = pc.fill_null(arr, 0).to_numpy(zero_copy_only=False)
    if len(vals) and int(vals.min()) < 0:
        raise ValueError("bitpack requires non-negative values (use 'for')")
    u = vals.astype(np.uint64)
    width = bits_needed(int(u.max()) if len(u) else 0)
    return Encoded(NAME, len(arr), field_to_bytes(arr.type),
                   {"width": width}, [pack_ints(u, width), valid_buf])


def decode(enc: Encoded) -> pa.Array:
    typ = field_from_bytes(enc.field_bytes)
    u = unpack_ints(enc.buffers[0], enc.meta["width"], enc.n)
    out = pa.array(u.astype(np.int64) if not pa.types.is_unsigned_integer(typ)
                   else u).cast(typ)
    valid = validity_from_bytes(enc.buffers[1], enc.n)
    return apply_validity(out, valid)
