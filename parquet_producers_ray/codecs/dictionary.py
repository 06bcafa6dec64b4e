"""Dictionary codec: distinct values + bit-packed codes.

Good for low-cardinality columns (``lang``, url hosts, flags) — the
explicit version of what the reference gets implicitly from Parquet
dictionary pages (``README.md:104`` of the reference).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import (Encoded, apply_validity, bits_needed, field_from_bytes,
                   field_to_bytes, ipc_array, ipc_bytes, pack_ints,
                   unpack_ints, validity_from_bytes, validity_to_bytes)

NAME = "dict"


def applicable(typ: pa.DataType) -> bool:
    # halffloat has no dictionary_encode kernel in pyarrow 16
    return not (pa.types.is_nested(typ) or pa.types.is_dictionary(typ)
                or (pa.types.is_floating(typ) and typ.bit_width == 16))


def encode(arr: pa.Array) -> Encoded:
    denc = arr.dictionary_encode()
    dictionary = denc.dictionary
    indices = pc.fill_null(denc.indices, 0)
    codes = indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    width = bits_needed(max(len(dictionary) - 1, 0))
    valid_buf, _ = validity_to_bytes(arr)
    return Encoded(
        NAME, len(arr), field_to_bytes(arr.type),
        {"width": width, "ndict": len(dictionary)},
        [ipc_bytes(dictionary), pack_ints(codes, width), valid_buf],
    )


def decode(enc: Encoded) -> pa.Array:
    typ = field_from_bytes(enc.field_bytes)
    dictionary = ipc_array(enc.buffers[0])
    codes = unpack_ints(enc.buffers[1], enc.meta["width"], enc.n).astype(np.int64)
    if len(dictionary) == 0:
        return pa.nulls(enc.n, typ)
    values = dictionary.take(pa.array(codes))
    valid = validity_from_bytes(enc.buffers[2], enc.n)
    return apply_validity(values, valid).cast(typ)
