"""Byte-stream-split codec for float and float-list (embedding) columns.

Splits each k-byte float into k parallel byte planes (all sign/exponent
bytes together, all low-mantissa bytes together) and deflates the
planes.  IEEE floats barely compress as raw bytes because every slot
mixes a near-random mantissa with a highly regular exponent; the plane
transpose separates them so a lightweight deflate realises the
redundancy (the same layout as Parquet's BYTE_STREAM_SPLIT encoding,
which exists precisely for float columns).  This is the storage path
for embedding columns (``list<float>``) at training-data scale.

The reference has no float compression story at all — it stores floats
through Parquet.Net defaults (SURVEY.md §2.3); this codec is part of the
explicit per-column layer the north rule requires.

Scope: null-free data.  Nulls (at the list or value level) raise
``ValueError`` so the auto-selector's trial simply drops this codec and
falls back down the ranking — embeddings are dense in practice, and
null-heavy float columns are better served by `plain`.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .base import Encoded, field_from_bytes, field_to_bytes

NAME = "bss"

_FLOAT_BITS = {16: np.float16, 32: np.float32, 64: np.float64}


def _is_float_list(typ: pa.DataType) -> bool:
    return ((pa.types.is_list(typ) or pa.types.is_large_list(typ)
             or pa.types.is_fixed_size_list(typ))
            and pa.types.is_floating(typ.value_type))


def applicable(typ: pa.DataType) -> bool:
    return pa.types.is_floating(typ) or _is_float_list(typ)


def _split_planes(values: np.ndarray) -> bytes:
    """n floats → itemsize contiguous byte planes, deflated."""
    v8 = np.ascontiguousarray(values).view(np.uint8)
    v8 = v8.reshape(len(values), values.dtype.itemsize)
    return zlib.compress(np.ascontiguousarray(v8.T).tobytes(), 1)


def _join_planes(buf: bytes, n: int, dtype: np.dtype) -> np.ndarray:
    k = dtype.itemsize
    planes = np.frombuffer(zlib.decompress(buf), dtype=np.uint8)
    planes = planes.reshape(k, n)
    return np.ascontiguousarray(planes.T).reshape(-1).view(dtype)


def _float_values(arr: pa.Array) -> np.ndarray:
    return arr.to_numpy(zero_copy_only=False)


def encode(arr: pa.Array) -> Encoded:
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    typ = arr.type
    if pa.types.is_floating(typ):
        if arr.null_count:
            raise ValueError("bss: null floats not supported")
        vals = _float_values(arr)
        return Encoded(NAME, len(arr), field_to_bytes(typ),
                       {"kind": "flat"}, [_split_planes(vals)])
    # list / large_list / fixed_size_list of float
    if arr.null_count:
        raise ValueError("bss: null lists not supported")
    values = arr.flatten()
    if values.null_count:
        raise ValueError("bss: null list values not supported")
    if pa.types.is_fixed_size_list(typ):
        lens_buf = b""
        meta = {"kind": "fsl", "size": typ.list_size}
    else:
        import pyarrow.compute as pc
        lens = pc.list_value_length(arr).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lens_buf = zlib.compress(np.ascontiguousarray(lens).tobytes(), 1)
        meta = {"kind": "list"}
    return Encoded(NAME, len(arr), field_to_bytes(typ), meta,
                   [_split_planes(_float_values(values)), lens_buf])


def decode(enc: Encoded) -> pa.Array:
    typ = field_from_bytes(enc.field_bytes)
    if enc.meta["kind"] == "flat":
        if enc.n == 0:
            return pa.array([], type=typ)
        dtype = np.dtype(_FLOAT_BITS[typ.bit_width])
        return pa.array(_join_planes(enc.buffers[0], enc.n, dtype),
                        type=typ)
    vdtype = np.dtype(_FLOAT_BITS[typ.value_type.bit_width])
    if enc.meta["kind"] == "fsl":
        k = enc.meta["size"]
        vals = _join_planes(enc.buffers[0], enc.n * k, vdtype) \
            if enc.n else np.zeros(0, vdtype)
        out = pa.FixedSizeListArray.from_arrays(
            pa.array(vals, type=typ.value_type), k)
        return out.cast(typ)
    lens = np.frombuffer(zlib.decompress(enc.buffers[1]), dtype=np.int64) \
        if enc.buffers[1] else np.zeros(0, np.int64)
    total = int(lens.sum())
    vals = _join_planes(enc.buffers[0], total, vdtype) \
        if total else np.zeros(0, vdtype)
    offsets = np.zeros(enc.n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    values = pa.array(vals, type=typ.value_type)
    if pa.types.is_large_list(typ):
        out = pa.LargeListArray.from_arrays(pa.array(offsets), values)
    else:
        out = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), values)
    return out.cast(typ)
