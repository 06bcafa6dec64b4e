"""Gorilla-inspired XOR codec for flat float columns.

Facebook's Gorilla (VLDB'15) observed that consecutive time-series
floats XOR to a word that is mostly zero — a short run of significant
bits framed by leading/trailing zeros — and stored just that window.
This codec applies the same idea BYTE-aligned so both directions stay
fully vectorized in numpy (no bit-serial Python): per value it stores
one control byte (leading-zero-byte count << 4 | significant-byte
count) plus only the significant bytes of ``x[i] XOR x[i-1]``, then
deflates the control and payload streams separately.  Identical
consecutive values (the common time-series case) cost one zero control
byte; slowly-drifting values cost a few mantissa bytes instead of
eight.

Decode XOR-scans the deltas back with ``np.bitwise_xor.accumulate`` —
bit-identical reconstruction for every IEEE value including NaNs and
signed zeros (pure bit operations end to end).

Scope: flat float16/32/64, null-free (nulls raise ``ValueError`` so the
auto-selector's trial drops the codec, like ``bss``).  Embedding lists
keep ``bss``'s plane transpose, which exploits across-dimension rather
than across-row structure.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .base import Encoded, field_from_bytes, field_to_bytes

NAME = "xor"

_UINT = {16: np.uint16, 32: np.uint32, 64: np.uint64}
_FLOAT = {16: np.float16, 32: np.float32, 64: np.float64}


def applicable(typ: pa.DataType) -> bool:
    return pa.types.is_floating(typ)


def encode(arr: pa.Array) -> Encoded:
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    typ = arr.type
    if arr.null_count:
        raise ValueError("xor: null floats not supported")
    n = len(arr)
    if n == 0:
        return Encoded(NAME, 0, field_to_bytes(typ), {}, [b"", b""])
    vals = arr.to_numpy(zero_copy_only=False)
    k = vals.dtype.itemsize
    u = np.ascontiguousarray(vals).view(_UINT[typ.bit_width])
    d = u.copy()
    d[1:] ^= u[:-1]                       # d[0] is the raw first value
    db = d.view(np.uint8).reshape(n, k)   # little-endian byte planes
    nz = db != 0
    any_nz = nz.any(axis=1)
    # least/most significant non-zero byte per row (LE: byte 0 is LSB)
    lsb = np.argmax(nz, axis=1)
    msb = k - 1 - np.argmax(nz[:, ::-1], axis=1)
    sig = np.where(any_nz, msb - lsb + 1, 0).astype(np.int64)
    lz = np.where(any_nz, k - 1 - msb, 0).astype(np.int64)
    control = ((lz << 4) | sig).astype(np.uint8)
    # gather the significant byte windows with one fancy index
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(sig, out=offsets[1:])
    rows = np.repeat(np.arange(n, dtype=np.int64), sig)
    starts = np.repeat(lsb.astype(np.int64), sig)
    within = np.arange(offsets[-1], dtype=np.int64) \
        - np.repeat(offsets[:-1], sig)
    payload = db.reshape(-1)[rows * k + starts + within]
    return Encoded(NAME, n, field_to_bytes(typ), {},
                   [zlib.compress(control.tobytes(), 1),
                    zlib.compress(payload.tobytes(), 1)])


def decode(enc: Encoded) -> pa.Array:
    typ = field_from_bytes(enc.field_bytes)
    n = enc.n
    if n == 0:
        return pa.array([], type=typ)
    k = typ.bit_width // 8
    control = np.frombuffer(zlib.decompress(enc.buffers[0]), np.uint8)
    payload = np.frombuffer(zlib.decompress(enc.buffers[1]), np.uint8)
    lz = (control >> 4).astype(np.int64)
    sig = (control & 0x0F).astype(np.int64)
    tz = k - lz - sig                      # trailing zero bytes = LSB gap
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(sig, out=offsets[1:])
    db = np.zeros(n * k, np.uint8)
    rows = np.repeat(np.arange(n, dtype=np.int64), sig)
    starts = np.repeat(tz, sig)
    within = np.arange(offsets[-1], dtype=np.int64) \
        - np.repeat(offsets[:-1], sig)
    db[rows * k + starts + within] = payload
    d = db.view(_UINT[typ.bit_width])
    # inclusive XOR prefix scan: deltas → values, one C pass
    np.bitwise_xor.accumulate(d, out=d)
    return pa.array(d.view(_FLOAT[typ.bit_width]), type=typ)
