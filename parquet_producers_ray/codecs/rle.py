"""Run-length codec: dictionary + bit-packed (run_value, run_length) pairs.

Ideal for sorted key columns — the reference's core observation that "a
long run of repeated identical keys will take up very little space"
(reference ``README.md:104``), made explicit.  Nulls are carried as a
sentinel dictionary code so runs of nulls compress too.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import (Encoded, apply_validity, bits_needed, field_from_bytes,
                   field_to_bytes, ipc_array, ipc_bytes, pack_ints,
                   unpack_ints)

NAME = "rle"


def applicable(typ: pa.DataType) -> bool:
    # halffloat has no dictionary_encode kernel in pyarrow 16
    return not (pa.types.is_nested(typ) or pa.types.is_dictionary(typ)
                or (pa.types.is_floating(typ) and typ.bit_width == 16))


def encode(arr: pa.Array) -> Encoded:
    denc = arr.dictionary_encode()
    dictionary = denc.dictionary
    nd = len(dictionary)
    # nd itself is the null sentinel code
    codes = pc.fill_null(denc.indices, nd).to_numpy(zero_copy_only=False)
    codes = codes.astype(np.int64)
    n = len(codes)
    if n == 0:
        run_vals = np.zeros(0, dtype=np.uint64)
        run_lens = np.zeros(0, dtype=np.uint64)
    else:
        change = np.flatnonzero(codes[1:] != codes[:-1])
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [n]))
        run_vals = codes[starts].astype(np.uint64)
        run_lens = (ends - starts).astype(np.uint64)
    wv = bits_needed(nd)  # codes are in [0, nd]
    wl = bits_needed(int(run_lens.max()) if len(run_lens) else 0)
    return Encoded(
        NAME, n, field_to_bytes(arr.type),
        {"wv": wv, "wl": wl, "runs": len(run_vals), "ndict": nd},
        [ipc_bytes(dictionary), pack_ints(run_vals, wv), pack_ints(run_lens, wl)],
    )


def decode(enc: Encoded) -> pa.Array:
    typ = field_from_bytes(enc.field_bytes)
    dictionary = ipc_array(enc.buffers[0])
    nd = enc.meta["ndict"]
    runs = enc.meta["runs"]
    run_vals = unpack_ints(enc.buffers[1], enc.meta["wv"], runs).astype(np.int64)
    run_lens = unpack_ints(enc.buffers[2], enc.meta["wl"], runs).astype(np.int64)
    codes = np.repeat(run_vals, run_lens)
    null_mask = codes == nd
    has_nulls = bool(null_mask.any())
    if nd == 0:
        return pa.nulls(enc.n, typ)
    codes = np.where(null_mask, 0, codes)
    values = dictionary.take(pa.array(codes))
    valid = ~null_mask if has_nulls else None
    return apply_validity(values, valid).cast(typ)
