"""Sampling-based per-column codec auto-selection.

For each column of a partition: take a deterministic evenly-spaced
sample, trial-encode every applicable codec, pick the smallest, then
encode the full column with the winner (falling back down the ranking
on failure).  The choice is recorded in the partition's lineage
manifest (engine/manifest.py).  The reference has no such layer — it
defers to Parquet defaults (SURVEY.md §2.3); selection strategy follows
standard practice (e.g. per-block scheme selection in BtrBlocks/FSST
literature, see PAPERS.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import bitpack, bss, delta, dictionary, for_, fsst, plain, rle
from .base import Encoded

CODECS = {
    plain.NAME: plain,
    dictionary.NAME: dictionary,
    rle.NAME: rle,
    bitpack.NAME: bitpack,
    for_.NAME: for_,
    delta.NAME: delta,
    fsst.NAME: fsst,
    bss.NAME: bss,
}

# trial order is a mild prior; selection is purely by sampled size
_CANDIDATE_ORDER = [rle.NAME, dictionary.NAME, delta.NAME,
                    for_.NAME, bitpack.NAME,
                    fsst.NAME, bss.NAME, plain.NAME]


def candidates(typ: pa.DataType) -> list:
    out = [n for n in _CANDIDATE_ORDER if CODECS[n].applicable(typ)]
    return out or [plain.NAME]


def sample_array(arr: pa.Array, frac: float = 0.01, min_rows: int = 256,
                 max_rows: int = 4096) -> pa.Array:
    n = len(arr)
    k = int(min(max(n * frac, min_rows), max_rows, n))
    if k >= n:
        return arr
    idx = np.linspace(0, n - 1, k).astype(np.int64)
    return arr.take(pa.array(idx))


def select_codec(arr: pa.Array, allowed: list | None = None,
                 state: dict | None = None) -> str:
    """Pick the codec with the smallest encoded sample.  When `state`
    is given, trained trial artifacts (the FSST symbol table) are
    stashed there so the full-column encode never re-trains."""
    s = sample_array(arr)
    best_name, best_size = plain.NAME, None
    for name in (allowed or candidates(arr.type)):
        codec = CODECS[name]
        if not codec.applicable(arr.type):
            continue
        try:
            if name == fsst.NAME:
                tbl = fsst.train_from_array(s)
                size = fsst.encode(s, tbl).nbytes
                if state is not None:
                    state["fsst_table"] = tbl
            else:
                size = codec.encode(s).nbytes
        except (ValueError, pa.ArrowInvalid,
                pa.lib.ArrowNotImplementedError):
            # a codec that can't handle this type/content simply loses
            # the trial; plain always works
            continue
        if best_size is None or size < best_size:
            best_name, best_size = name, size
    return best_name


def encode_auto(arr: pa.Array, allowed: list | None = None) -> Encoded:
    state: dict = {}
    name = select_codec(arr, allowed, state)
    try:
        if name == fsst.NAME and "fsst_table" in state:
            # reuse the symbol table trained during selection (on the
            # sample) — never re-train for the full-column encode
            return fsst.encode(arr, state["fsst_table"])
        return CODECS[name].encode(arr)
    except (ValueError, pa.ArrowInvalid, pa.lib.ArrowNotImplementedError):
        return plain.encode(arr)


def decode(enc: Encoded) -> pa.Array:
    return CODECS[enc.codec].decode(enc)
