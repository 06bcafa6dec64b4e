"""Sampling-based per-column codec auto-selection.

For each column of a partition: take a few deterministic CONTIGUOUS
chunklet samples (run/locality structure preserved), trial-encode every
applicable codec at two nested sample sizes, extrapolate each
candidate's fixed-vs-marginal cost to the full column, and pick the
smallest PROJECTED size — measured post-zstd, because the segment store
is zstd Parquet (see ``select_codec``).  The full column is then
encoded with the winner (falling back down the ranking on failure) and
the choice is recorded in the partition's lineage manifest
(engine/manifest.py).  The reference has no such layer — it defers to
Parquet defaults (SURVEY.md §2.3); selection strategy follows standard
practice (per-block scheme selection and chunklet sampling in the
BtrBlocks/FSST literature, see PAPERS.md).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from . import (alp, bitpack, bss, delta, dictionary, for_, fsst, plain,
               prefix, rle, xor)
from .base import Encoded

CODECS = {
    plain.NAME: plain,
    dictionary.NAME: dictionary,
    rle.NAME: rle,
    bitpack.NAME: bitpack,
    for_.NAME: for_,
    delta.NAME: delta,
    fsst.NAME: fsst,
    prefix.NAME: prefix,
    bss.NAME: bss,
    alp.NAME: alp,
    xor.NAME: xor,
}

# trial order is a mild prior; selection is purely by sampled size
_CANDIDATE_ORDER = [rle.NAME, dictionary.NAME, delta.NAME,
                    for_.NAME, bitpack.NAME,
                    prefix.NAME, fsst.NAME, alp.NAME, xor.NAME,
                    bss.NAME, plain.NAME]


def candidates(typ: pa.DataType) -> list:
    out = [n for n in _CANDIDATE_ORDER if CODECS[n].applicable(typ)]
    return out or [plain.NAME]


def sample_array(arr: pa.Array, frac: float = 0.01, min_rows: int = 256,
                 max_rows: int = 4096, slices: int = 4) -> pa.Array:
    """A few contiguous slices, evenly spaced — not row-by-row spaced
    samples, which destroy the run/locality structure that RLE, delta
    and front-coding exploit (BtrBlocks samples contiguous chunklets
    for the same reason; see PAPERS.md)."""
    parts = _sample_slices(arr, frac, min_rows, max_rows, slices)
    return _concat(parts)


_SAMPLE_BYTES = 1 << 20   # trial cost cap: ~1 MiB sampled per column


def _sample_slices(arr: pa.Array, frac: float = 0.01, min_rows: int = 256,
                   max_rows: int = 4096, slices: int = 4) -> list:
    n = len(arr)
    k = int(min(max(n * frac, min_rows), max_rows, n))
    # wide rows (html payloads): cap the sampled BYTES too, or every
    # trial encode pays megabytes per candidate codec
    avg = arr.nbytes / n if n else 0
    if avg > 0:
        k = max(64, min(k, int(_SAMPLE_BYTES / avg)))
    k = min(k, n)
    if k >= n:
        return [arr]
    per = max(1, k // slices)
    starts = np.linspace(0, n - per, min(slices, max(1, k // per)))
    return [arr.slice(int(s), per) for s in starts]


def _concat(parts: list) -> pa.Array:
    if len(parts) == 1:
        p = parts[0]
        return p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
    return pa.concat_arrays([p.combine_chunks() if isinstance(
        p, pa.ChunkedArray) else p for p in parts])


_ZSTD = pa.Codec("zstd")

# prefer the simpler/faster codec when the fancier one saves < 3%
_PLAIN_MARGIN = 1.03


def stored_size(enc: Encoded) -> int:
    """Size the segment store will actually pay: the codec buffers go
    into a zstd-compressed Parquet segment file (stages/encode.py), so
    the honest trial metric is post-zstd bytes, not raw Encoded bytes.
    Pre-compressed payloads (FSST output) gain little from the outer
    zstd while plain/front-coded payloads gain a lot — raw-size trials
    systematically over-favour the former."""
    return (sum(len(_ZSTD.compress(b)) for b in enc.buffers if len(b))
            + len(json.dumps(enc.meta)))


def select_codec(arr: pa.Array, allowed: list | None = None,
                 state: dict | None = None,
                 metric: str = "stored") -> str:
    """Pick the codec with the smallest PROJECTED full-column size.

    Each candidate trial-encodes two nested contiguous samples (half
    and full chunklet sets) and the sizes are extrapolated linearly to
    the column's row count: est = size(s4) + marginal-bytes-per-row ×
    remaining rows.  Two points separate each codec's fixed overhead
    (dictionaries, symbol tables, framing) from its per-row cost, which
    a single small sample conflates — RLE's runs and dict's table cost
    almost nothing per extra row while FSST/plain pay linearly.

    ``metric="stored"`` (default) sizes trials post-zstd — the segment
    files are zstd Parquet, so that is the objective the ≤-reference
    criterion actually measures; ``metric="raw"`` sizes the bare
    Encoded buffers (useful when the store is uncompressed).  When
    `state` is given, trained trial artifacts (the FSST symbol table)
    are stashed there so the full-column encode never re-trains."""
    n = len(arr)
    parts = _sample_slices(arr)
    s4 = _concat(parts)
    s2 = _concat(parts[: max(1, len(parts) // 2)]) if len(parts) > 1 else None
    cost = stored_size if metric == "stored" else (lambda e: e.nbytes)
    # cheap pre-gate: dict/rle only pay off on repetitive values — skip
    # their trials when the sample is mostly distinct (saves a hash
    # build per string column)
    skip: set = set()
    try:
        import pyarrow.compute as pc
        if len(s4) >= 64 and (pa.types.is_string(arr.type)
                              or pa.types.is_large_string(arr.type)
                              or pa.types.is_binary(arr.type)
                              or pa.types.is_large_binary(arr.type)):
            probe = s4.slice(0, 256)
            if pc.count_distinct(probe).as_py() > 0.6 * len(probe):
                skip = {dictionary.NAME, rle.NAME}
    except (pa.ArrowInvalid, pa.lib.ArrowNotImplementedError):
        pass
    ests: dict[str, float] = {}
    for name in (allowed or candidates(arr.type)):
        codec = CODECS[name]
        if name in skip or not codec.applicable(arr.type):
            continue
        try:
            if name == fsst.NAME:
                tbl = fsst.train_from_array(s4)
                size4 = cost(fsst.encode(s4, tbl))
                size2 = (cost(fsst.encode(s2, tbl))
                         if s2 is not None else None)
                if state is not None:
                    state["fsst_table"] = tbl
            elif name == prefix.NAME:
                # raw-suffix-only trial: skips an FSST retrain per sample
                size4 = cost(prefix.encode(s4, trial=True))
                size2 = (cost(prefix.encode(s2, trial=True))
                         if s2 is not None else None)
            else:
                size4 = cost(codec.encode(s4))
                size2 = (cost(codec.encode(s2))
                         if s2 is not None else None)
        except (ValueError, pa.ArrowInvalid,
                pa.lib.ArrowNotImplementedError):
            # a codec that can't handle this type/content simply loses
            # the trial; plain always works
            continue
        if size2 is None or len(s4) == len(s2):
            ests[name] = float(size4)
        else:
            per_row = max(0.0, (size4 - size2) / (len(s4) - len(s2)))
            ests[name] = size4 + per_row * (n - len(s4))
    if not ests:
        return plain.NAME
    best = min(ests, key=ests.get)  # type: ignore[arg-type]
    if (plain.NAME in ests and best != plain.NAME
            and ests[plain.NAME] <= _PLAIN_MARGIN * ests[best]):
        # within noise of plain: take the zero-cost decode
        return plain.NAME
    return best


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
