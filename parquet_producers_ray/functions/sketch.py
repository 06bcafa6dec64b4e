"""K-minimum-values (KMV) distinct-count sketch.

The at-scale approximate COUNT(DISTINCT): each map task reduces its
block to the k smallest 64-bit hashes per group (bounded memory,
deduped), partial sketches merge associatively (union → k smallest), and
the estimator is the classic (k−1)/θ where θ is the k-th minimum
normalized to [0,1).  When a group's true cardinality is below k the
sketch holds every distinct hash and the estimate is EXACT — which is
what makes the small-scale oracle parity against DuckDB's
``count(DISTINCT ...)`` meaningful while the operator stays
bounded-memory at 10^12 rows.

The reference has no sketches (SURVEY.md §2 "not present"); this is a
beyond-reference training-data operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .text import fnv1a_hash

TWO64 = float(2 ** 64)


def _hash_values(arr: pa.Array) -> np.ndarray:
    """64-bit hash of any column: strings/binary via FNV-1a, integers
    via the splitmix64 finalizer (never identity — KMV needs uniform
    hashes)."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_integer(arr.type) or pa.types.is_temporal(arr.type):
        v = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = v.astype(np.uint64)
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
        return h
    return fnv1a_hash(arr.cast(pa.string()))


def kmv_partial(batch: pa.Table, key_col: str, value_col: str,
                k: int = 1024) -> pa.Table:
    """Per-block partial sketches: one row per group key present in the
    batch with a ``kmv`` list of ≤k distinct smallest hashes (stored as
    int64 bit-patterns).  Fully vectorized: one lexsort + consecutive
    dedupe + per-segment rank cut."""
    import pyarrow.compute as pc

    # SQL parity: count(DISTINCT v) ignores null VALUES but a group
    # whose values are all null still exists (count 0), and a null KEY
    # is its own group.  Null keys are peeled off as one extra segment
    # (the vectorized path needs non-null dictionary indices).
    keys = batch.column(key_col).combine_chunks()
    null_row = None
    if keys.null_count:
        key_null = pc.is_null(keys)
        nv = batch.filter(key_null).column(value_col)
        nv = nv.combine_chunks().drop_null() if isinstance(
            nv, pa.ChunkedArray) else nv.drop_null()
        null_h = np.unique(_hash_values(nv))[:k] if len(nv) \
            else np.zeros(0, dtype=np.uint64)
        null_row = pa.table({
            key_col: pa.nulls(1, keys.type),
            "kmv": pa.ListArray.from_arrays(
                pa.array([0, len(null_h)], pa.int32()),
                pa.array(np.ascontiguousarray(null_h).view(np.int64)))})
        batch = batch.filter(pc.invert(key_null))
        keys = batch.column(key_col).combine_chunks()
    enc = keys.dictionary_encode()
    kidx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vmask = pc.is_valid(batch.column(value_col)).to_numpy(
        zero_copy_only=False) if batch.num_rows else np.zeros(0, bool)
    h = _hash_values(batch.filter(pa.array(vmask)).column(value_col)) \
        if vmask.any() else np.zeros(0, dtype=np.uint64)
    kv = kidx[vmask]
    order = np.lexsort((h, kv))
    ks, hs = kv[order], h[order]
    keep = np.ones(len(ks), dtype=bool)
    keep[1:] = (ks[1:] != ks[:-1]) | (hs[1:] != hs[:-1])
    ks, hs = ks[keep], hs[keep]
    starts = np.flatnonzero(np.diff(ks)) + 1
    seg_start = np.concatenate(([0], starts))
    seg_id = np.cumsum(np.concatenate(([0], np.diff(ks) != 0)))
    rank = np.arange(len(ks)) - seg_start[seg_id]
    cut = rank < k
    ks, hs = ks[cut], hs[cut]
    # list column over EVERY group in the batch — zero-count groups
    # (all-null values) get an empty sketch, not a missing row
    counts = np.bincount(ks, minlength=len(enc.dictionary))
    offsets = np.zeros(len(counts) + 1, dtype=np.int32)
    offsets[1:] = np.cumsum(counts)
    lists = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(np.ascontiguousarray(hs).view(np.int64)))
    out = pa.table({key_col: enc.dictionary, "kmv": lists})
    if null_row is not None:
        out = pa.concat_tables([out, null_row])
    return out


def mg_truncate(items: np.ndarray, counts: np.ndarray,
                m: int) -> tuple[np.ndarray, np.ndarray]:
    """Misra–Gries truncation of an exact/partial frequency vector to at
    most ``m`` counters: subtract the (m+1)-th largest count from every
    counter and drop the non-positive remainder (Agarwal et al.,
    "Mergeable Summaries", PODS 2012).  Identity when ``len ≤ m`` —
    counts stay EXACT as long as no truncation ever fires, and undercount
    by at most n/(m+1) in total otherwise."""
    if len(items) <= m:
        return items, counts
    # (m+1)-th largest via partition — O(n), no full sort
    thresh = np.partition(counts, len(counts) - (m + 1))[len(counts) - (m + 1)]
    adj = counts - thresh
    keep = adj > 0
    return items[keep], adj[keep]


def mg_partial(batch: pa.Table, col: str, m: int = 4096) -> pa.Table:
    """Per-block Misra–Gries summary: exact ``value_counts`` of the
    block truncated to ≤ m counters.  Partials merge associatively by
    summing counts per item then re-truncating; the whole exchange is
    bounded at m rows per block regardless of block cardinality."""
    vc = batch.column(col).combine_chunks().drop_null().value_counts()
    items = vc.field("values")
    counts = vc.field("counts").to_numpy(zero_copy_only=False)
    idx, counts = mg_truncate(np.arange(len(items)), counts, m)
    return pa.table({col: items.take(pa.array(idx)),
                     "n": pa.array(counts, type=pa.int64())})


def hist_partial(batch: pa.Table, col: str,
                 edges: np.ndarray | None = None) -> pa.Table:
    """Per-block quantile-sketch partial.  Without ``edges``: exact
    ``value_counts`` (one row per distinct value in the block) — the
    exact-below-capacity regime, right whenever the column's global
    distinct count is bounded (grades, sizes, quantities).  With
    ``edges`` (fixed bin boundaries shared by every block): a
    ``np.histogram`` partial — bounded at len(edges)−1 rows per block
    regardless of cardinality, quantile error ≤ one bin width.  Both
    merge by summing counts per value/bin."""
    vals = batch.column(col).combine_chunks().drop_null()
    if edges is None:
        vc = vals.value_counts()
        return pa.table({"v": vc.field("values").cast(pa.float64()),
                         "cnt": vc.field("counts").cast(pa.int64())})
    v = vals.to_numpy(zero_copy_only=False).astype(np.float64)
    # out-of-range values land in the terminal bins rather than being
    # silently dropped (dropping would shift every quantile rank and
    # break the one-bin-width error bound for in-range quantiles)
    v = np.clip(v, edges[0], edges[-1])
    counts, _ = np.histogram(v, bins=edges)
    keep = counts > 0
    # a bin is represented by its LEFT edge: the quantile answer is then
    # a lower bound within one bin width of the true discrete quantile
    return pa.table({"v": pa.array(edges[:-1][keep], pa.float64()),
                     "cnt": pa.array(counts[keep], pa.int64())})


def hist_quantiles(values: np.ndarray, counts: np.ndarray,
                   qs: list[float]) -> list[float]:
    """Discrete quantiles from merged (value, count) partials using
    DuckDB's quantile_disc index formula ceil(q·n)−1: the smallest
    value whose cumulative count reaches rank ceil(q·n)."""
    order = np.argsort(values, kind="stable")
    v, c = values[order], counts[order]
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(cum) else 0
    out = []
    for q in qs:
        if n == 0:
            out.append(float("nan"))
            continue
        rank = max(int(np.ceil(q * n)), 1)
        out.append(float(v[np.searchsorted(cum, rank, side="left")]))
    return out


def kmv_merge_estimate(group: pa.Table, k: int = 1024,
                       out_col: str = "n_distinct") -> pa.Table:
    """Final merge of one group's partial sketches: union of hashes →
    k smallest → estimate.  Exact (= number of hashes) when fewer than
    k survive; else (k−1)·2^64/h_(k)."""
    flat = group.column("kmv").combine_chunks().flatten()
    h = np.unique(flat.to_numpy(zero_copy_only=False).view(np.uint64))
    if len(h) < k:
        est = len(h)
    else:
        theta = float(h[k - 1]) + 1.0
        est = int(round((k - 1) * TWO64 / theta))
    key_cols = [c for c in group.column_names if c != "kmv"]
    out = {c: group.column(c).slice(0, 1) for c in key_cols}
    out[out_col] = pa.array([est], type=pa.int64())
    return pa.table(out)


# ---------------------------------------------------------------------------
# Bloom filter — the join-pruning sketch: build once from the small
# side's keys, broadcast (`ray.put`), and pre-filter the big side's
# blocks BEFORE the join's hash exchange so non-matching rows never
# cross the wire.  False positives only (the join itself stays exact);
# never false negatives.

def bloom_build(arr: pa.Array, bits_log2: int = 20) -> dict:
    """Build a Bloom filter over a key column.  Two derived hash
    functions (h1 + i*h2, the Kirsch–Mitzenmacher construction) over
    the shared 64-bit column hash; k=4 probes.  2^20 bits = 128 KiB —
    <1% false positives up to ~10^5 keys; size the exponent up with the
    build side."""
    m = np.uint64(1 << bits_log2)
    h = _hash_values(arr)
    h1 = h % m
    h2 = (h >> np.uint64(33)) | np.uint64(1)   # odd → full-period stride
    bits = np.zeros(int(m) >> 3, dtype=np.uint8)
    for i in range(4):
        pos = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    return {"bits": bits, "m": int(m)}


def bloom_maybe_contains(filt: dict, arr: pa.Array) -> np.ndarray:
    """Vectorized membership probe → bool mask (True = possibly in the
    build set; False = definitely absent)."""
    m = np.uint64(filt["m"])
    bits = filt["bits"]
    h = _hash_values(arr)
    h1 = h % m
    h2 = (h >> np.uint64(33)) | np.uint64(1)
    out = np.ones(len(h), dtype=bool)
    for i in range(4):
        pos = (h1 + np.uint64(i) * h2) % m
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        out &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 != 0
    return out
