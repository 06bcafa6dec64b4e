"""Deduplication operators for web-scale corpora: exact (digest
groupby), MinHash+LSH banding, SimHash, n-gram Jaccard verification,
and embedding-cosine near-dup.

Shapes follow the at-scale playbook:
- exact dedup groups on a 64-bit content digest, never on the full
  text (the shuffle ships 8 bytes + the kept row, not every payload);
- MinHash signatures are computed vectorized per batch; LSH bands
  become (band, band_hash) keys so near-dup candidates co-locate in ONE
  hash shuffle; candidate pairs are then verified with exact n-gram
  Jaccard inside the group — no all-pairs work anywhere;
- connected components over verified pairs use union-find on the
  driver (pairs are a tiny fraction of the corpus); the winner per
  cluster is the smallest id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import fnv1a_hash

MERSENNE = np.uint64((1 << 61) - 1)


def _token_hashes(batch: pa.Table, text_col: str, ngram: int = 1):
    """Per-doc arrays of 64-bit n-gram hashes (word shingles)."""
    toks = pc.split_pattern(pc.utf8_lower(batch.column(text_col)), " ")
    lengths = pc.list_value_length(toks).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = toks.combine_chunks().flatten() if isinstance(
        toks, pa.ChunkedArray) else toks.flatten()
    h = fnv1a_hash(flat)
    if ngram > 1:
        # combine consecutive token hashes within a doc into shingles
        offs = np.zeros(len(lengths) + 1, dtype=np.int64)
        offs[1:] = np.cumsum(lengths)
        sh_counts = np.maximum(lengths - ngram + 1, 0)
        combined = h.copy()
        with np.errstate(over="ignore"):
            for k in range(1, ngram):
                shifted = np.zeros_like(h)
                shifted[:-k or None] = h[k:]
                combined = combined * np.uint64(1099511628211) ^ shifted
        starts = np.repeat(offs[:-1], sh_counts)
        local = (np.arange(int(sh_counts.sum()))
                 - np.repeat(np.cumsum(sh_counts) - sh_counts, sh_counts))
        idx = starts + local
        return combined[idx], sh_counts
    return h, lengths


def distinct_gram_rows(batch: pa.Table, id_col: str = "doc_id",
                       text_col: str = "text", ngram: int = 2) -> pa.Table:
    """Inverted-index rows for exact n-gram Jaccard: one row per
    DISTINCT (doc, gram) with the doc's distinct-gram count attached,
    so the downstream pair aggregation gets |A| and |B| for free.
    Output: (gram:int64, doc_id, n_grams:int64)."""
    h, counts = _token_hashes(batch, text_col, ngram)
    ids = batch.column(id_col).combine_chunks()
    doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64),
                        counts.astype(np.int64))
    order = np.lexsort((h, doc_idx))
    hs, di = h[order], doc_idx[order]
    keep = np.ones(len(hs), dtype=bool)
    keep[1:] = (hs[1:] != hs[:-1]) | (di[1:] != di[:-1])
    hs, di = np.ascontiguousarray(hs[keep]), di[keep]
    n_grams = np.bincount(di, minlength=len(ids))
    return pa.table({"gram": pa.array(hs.view(np.int64)),
                     "doc_id": ids.take(pa.array(di)),
                     "n_grams": pa.array(n_grams[di])})


def gram_pair_rows(block: pa.Table, max_df: int | None = None,
                   half_tau_prune: bool = False) -> pa.Table:
    """Co-occurrence pairs within one hash-partitioned block of
    inverted-index rows (every gram's postings are co-located by the
    repartition on ``gram``): for each gram shared by k docs, emit the
    k·(k-1)/2 ordered pairs.  ``max_df`` drops stop-grams with more
    than that many postings — the scale knob that bounds the quadratic
    blowup at 10^12 docs (disabled when None for exact small-scale
    oracle parity).  ``half_tau_prune`` drops pairs that can never
    reach Jaccard ≥ ½ (needs 3·min(|A|,|B|) ≥ |A|+|B| since
    |A∩B| ≤ min) — exactness-preserving shuffle-volume cut."""
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "n_a": pa.array([], pa.int64()),
                      "n_b": pa.array([], pa.int64())})
    if block.num_rows == 0:
        return empty
    block = block.sort_by([("gram", "ascending"), ("doc_id", "ascending")])
    g = block.column("gram").to_numpy(zero_copy_only=False)
    ids = block.column("doc_id").to_numpy(zero_copy_only=False)
    ns = block.column("n_grams").to_numpy(zero_copy_only=False)
    bounds = np.flatnonzero(np.diff(g)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(g)]))
    sizes = ends - starts
    keep_g = sizes >= 2
    if max_df is not None:
        keep_g &= sizes <= max_df
    gstart, sizes = starts[keep_g], sizes[keep_g]
    if len(sizes) == 0:
        return empty
    # fully vectorized triu over all groups at once (no per-group
    # Python): level 1 enumerates each group's "left" elements, level 2
    # expands each left element to its partners to the right
    n1 = sizes - 1
    L = int(n1.sum())
    grp_of_left = np.repeat(np.arange(len(sizes)), n1)
    loc_i = np.arange(L) - np.repeat(np.cumsum(n1) - n1, n1)
    c = sizes[grp_of_left] - 1 - loc_i          # partners per left elem
    P = int(c.sum())
    off_j = np.arange(P) - np.repeat(np.cumsum(c) - c, c)
    gi = gstart[grp_of_left]
    abs_i = np.repeat(gi + loc_i, c)
    abs_j = abs_i + 1 + off_j
    na, nb = ns[abs_i], ns[abs_j]
    ida, idb = ids[abs_i], ids[abs_j]
    if half_tau_prune:
        keep = 3 * np.minimum(na, nb) >= na + nb
        ida, idb, na, nb = ida[keep], idb[keep], na[keep], nb[keep]
    return pa.table({"id_a": pa.array(ida), "id_b": pa.array(idb),
                     "n_a": pa.array(na), "n_b": pa.array(nb)})


def combine_pair_counts(pairs: pa.Table,
                        inter_col: str | None = None) -> pa.Table:
    """Vectorized (Arrow ``group_by``) pair-count combine: collapses
    duplicate (id_a, id_b) rows into one row carrying the intersection
    count so far.  Used twice: locally inside the gram-partition map
    task (partial combine BEFORE the pair exchange — the at-scale
    pre-aggregation pattern) and once after the hash exchange on the
    pair key (final combine).  ``inter_col`` names an existing partial
    count to sum; None means raw pair rows (each row counts 1)."""
    if pairs.num_rows == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "inter": pa.array([], pa.int64()),
                         "n_a": pa.array([], pa.int64()),
                         "n_b": pa.array([], pa.int64())})
    if inter_col is None:
        g = pairs.group_by(["id_a", "id_b"]).aggregate(
            [("n_a", "count"), ("n_a", "max"), ("n_b", "max")])
        g = g.rename_columns(["id_a", "id_b", "inter", "n_a", "n_b"])
    else:
        g = pairs.group_by(["id_a", "id_b"]).aggregate(
            [(inter_col, "sum"), ("n_a", "max"), ("n_b", "max")])
        g = g.rename_columns(["id_a", "id_b", "inter", "n_a", "n_b"])
    return g.set_column(2, "inter", g.column("inter").cast(pa.int64()))


def minhash_signatures(batch: pa.Table, text_col: str = "text",
                       num_perm: int = 64, ngram: int = 2,
                       seed: int = 7) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signature matrix, vectorized:
    one (a*h+b) mod p universal-hash family over the shingle hashes."""
    hashes, counts = _token_hashes(batch, text_col, ngram)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(MERSENNE), num_perm, dtype=np.uint64)
    b = rng.integers(0, int(MERSENNE), num_perm, dtype=np.uint64)
    n = len(counts)
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(hashes) == 0:
        return sig
    # docs' shingles are contiguous → segmented min via reduceat
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=offs[1:])
    nonempty = counts > 0
    red_offs = offs[nonempty]
    with np.errstate(over="ignore"):
        for j in range(num_perm):  # num_perm passes, each fully vectorized
            hv = (hashes * a[j] + b[j]) % MERSENNE
            sig[nonempty, j] = np.minimum.reduceat(hv, red_offs)
    return sig


def lsh_band_rows(batch: pa.Table, id_col: str, text_col: str = "text",
                  num_perm: int = 64, bands: int = 16,
                  ngram: int = 2) -> pa.Table:
    """Explode each doc into `bands` rows keyed (band, band_hash) — the
    LSH bucketing shuffle key.  rows_per_band = num_perm // bands."""
    sig = minhash_signatures(batch, text_col, num_perm, ngram)
    n, r = sig.shape[0], num_perm // bands
    band_hash = np.empty((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for bd in range(bands):
            chunk = sig[:, bd * r:(bd + 1) * r]
            hv = np.full(n, 14695981039346656037, dtype=np.uint64)
            for c in range(r):
                hv = (hv ^ chunk[:, c]) * np.uint64(1099511628211)
            band_hash[:, bd] = hv
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    return pa.table({
        id_col: pa.array(np.repeat(ids, bands)),
        "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
        "band_hash": pa.array(band_hash.reshape(-1).astype(np.int64)),
    })


def simhash(batch: pa.Table, text_col: str = "text",
            nbits: int = 64) -> np.ndarray:
    """64-bit SimHash over token hashes (sign of per-bit vote sums)."""
    hashes, counts = _token_hashes(batch, text_col, 1)
    n = len(counts)
    parents = np.repeat(np.arange(n), counts)
    out = np.zeros(n, dtype=np.uint64)
    for bit in range(nbits):
        bitval = ((hashes >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
        ones = np.bincount(parents, weights=bitval, minlength=n)
        # vote = ones - zeros > 0  ⇔  2*ones > count
        out |= (2 * ones > counts).astype(np.uint64) << np.uint64(bit)
    return out


def jaccard_pairs(ids: np.ndarray, shingle_sets: list,
                  threshold: float) -> list:
    """Exact n-gram Jaccard over the (small) candidate group; returns
    (id_a, id_b) with a < b above threshold."""
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = shingle_sets[i], shingle_sets[j]
            if not a and not b:
                sim = 1.0
            else:
                inter = len(a & b)
                sim = inter / (len(a) + len(b) - inter)
            if sim >= threshold:
                pair = (int(ids[i]), int(ids[j]))
                out.append(pair if pair[0] < pair[1] else pair[::-1])
    return out


class UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # smaller id wins as the cluster representative
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def clusters_from_pairs(pairs) -> dict:
    """pair list → {doc_id: representative_id} (min-id representative)."""
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    return {x: uf.find(x) for x in list(uf.parent)}
