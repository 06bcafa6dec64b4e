"""Approximate-nearest-neighbor search over an embedding column
(``list<float>``).

- ``BruteForceTopK``: the exact baseline — per-batch NumPy matmul of
  the batch's vectors against a BROADCAST query matrix (``ray.put``
  once, dereferenced once per actor, never re-shipped per batch), then
  a driver-side merge of per-batch partial top-k.  One streaming pass,
  no shuffle.
- ``lsh_bucket_rows``: the scale path — random-hyperplane LSH keys so
  candidate vectors co-locate in one hash shuffle; probe only the
  query's buckets.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa


def embedding_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """Zero-copy-ish (n, d) float64 matrix from a list<float> column.

    Rejects null or ragged rows EXPLICITLY: a null/short embedding
    shifts every following row in the flattened buffer, and when the
    total still divides evenly the reshape would succeed with every
    row silently misaligned (wrong neighbors, no error)."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0))
    if arr.null_count:
        raise ValueError(
            f"embedding_matrix: column {col!r} has {arr.null_count} "
            "null embeddings — drop or impute them before similarity")
    values = arr.flatten().to_numpy(zero_copy_only=False)
    if len(values) % n:
        raise ValueError(
            f"embedding_matrix: ragged {col!r} lists "
            f"({len(values)} values over {n} rows)")
    d = len(values) // n
    import pyarrow.compute as pc
    lens = pc.list_value_length(arr)
    lo, hi = pc.min_max(lens).values()
    if lo.as_py() != hi.as_py():
        raise ValueError(
            f"embedding_matrix: ragged {col!r} lists "
            f"(lengths {lo} .. {hi})")
    return values.reshape(n, d).astype(np.float64)


def normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


class BruteForceTopK:
    """Actor-pool map_batches stage: emits the per-batch top-k
    candidates per query; the small union is reduced driver-side (or by
    a final single-partition pass) to the global top-k.

    Construct once per actor: the query matrix is fetched from the
    object store in ``__init__``, not per batch.
    """

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id",
                 col: str = "embedding"):
        import ray
        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) \
            else queries_ref
        self.query_ids, qm = q
        self.qm = normalize(np.asarray(qm, dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = normalize(embedding_matrix(batch, self.col))
        if m.shape[0] == 0 or self.qm.shape[0] == 0:
            # empty batch OR empty query set: np.stack below needs at
            # least one per-query row
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "neighbor_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        sims = self.qm @ m.T                      # (n_queries, n_batch)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        k = min(self.k, sims.shape[1])
        # per-query partial top-k with the SAME (sim desc, id asc)
        # tie-break as merge_topk and the SQL oracle — an argpartition
        # without it can drop the lower-id neighbor of a boundary tie
        # before the merge ever sees it
        part = np.stack([np.lexsort((ids, -sims[qi]))[:k]
                         for qi in range(sims.shape[0])])
        qidx = np.repeat(np.arange(sims.shape[0]), k)
        nidx = part.reshape(-1)
        return pa.table({
            "query_id": pa.array(np.asarray(self.query_ids)[qidx],
                                 type=pa.int64()),
            "neighbor_id": pa.array(ids[nidx], type=pa.int64()),
            "sim": pa.array(sims[qidx, nidx], type=pa.float64()),
        })


def merge_topk(candidates: pa.Table, k: int) -> pa.Table:
    """Reduce the (small) candidate union to exact global top-k per
    query, ranked by (sim desc, neighbor_id asc) for determinism."""
    rows: dict = {}
    for q, n, s in zip(candidates.column("query_id").to_pylist(),
                       candidates.column("neighbor_id").to_pylist(),
                       candidates.column("sim").to_pylist()):
        rows.setdefault(q, []).append((-s, n))
    out_q, out_rank, out_n = [], [], []
    for q in sorted(rows):
        top = heapq.nsmallest(k, rows[q])
        for rank, (_, n) in enumerate(top, 1):
            out_q.append(q)
            out_rank.append(rank)
            out_n.append(n)
    return pa.table({
        "query_id": pa.array(out_q, type=pa.int64()),
        "rank": pa.array(out_rank, type=pa.int64()),
        "neighbor_id": pa.array(out_n, type=pa.int64()),
    })


def kmeans_centroids(sample: np.ndarray, k: int = 16,
                     iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd k-means over a normalized sample (init = the
    first k sample rows, cosine assignment): the IVF coarse quantizer.
    Returns (k, dim) normalized centroids."""
    x = normalize(np.asarray(sample, dtype=np.float64))
    k = min(k, x.shape[0])
    c = x[:k].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(k):
            sel = x[assign == j]
            if len(sel):
                c[j] = sel.mean(axis=0)
        c = normalize(c)
    return c


def ivf_assign(batch: pa.Table, centroids: np.ndarray,
               col: str = "embedding") -> pa.Table:
    """Route each vector to its nearest coarse centroid (adds an int64
    ``bucket`` column); the following hash exchange on ``bucket``
    co-locates each inverted list."""
    m = normalize(embedding_matrix(batch, col))
    if m.shape[0] == 0:
        return batch.append_column("bucket", pa.array([], type=pa.int64()))
    assign = np.argmax(m @ centroids.T, axis=1).astype(np.int64)
    return batch.append_column("bucket", pa.array(assign))


class IVFTopK:
    """Actor-pool scoring stage over bucket-partitioned blocks: each
    bucket group in a block is scored ONLY against the queries whose
    ``nprobe`` nearest centroids include that bucket — the IVF pruning
    that makes ANN sub-linear at scale (vs BruteForceTopK's full scan).
    Emits the same (query_id, neighbor_id, sim) candidate rows, merged
    by :func:`merge_topk`."""

    def __init__(self, queries_ref, centroids_ref, k: int, nprobe: int,
                 id_col: str = "vec_id", col: str = "embedding"):
        import ray
        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) \
            else queries_ref
        self.query_ids, qm = q
        self.qm = normalize(np.asarray(qm, dtype=np.float64))
        c = ray.get(centroids_ref) if not isinstance(centroids_ref,
                                                     np.ndarray) \
            else centroids_ref
        self.centroids = np.asarray(c, dtype=np.float64)
        nprobe = min(nprobe, self.centroids.shape[0])
        order = np.argsort(-(self.qm @ self.centroids.T), axis=1)
        # probe_mask[q, b] — does query q probe bucket b
        self.probe_mask = np.zeros(
            (self.qm.shape[0], self.centroids.shape[0]), dtype=bool)
        rows = np.repeat(np.arange(self.qm.shape[0]), nprobe)
        self.probe_mask[rows, order[:, :nprobe].reshape(-1)] = True
        self.k = k
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                          "neighbor_id": pa.array([], type=pa.int64()),
                          "sim": pa.array([], type=pa.float64())})
        if batch.num_rows == 0:
            return empty
        batch = batch.sort_by("bucket")
        buckets = batch.column("bucket").to_numpy(zero_copy_only=False)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        m = normalize(embedding_matrix(batch, self.col))
        bounds = np.flatnonzero(np.diff(buckets)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(buckets)]))
        out_q, out_n, out_s = [], [], []
        for s, e in zip(starts, ends):
            qsel = np.flatnonzero(self.probe_mask[:, int(buckets[s])])
            if len(qsel) == 0:
                continue
            sims = self.qm[qsel] @ m[s:e].T          # (probing, group)
            k = min(self.k, sims.shape[1])
            gids = ids[s:e]
            # (sim desc, id asc) tie-break — same contract as merge_topk
            part = np.stack([np.lexsort((gids, -sims[i]))[:k]
                             for i in range(sims.shape[0])])
            qidx = np.repeat(qsel, k)
            nidx = part.reshape(-1)
            out_q.append(np.asarray(self.query_ids)[qidx])
            out_n.append(ids[s + nidx])
            out_s.append(sims[np.repeat(np.arange(len(qsel)), k), nidx])
        if not out_q:
            return empty
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n), type=pa.int64()),
            "sim": pa.array(np.concatenate(out_s), type=pa.float64()),
        })


def axis_sign_bucket(m: np.ndarray, nplanes: int) -> np.ndarray:
    """Sign-LSH bucket over the FIRST ``nplanes`` dimensions (the
    axis-aligned special case of random-hyperplane LSH): bucket bit j
    is ``v[j] > 0``.  Chosen for the oracle-checked query because a
    SQL oracle can reproduce it exactly (``embedding[j] > 0``), while
    `lsh_bucket_rows` below uses true random hyperplanes."""
    if m.shape[0] == 0:
        return np.zeros(0, dtype=np.int64)
    bits = m[:, :nplanes] > 0
    bucket = np.zeros(m.shape[0], dtype=np.int64)
    for j in range(min(nplanes, bits.shape[1])):
        bucket |= bits[:, j].astype(np.int64) << j
    return bucket


class LSHTopK:
    """Actor-pool stage for LSH-bucketed ANN: each batch scores only
    the rows that share a query's bucket (the candidate set), emitting
    per-batch partial top-k per query — the LSH answer is exact WITHIN
    the bucket, and the bucket bound is what makes it sub-linear at
    corpus scale.  Same merge contract as BruteForceTopK."""

    def __init__(self, queries_ref, k: int, nplanes: int,
                 id_col: str = "vec_id", col: str = "embedding"):
        import ray
        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) \
            else queries_ref
        self.query_ids, qm_raw = q
        qm_raw = np.asarray(qm_raw, dtype=np.float64)
        self.qbuckets = axis_sign_bucket(qm_raw, nplanes)
        self.qm = normalize(qm_raw)
        self.k = k
        self.nplanes = nplanes
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m_raw = embedding_matrix(batch, self.col)
        empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                          "neighbor_id": pa.array([], type=pa.int64()),
                          "sim": pa.array([], type=pa.float64())})
        if m_raw.shape[0] == 0:
            return empty
        buckets = axis_sign_bucket(m_raw, self.nplanes)
        m = normalize(m_raw)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        out_q, out_n, out_s = [], [], []
        for qi, qb in enumerate(self.qbuckets):
            cand = np.flatnonzero(buckets == qb)
            if cand.size == 0:
                continue
            sims = m[cand] @ self.qm[qi]
            k = min(self.k, cand.size)
            # (sim desc, id asc) tie-break — same contract as merge_topk
            top = np.lexsort((ids[cand], -sims))[:k]
            out_q.append(np.full(k, self.query_ids[qi], np.int64))
            out_n.append(ids[cand[top]])
            out_s.append(sims[top])
        if not out_q:
            return empty
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "sim": pa.array(np.concatenate(out_s)),
        })


def lsh_bucket_rows(batch: pa.Table, nplanes: int = 16,
                    id_col: str = "vec_id", col: str = "embedding",
                    seed: int = 13) -> pa.Table:
    """Random-hyperplane LSH: one bucket key per vector.  Vectors whose
    sign patterns agree land in the same bucket; a hash shuffle on
    `bucket` co-locates candidates (the IVF/LSH scale path)."""
    m = embedding_matrix(batch, col)
    if m.shape[0] == 0:
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "bucket": pa.array([], type=pa.int64())})
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((m.shape[1], nplanes))
    bits = (m @ planes) > 0
    bucket = np.zeros(m.shape[0], dtype=np.int64)
    for b in range(nplanes):
        bucket |= bits[:, b].astype(np.int64) << b
    return pa.table({
        id_col: batch.column(id_col),
        "bucket": pa.array(bucket),
    })
