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
    """Zero-copy-ish (n, d) float64 matrix from a list<float> column."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    values = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0))
    d = len(values) // n
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
        if m.shape[0] == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "neighbor_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        sims = self.qm @ m.T                      # (n_queries, n_batch)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        k = min(self.k, sims.shape[1])
        # per-query partial top-k of this batch
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
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
