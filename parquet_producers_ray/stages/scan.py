"""Global ordered prefix sum over a Dataset — the distributed SCAN
primitive (Blelloch 1990's two-phase formulation, textbook-public).

The window family's scans are per-key (PARTITION BY): one hash
exchange co-locates a key and the cumsum is block-local.  A GLOBAL
scan (running total over the whole dataset in a declared order) has no
partition key, so it runs as the classic two-phase algorithm instead:

1. assign each row a RANGE id from driver-known bounds over
   ``order_col`` (equal-width here; a production deployment samples
   quantile bounds exactly like exchange.py::storage_sort — either
   way the bounds are a tiny pure value, not data),
2. ONE tiny aggregate computes each range's total — P rows to the
   driver, which takes their exclusive prefix (P integers of state),
3. ONE keyed exchange co-locates each range; a block-local sort +
   cumsum plus the broadcast base offset yields every row's exact
   global exclusive prefix.

Exchange cost: one data-sized keyed exchange + one P-row aggregate —
the same contract as any window query.  No stage materializes the
dataset; the driver holds P integers.

Used by the ``pack_sequences`` query (LM training-sequence packing =
scan over token counts); reusable for file-offset assignment, global
row numbering, and quota-based splitting.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def global_ordered_scan(ds, order_col: str, value_col: str,
                        parts: int = 16):
    """Return a Dataset with an added ``_excl`` int64 column: the
    exclusive prefix sum of ``value_col`` in ascending ``order_col``
    order.  ``order_col`` must be numeric with driver-knowable min/max
    (one column-pruned aggregate); ties within ``order_col`` are
    resolved by its per-block sort (callers needing total order pass a
    unique key, as pack_sequences does with doc_id)."""
    from ray.data.aggregate import Max, Min, Sum

    from ..pipelines.flagship import enable_hash_shuffle

    mm = ds.aggregate(Min(order_col, alias_name="lo"),
                      Max(order_col, alias_name="hi"))
    if mm is None or mm.get("lo") is None or mm.get("hi") is None:
        # empty input: nothing to scan — return it with the _excl
        # column appended so the output schema is stable
        def empty_excl(b: pa.Table) -> pa.Table:
            return b.append_column("_excl", pa.array(
                np.zeros(len(b), dtype=np.int64)))
        return ds.map_batches(empty_excl, batch_format="pyarrow")
    bounds = np.linspace(mm["lo"], mm["hi"], parts + 1)[1:-1]

    def assign(b: pa.Table) -> pa.Table:
        d = b.column(order_col).to_numpy(zero_copy_only=False)
        return b.append_column("_part", pa.array(
            np.searchsorted(bounds, d, side="right").astype(np.int64)))

    parted = ds.map_batches(assign, batch_format="pyarrow")
    enable_hash_shuffle(parted)

    tot = parted.groupby("_part").aggregate(
        Sum(value_col, alias_name="t")).to_pandas()
    totals = tot["t"].to_numpy()
    if not np.issubdtype(totals.dtype, np.integer):
        raise TypeError(
            f"global_ordered_scan expects an integer value_col; "
            f"'{value_col}' totals are {totals.dtype} — cast upstream "
            "(a silent int64 assignment would truncate)")
    sums = np.zeros(parts, dtype=np.int64)
    sums[tot["_part"].to_numpy()] = totals
    base = np.concatenate(([0], np.cumsum(sums)[:-1]))

    def scan(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("_excl", pa.array([], pa.int64()))
        b = b.sort_by([("_part", "ascending"), (order_col, "ascending")])
        part = b.column("_part").to_numpy(zero_copy_only=False)
        n = b.column(value_col).to_numpy(zero_copy_only=False)
        excl = np.cumsum(n) - n
        starts = np.zeros(len(part), dtype=bool)
        starts[0] = True
        starts[1:] = part[1:] != part[:-1]
        seg_base = excl[np.flatnonzero(starts)][np.cumsum(starts) - 1]
        gexcl = base[part] + (excl - seg_base)
        return b.append_column("_excl", pa.array(gexcl))

    return (parted.repartition(parts, keys=["_part"])
            .map_batches(scan, batch_format="pyarrow", batch_size=None))
