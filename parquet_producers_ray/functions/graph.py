"""Connected components over an edge Dataset — iterative hash-min with
pointer jumping.

The one operator category the rest of the registry lacks: an ITERATIVE
distributed algorithm (dedup clustering's final step: near-dup pairs →
duplicate groups).  Formulation (the hash-min family, Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014): maintain a
label per node (seeded ``min(n, neighbours)``), and each round take

    label[n] ← min(label[n],
                   min_{(u,n) ∈ E} label[u],      # edge propagation
                   label[label[n]])               # pointer jumping

Propagation alone is correct but needs O(diameter) rounds; pointer
jumping alone is NOT correct (a node whose seed label is itself never
learns a smaller id two hops away — e.g. the path 2–3–1, where
min(N(2) ∪ {2}) = 2).  The combination converges in O(log diameter)
rounds; labels are non-increasing and bounded below by the component
min (every label is a node id from inside the component), so the
fixpoint labels every node with its component minimum — and the SUM of
all labels strictly decreases while anything moves, which gives a
one-scalar convergence check with no extra join.

Physical shape per round: the big edge table flows through a STATELESS
map that looks up each endpoint's current label, then ONE grouped min
over the label table rebuilds the labels.  The lookup side is adaptive,
the same policy as the registry's broadcast join: while the label table
is small it is ``ray.put`` once per round and probed with a vectorized
``np.searchsorted`` inside every map task (edges never shuffle after
the initial symmetrise); past ``broadcast_threshold`` bytes it switches
to Ray's hash join.  Driver-side state is one scalar per round.

The reference has no graph operators (SURVEY.md §2 "not present").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _local_min(key: str, val: str):
    def fn(b: pa.Table) -> pa.Table:
        return b.group_by([key]).aggregate([(val, "min")]) \
            .rename_columns([key, val])
    return fn


def _min_by_key(ds, key: str, val: str):
    """groupby(key).min(val) with a map-side partial min first, so the
    exchange moves at most #distinct-keys rows per block."""
    from ray.data.aggregate import Min
    return (ds.map_batches(_local_min(key, val), batch_format="pyarrow")
            .groupby(key).aggregate(Min(val, alias_name=val)))


def _labels_to_arrays(labels) -> tuple[np.ndarray, np.ndarray]:
    t = pa.concat_tables(list(labels.iter_batches(batch_format="pyarrow")))
    nodes = t.column("node").to_numpy(zero_copy_only=False)
    labs = t.column("label").to_numpy(zero_copy_only=False)
    order = np.argsort(nodes)
    return nodes[order], labs[order]


def _lookup(nodes: np.ndarray, labs: np.ndarray,
            keys: np.ndarray) -> np.ndarray:
    """label of each key; keys are guaranteed present (every edge
    endpoint is seeded)."""
    return labs[np.searchsorted(nodes, keys)]


def connected_components(edges, num_partitions: int = 8,
                         max_rounds: int = 64,
                         broadcast_threshold: int = 64 << 20):
    """edges: Ray Dataset with int64 columns (src, dst).  Returns a
    Dataset (node, component) where component is the minimum node id in
    the node's connected component; every node mentioned in the edges
    is labelled (a self-loop keeps an isolated node's own id)."""
    import ray

    def sym(b: pa.Table) -> pa.Table:
        # both directions + ONE self-loop per distinct endpoint in the
        # batch (the self-loop keeps every node's own label alive in
        # the grouped min; deduping it matters because edges_sym is
        # re-scanned every round)
        s = b.column("src").combine_chunks()
        d = b.column("dst").combine_chunks()
        selfs = pc.unique(pa.concat_arrays([s, d]))
        return pa.table({"node": pa.concat_arrays([s, d, selfs]),
                         "nbr": pa.concat_arrays([d, s, selfs])})

    edges_sym = edges.map_batches(sym, batch_format="pyarrow") \
        .materialize()
    if edges_sym.count() == 0:
        import ray.data
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "component": pa.array([], pa.int64())}))
    labels = _min_by_key(edges_sym, "node", "nbr") \
        .rename_columns(["node", "label"]).materialize()
    prev_sum = labels.sum("label")

    for _ in range(max_rounds):
        small = (labels.size_bytes() or 0) <= broadcast_threshold
        if small:
            ref = ray.put(_labels_to_arrays(labels))

            def prop(b: pa.Table) -> pa.Table:
                # candidate for nbr = min(label[u], label[label[u]]):
                # propagation and pointer jump in one lookup; the
                # self-loop rows re-emit each node's own (jumped) label
                # so nothing is lost in the grouped min
                nodes, labs = ray.get(ref)
                lab_u = _lookup(nodes, labs, b.column("node").to_numpy(
                    zero_copy_only=False))
                lab2 = np.minimum(lab_u, _lookup(nodes, labs, lab_u))
                return pa.table({"node": b.column("nbr"),
                                 "label": pa.array(lab2, pa.int64())})

            cand = edges_sym.map_batches(prop, batch_format="pyarrow")
            labels = _min_by_key(cand, "node", "label") \
                .rename_columns(["node", "label"]).materialize()
        else:
            # at-scale path: the label table no longer broadcasts —
            # same semantics through Ray's hash joins, routed through
            # produce._safe_join (both sides are materialized, so
            # counting is metadata-only).  A raw .join crashed when
            # distinct join-key values fell below the partition count
            # (late rounds collapse labels to a few components; Ray's
            # join aggregator rejects a schema-less zero-row partition
            # side — the CLAUDE.md rule), and the partition count now
            # scales with BYTES instead of a constant.
            from ..engine.produce import _safe_join

            parts = max(2, num_partitions,
                        int(-(-((edges_sym.size_bytes() or 0)
                                + (labels.size_bytes() or 0))
                            // (256 << 20))))
            cand = (_safe_join(edges_sym, labels, "inner", ("node",),
                               parts=parts)
                    .map_batches(lambda b: pa.table(
                        {"node": b.column("nbr"),
                         "label": b.column("label")}),
                        batch_format="pyarrow"))
            merged = _min_by_key(cand, "node", "label") \
                .rename_columns(["node", "label"]).materialize()
            parents = merged.rename_columns(["label", "label2"])
            labels = (_safe_join(merged, parents.materialize(),
                                 "left_outer", ("label",), parts=parts)
                      .map_batches(lambda b: pa.table(
                          {"node": b.column("node"),
                           "label": pc.min_element_wise(
                               b.column("label"),
                               pc.coalesce(b.column("label2"),
                                           b.column("label")))}),
                          batch_format="pyarrow")).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:   # labels non-increasing ⇒ fixpoint
            break
        prev_sum = cur_sum
    return labels.rename_columns(["node", "component"])


# ---------------------------------------------------------------------------
# PageRank — the second iterative operator (web-graph authority scores;
# the classic link-analysis formulation, Page et al. 1999, public
# literature; the reference has no graph operators).  Fixed-iteration,
# un-normalized variant:
#
#     rank⁰[n] = 1
#     rankᵗ[n] = (1-d) + d · Σ_{(u,n) ∈ E} rankᵗ⁻¹[u] / outdeg[u]
#
# which a bounded chain of SQL CTEs reproduces exactly, so the operator
# is oracle-checkable despite being iterative.  Physical shape per
# iteration: the static edge table flows through a stateless map that
# looks up (rank/outdeg) of each source — broadcast while the
# node-sized rank table fits (`ray.put` once per round, vectorized
# searchsorted), hash join past the threshold — with a PER-BLOCK
# pre-aggregation of contributions by destination, so the one grouped
# sum moves ≤ #distinct-dst rows per block, never edge-sized rows.
# Dangling nodes (no in-edges) fall back to (1-d) via the seeded node
# table.  Driver-side state: none (the rank table stays a Dataset).
#
# Determinism: per-node contributions are quantized to an int64
# 1e-12 grid BEFORE each iteration's cross-block sum (float64 sum
# order across Ray blocks is nondeterministic — the round-2 u10_join
# driver-hash lesson); the SQL oracle applies the identical
# quantization, so the recurrence stays exactly reproducible.

PR_QUANTUM = 1e12

def pagerank(edges, iterations: int = 5, damping: float = 0.85,
             num_partitions: int = 8,
             broadcast_threshold: int = 64 << 20):
    """edges: Ray Dataset with int64 columns (src, dst), directed.
    Returns a Dataset (node, rank) over every node mentioned."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    def ends(b: pa.Table) -> pa.Table:
        both = pa.concat_arrays([b.column("src").combine_chunks(),
                                 b.column("dst").combine_chunks()])
        return pa.table({"node": pc.unique(both)})

    # the static edge table is re-scanned every iteration: pin it in
    # the object store once instead of re-reading the source each round
    edges = edges.materialize()
    nodes = (edges.map_batches(ends, batch_format="pyarrow")
             .groupby("node").count().drop_columns(["count()"])
             .materialize())
    if nodes.count() == 0:
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "rank": pa.array([], pa.float64())}))

    def deg_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["src"]).aggregate([("src", "count")])
        return g.rename_columns(["node", "deg"])

    deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").sum("deg").materialize())

    ranks = nodes.map_batches(
        lambda b: b.append_column("rank",
                                  pa.array(np.ones(len(b)))),
        batch_format="pyarrow").materialize()

    def _table(ds) -> pa.Table:
        return pa.concat_tables(list(
            ds.iter_batches(batch_format="pyarrow")))

    # the degree table is node-sized: collect + broadcast it ONLY on
    # the small path (lazily, once) — the at-scale path joins against
    # the `deg` Dataset and must not materialize it on the driver
    deg_ref = None

    base = 1.0 - damping
    for _ in range(iterations):
        small = (ranks.size_bytes() or 0) <= broadcast_threshold
        if small:
            if deg_ref is None:
                deg_t = _table(deg)
                deg_nodes = deg_t.column("node").to_numpy(
                    zero_copy_only=False)
                deg_vals = deg_t.column("sum(deg)").to_numpy(
                    zero_copy_only=False).astype(np.float64)
                order = np.argsort(deg_nodes)
                deg_ref = ray.put((deg_nodes[order], deg_vals[order]))
            t = _table(ranks)
            rn = t.column("node").to_numpy(zero_copy_only=False)
            rv = t.column("rank").to_numpy(zero_copy_only=False)
            o = np.argsort(rn)
            rank_ref = ray.put((rn[o], rv[o]))

            def contrib(b: pa.Table, _rr=rank_ref, _dr=deg_ref) -> pa.Table:
                rn, rv = ray.get(_rr)
                dn, dv = ray.get(_dr)
                src = b.column("src").to_numpy(zero_copy_only=False)
                share = (rv[np.searchsorted(rn, src)]
                         / dv[np.searchsorted(dn, src)])
                # floor(x·Q + 0.5): half-AWAY rounding to match DuckDB's
                # round() — np.round is half-to-even and the early
                # dyadic rank/degree ratios land exactly on .5 quanta
                t = pa.table({"node": b.column("dst"),
                              "c": pa.array(np.floor(
                                  share * PR_QUANTUM + 0.5)
                                  .astype(np.int64))})
                return t.group_by(["node"]).aggregate([("c", "sum")]) \
                    .rename_columns(["node", "c"])

            parts = edges.map_batches(contrib, batch_format="pyarrow")
            contribs = parts.groupby("node").aggregate(
                Sum("c", alias_name="c"))
            # node-sized update WITHOUT a Ray join (a native join costs
            # seconds of fixed setup per call — fatal inside a loop):
            # broadcast the contribution table, probe per nodes-block
            ct = _table(contribs)
            cn = ct.column("node").to_numpy(zero_copy_only=False)
            cv = ct.column("c").to_numpy(zero_copy_only=False)
            co = np.argsort(cn)
            c_ref = ray.put((cn[co], cv[co]))

            def upd(b: pa.Table, _cr=c_ref) -> pa.Table:
                cn, cv = ray.get(_cr)
                ns = b.column("node").to_numpy(zero_copy_only=False)
                if len(cn) == 0:
                    # guard BEFORE indexing: `&` does not short-circuit,
                    # so cn[idx] inside the expression would raise first
                    val = np.zeros(len(ns))
                else:
                    idx = np.minimum(np.searchsorted(cn, ns),
                                     len(cn) - 1)
                    found = cn[idx] == ns
                    val = np.where(found, cv[idx], 0).astype(
                        np.float64) / PR_QUANTUM
                return pa.table({"node": b.column("node"),
                                 "rank": pa.array(base + damping * val)})

            ranks = nodes.map_batches(
                upd, batch_format="pyarrow").materialize()
            continue
        else:
            # at-scale path: rank table through Ray's hash join
            rank_src = ranks.rename_columns(["src", "rank"])
            deg_src = deg.rename_columns(["src", "deg_sum"])
            parts = (edges.join(rank_src, join_type="inner",
                                num_partitions=num_partitions,
                                on=("src",))
                     .join(deg_src, join_type="inner",
                           num_partitions=num_partitions, on=("src",))
                     .map_batches(lambda b: pa.table(
                         {"node": b.column("dst"),
                          # floor(x·Q + 0.5) = DuckDB round() for the
                          # positive shares (see broadcast path)
                          "c": pc.cast(pc.floor(pc.add(pc.multiply(
                              pc.divide(b.column("rank"),
                                        pc.cast(b.column("deg_sum"),
                                                pa.float64())),
                              pa.scalar(PR_QUANTUM)),
                              pa.scalar(0.5))), pa.int64())}),
                         batch_format="pyarrow"))
        contribs = parts.groupby("node").aggregate(
            Sum("c", alias_name="c"))
        ranks = (nodes.join(contribs, join_type="left_outer",
                            num_partitions=num_partitions, on=("node",))
                 .map_batches(lambda b: pa.table(
                     {"node": b.column("node"),
                      "rank": pc.add(pa.scalar(base), pc.multiply(
                          pa.scalar(damping),
                          pc.divide(pc.cast(
                              pc.coalesce(b.column("c"),
                                          pa.scalar(0, pa.int64())),
                              pa.float64()),
                              pa.scalar(PR_QUANTUM))))}),
                     batch_format="pyarrow").materialize())
    return ranks
