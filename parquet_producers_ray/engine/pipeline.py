"""Producer DAG + topological cascade (reference ``Producer.cs``) and
the incremental n-ary source merge (``ReadSources``,
ParquetProduction.cs:188-259).

A ``Producer`` wires a StageSpec to a versioned store and optional
upstream producers (``Producer.cs:29-99``; chaining via ``produces``
mirrors ``Produces``, :68-75).  ``update`` runs the stage then every
transitive downstream stage once, in topological order
(``Producer.cs:143-186``), each uploading version N+1 of its
content/key_mappings/updates triple.  Stages are barriers, matching
the reference's version transaction (README.md:182).

``read_sources`` reproduces the three-layer merge semantics: the union
of affected keys across feeders' update feeds; per feeder, its updates
for an affected key if it has any, else its content for that key
re-labelled Update (so the consumer always sees the full merged value
set per affected key, feeder order preserved); a key resolves to a
single Delete only when no feeder contributes values.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from .model import (DELETE, SEQ_COL, TYPE_COL, UPD_SEQ_COL, UPDATE,
                    StageSpec)
from .produce import _broadcast_filter, _collect_tuples, apply_updates

FEEDER_COL = "_feeder"
ORD_COL = "_ord"


def _empty_ds(schema: pa.Schema):
    import ray.data
    return ray.data.from_arrow(schema.empty_table())


def _feed_part(feed, key_cols, val_cols, feeder_idx: int):
    # _upd_seq is the feed's within-key order; carry it as _ord
    def fn(t: pa.Table) -> pa.Table:
        ordv = t.column(UPD_SEQ_COL)
        t = t.select(key_cols + val_cols + [TYPE_COL])
        t = t.append_column(FEEDER_COL, pa.array(
            np.full(len(t), feeder_idx, np.int32)))
        return t.append_column(ORD_COL, ordv.cast(pa.int64()))
    return feed.map_batches(fn, batch_format="pyarrow")


def _content_part(content, up_spec: StageSpec, key_cols, val_cols,
                  keyset: set, feeder_idx: int):
    """Feeder content for affected keys it has no updates for,
    re-labelled Update, ranked within key by the content's
    (source_key, _seq) order."""
    filtered = content.map_batches(
        _broadcast_filter([(key_cols, keyset, True)]),
        batch_format="pyarrow")
    return _content_part_from(filtered, up_spec, key_cols, val_cols,
                              feeder_idx)


def _colocate_groups(ds, key_cols):
    """Co-locate complete key groups — delegates to the single shared
    policy in ``produce.colocate_key_groups`` (also used by
    produce_adds' grouped path), so the tiny-threshold / exchange
    strategy cannot drift between the two call sites."""
    from .produce import colocate_key_groups

    return colocate_key_groups(ds, key_cols)


def _content_part_from(filtered, up_spec: StageSpec, key_cols, val_cols,
                       feeder_idx: int):
    """Rank an already key-filtered content stream — shared by the
    broadcast-set and join formulations of read_sources.  Vectorized:
    blocks hold complete key groups, the within-key (stored_sk, _seq)
    rank is one sort + run-relative arange per block instead of a
    Python call per key (the per-key map_groups is unusable at 10^12
    keys and dominated toy-scale cascade walls)."""
    from .produce import _tk_run_bounds

    sort_cols = up_spec.stored_sk + [SEQ_COL]

    def rank_block(b: pa.Table) -> pa.Table:
        n = len(b)
        if n == 0:
            out = b.select(key_cols + val_cols)
            out = out.append_column(TYPE_COL, pa.array([], pa.int8()))
            out = out.append_column(FEEDER_COL, pa.array([], pa.int32()))
            return out.append_column(ORD_COL, pa.array([], pa.int64()))
        b = b.sort_by([(c, "ascending") for c in key_cols]
                      + [(c, "ascending") for c in sort_cols])
        new = _tk_run_bounds(b, key_cols)
        rid = np.cumsum(new) - 1
        run_start = np.flatnonzero(new)
        ordv = np.arange(n, dtype=np.int64) - run_start[rid]
        out = b.select(key_cols + val_cols)
        out = out.append_column(TYPE_COL, pa.array(
            np.full(n, UPDATE, np.int8)))
        out = out.append_column(FEEDER_COL, pa.array(
            np.full(n, feeder_idx, np.int32)))
        return out.append_column(ORD_COL, pa.array(ordv))

    return _colocate_groups(filtered, key_cols).map_batches(
        rank_block, batch_format="pyarrow", batch_size=None)


def _resolve_block_fn(key_cols, val_cols, schema: pa.Schema):
    """Vectorized n-ary merge resolution: the block holds COMPLETE key
    groups (co-located by _resolve_merged's exchange).  Per key, keep
    non-Delete rows ordered (feeder, ord) and stamp _upd_seq; a key all
    of whose feeders deleted collapses to ONE Delete row.  One numpy
    pass per block replaces the former Python call per key."""
    from .produce import _tk_run_bounds

    def fn(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return schema.empty_table()
        b = b.sort_by([(c, "ascending") for c in key_cols]
                      + [(FEEDER_COL, "ascending"), (ORD_COL, "ascending")])
        new = _tk_run_bounds(b, key_cols)
        gid = np.cumsum(new) - 1
        ng = int(gid[-1]) + 1
        isdel = (b.column(TYPE_COL).to_numpy(zero_copy_only=False)
                 == DELETE)
        kept_per_group = np.bincount(gid, weights=~isdel, minlength=ng)
        keep = ~isdel
        # all-Delete groups keep exactly their first row
        first_idx = np.flatnonzero(new)
        dead = kept_per_group == 0
        keep[first_idx[dead]] = True
        b = b.filter(pa.array(keep))
        new2 = _tk_run_bounds(b, key_cols)
        rid = np.cumsum(new2) - 1
        run_start = np.flatnonzero(new2)
        seq = (np.arange(len(b), dtype=np.int64) - run_start[rid]
               if len(b) else np.array([], np.int64))
        out = b.select(key_cols + val_cols + [TYPE_COL])
        out = out.append_column(UPD_SEQ_COL, pa.array(seq))
        return out.cast(schema)
    return fn


def _resolve_merged(merged, key_cols, val_cols, schema: pa.Schema):
    """Co-locate complete key groups, then run the vectorized resolve."""
    return _colocate_groups(merged, key_cols).map_batches(
        _resolve_block_fn(key_cols, val_cols, schema),
        batch_format="pyarrow", batch_size=None)


def read_sources(feeders: list, down_spec: StageSpec,
                 threshold: int | None = None):
    """feeders: list of (feed_ds|None, content_ds|None, upstream_spec).
    Returns the merged update Dataset for the downstream stage (columns
    = downstream source schema + _type + _upd_seq).

    Waves up to ``threshold`` feed rows (default
    produce.PRESERVE_JOIN_THRESHOLD) collect the affected key set on
    the driver and broadcast it — the reference's delta cost model.
    Larger waves switch to the semi-join formulation SURVEY §2 F10
    maps out: affected keys stay a Dataset, content parts are
    left_semi-joined to (affected ∖ feeder's own keys) — the driver
    never holds a key."""
    from .produce import PRESERVE_JOIN_THRESHOLD

    key_cols = down_spec.source_key
    val_cols = down_spec.source_value_columns
    out_schema = down_spec.updates_schema().append(
        pa.field(UPD_SEQ_COL, pa.int64()))

    counts = [feed.count() if feed is not None else 0
              for feed, _, _ in feeders]
    if threshold is None:
        threshold = PRESERVE_JOIN_THRESHOLD
    if sum(counts) > threshold:
        return _read_sources_join(feeders, down_spec, counts, out_schema)

    feed_keys = []
    for feed, _, _ in feeders:
        feed_keys.append(_collect_tuples(feed, key_cols)
                         if feed is not None else set())
    affected: set = set().union(*feed_keys) if feed_keys else set()
    if not affected:
        return _empty_ds(out_schema)

    parts = []
    for i, (feed, content, up_spec) in enumerate(feeders):
        if feed is not None and feed_keys[i]:
            parts.append(_feed_part(feed, key_cols, val_cols, i))
        if content is not None:
            missing = affected - feed_keys[i]
            if missing:
                parts.append(_content_part(content, up_spec, key_cols,
                                           val_cols, missing, i))
    if not parts:
        return _empty_ds(out_schema)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.union(p)
    return _resolve_merged(merged, key_cols, val_cols, out_schema)


def _read_sources_join(feeders: list, down_spec: StageSpec, counts: list,
                       out_schema: pa.Schema, parts_n: int | None = None):
    """Distributed read_sources: the same three-layer merge semantics
    with Dataset joins instead of driver key sets."""
    from .produce import (_distinct_key_ds, _exchange_partitions,
                          _safe_join)

    key_cols = down_spec.source_key
    val_cols = down_spec.source_value_columns
    if not any(counts):
        return _empty_ds(out_schema)
    if parts_n is None:
        parts_n = _exchange_partitions(
            *[d for feed, content, _ in feeders
              for d in (feed, content)])

    key_ds = [_distinct_key_ds(feed, key_cols, parts_n)
              if feed is not None and counts[i] else None
              for i, (feed, _, _) in enumerate(feeders)]
    live = [k for k in key_ds if k is not None]
    affected = live[0]
    for k in live[1:]:
        affected = affected.union(k)
    if len(live) > 1:
        affected = _distinct_key_ds(affected, key_cols, parts_n)
    affected = affected.materialize()

    parts = []
    for i, (feed, content, up_spec) in enumerate(feeders):
        if feed is not None and counts[i]:
            parts.append(_feed_part(feed, key_cols, val_cols, i))
        if content is not None:
            missing = affected if key_ds[i] is None else _safe_join(
                affected, key_ds[i], "left_anti", tuple(key_cols),
                parts=parts_n).materialize()
            if missing.count() == 0:
                continue    # every affected key is in this feeder's feed
            # materialized: a join operator embedded in the downstream
            # union→groupby plan deadlocks the streaming executor on
            # small clusters, and the result is delta-sized anyway
            filtered = _safe_join(content, missing, "left_semi",
                                  tuple(key_cols),
                                  parts=parts_n).materialize()
            if filtered.count() == 0:
                continue    # feeder has no content for the missing keys
            parts.append(_content_part_from(filtered, up_spec, key_cols,
                                            val_cols, i))
    if not parts:
        return _empty_ds(out_schema)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.union(p)
    return _resolve_merged(merged, key_cols, val_cols, out_schema)


class Producer:
    """DAG node (reference ``Producer<SK,SV,TK,TV>``, Producer.cs:29-99)."""

    def __init__(self, store, spec: StageSpec, sources: list | None = None):
        self.store = store
        self.spec = spec
        self.sources: list[Producer] = list(sources or [])
        self.targets: list[Producer] = []
        for s in self.sources:
            if self in s.targets:
                raise ValueError(
                    f"{s.name} already produces {self.name} "
                    "(Producer.cs:77-83 duplicate-edge check)")
            s.targets.append(self)

    @property
    def name(self) -> str:
        return self.spec.name

    def produces(self, spec: StageSpec) -> "Producer":
        """Chain a downstream stage (reference ``Produces``,
        Producer.cs:68-75)."""
        return Producer(self.store, spec, [self])

    # -- cascade ----------------------------------------------------------

    def _collect_targets(self, acc: set) -> None:
        for t in self.targets:
            if t not in acc:
                acc.add(t)
                t._collect_targets(acc)

    def _sequence(self) -> list:
        """Topological order, sources before targets
        (Producer.cs:121-141)."""
        nodes = {self}
        self._collect_targets(nodes)
        order: list = []

        def visit(n):
            if n in order:
                return
            for s in n.sources:
                if s in nodes:
                    visit(s)
            order.append(n)

        visit(self)
        for n in sorted(nodes - {self}, key=lambda p: p.name):
            visit(n)
        return order

    def update(self, source_updates, based_on_version: int) -> dict:
        """Run this stage on `source_updates` then cascade to every
        transitive downstream stage (Producer.cs:143-186).  Returns
        per-stage wall-times; every stage uploads version N+1."""
        timings = {}
        t0 = time.perf_counter()
        self._update_internal(source_updates, based_on_version)
        timings[self.name] = round(time.perf_counter() - t0, 4)
        for node in self._sequence():
            if node is self:
                continue
            t0 = time.perf_counter()
            node._update_from_sources(based_on_version)
            timings[node.name] = round(time.perf_counter() - t0, 4)
        return timings

    def _update_internal(self, source_updates, version: int) -> None:
        state = self.store.read_state(self.name)
        if hasattr(self.spec.preserver, "next_id"):
            self.spec.preserver.next_id = int(state.get("next_id", 1))
        prev_c = self.store.open_read(self.name, "content", version)
        prev_m = self.store.open_read(self.name, "key_mappings", version)
        content, mappings, feed = apply_updates(
            self.spec, source_updates, prev_c, prev_m)
        self.store.upload(self.name, "content", version + 1, content)
        self.store.upload(self.name, "key_mappings", version + 1, mappings)
        self.store.upload(self.name, "updates", version + 1, feed)
        if hasattr(self.spec.preserver, "next_id"):
            state["next_id"] = self.spec.preserver.next_id
        state["version"] = version + 1
        self.store.write_state(self.name, state)

    def _update_from_sources(self, version: int) -> None:
        """Pull the update feed(s) of the (already-updated) sources
        (Producer.cs:178-185): one source → consume its feed directly;
        several → the ReadSources merge."""
        if len(self.sources) == 1:
            feed = self.store.open_read(self.sources[0].name, "updates",
                                        version + 1)
            updates = feed if feed is not None else _empty_ds(
                self.spec.updates_schema().append(
                    pa.field(UPD_SEQ_COL, pa.int64())))
        else:
            feeders = []
            for s in self.sources:
                feed = self.store.open_read(s.name, "updates", version + 1)
                # a feeder outside this cascade wave keeps its current
                # content and contributes no updates
                content = (self.store.open_read(s.name, "content",
                                                version + 1)
                           or self.store.open_read(s.name, "content",
                                                   version))
                feeders.append((feed, content, s.spec))
            updates = read_sources(feeders, self.spec)
        self._update_internal(updates, version)


class RangedProducer(Producer):
    """Producer whose stage state lives in range-partitioned versioned
    tables (engine/ranged.py): bootstrap is one distributed sort per
    table; every later version rewrites only the partitions the delta
    touches and hardlinks the rest.  The DAG/cascade semantics are the
    base class's; only the storage + apply path differ.

    Incremental deltas are assumed delta-sized (they are collected to
    drive range pruning); surrogate-id lookups are range-pruned point
    reads of the previous version.
    """

    def __init__(self, root: str, spec: StageSpec,
                 sources: list | None = None,
                 target_rows: int = 100_000):
        super().__init__(None, spec, sources)
        import os as _os

        from ..pipelines.incremental import IncrementalMirror
        self.root = root
        self.target_rows = target_rows
        self.mirror = IncrementalMirror(
            _os.path.join(root, spec.name), spec, target_rows)

    def produces(self, spec: StageSpec) -> "RangedProducer":
        return RangedProducer(self.root, spec, [self], self.target_rows)

    def _update_internal(self, source_updates, version: int) -> None:
        if self.mirror.content.manifest(version) is None:
            ds = source_updates
            if isinstance(ds, pa.Table):
                from .produce import updates_from_table
                ds = updates_from_table(ds)
            elif UPD_SEQ_COL not in ds.schema().names:
                # within-batch arange preserves intra-batch input order
                # (cross-batch order of same-key rows is unspecified for
                # a Dataset bootstrap; callers that need total within-key
                # order pass _upd_seq themselves, as updates_from_table
                # does)
                def add_seq(t: pa.Table) -> pa.Table:
                    return t.append_column(
                        UPD_SEQ_COL, pa.array(np.arange(len(t),
                                                        dtype=np.int64)))
                ds = ds.map_batches(add_seq, batch_format="pyarrow")
            self.mirror.bootstrap(ds, version + 1)
            return
        if isinstance(source_updates, pa.Table):
            tbl = source_updates
        else:
            batches = list(source_updates.iter_batches(
                batch_format="pyarrow"))
            tbl = (pa.concat_tables(batches) if batches
                   else self.spec.updates_schema().empty_table())
        if UPD_SEQ_COL in tbl.column_names:
            tbl = tbl.drop_columns([UPD_SEQ_COL])
        self.mirror.apply(tbl, version)

    def _update_from_sources(self, version: int) -> None:
        if len(self.sources) == 1:
            feed = self.sources[0].mirror.read_feed(version + 1)
            updates = feed if feed is not None else _empty_ds(
                self.spec.updates_schema().append(
                    pa.field(UPD_SEQ_COL, pa.int64())))
        else:
            feeders = []
            for s in self.sources:
                feed = s.mirror.read_feed(version + 1)
                content = (s.mirror.content.read(version + 1)
                           or s.mirror.content.read(version))
                feeders.append((feed, content, s.spec))
            updates = read_sources(feeders, self.spec)
        self._update_internal(updates, version)
