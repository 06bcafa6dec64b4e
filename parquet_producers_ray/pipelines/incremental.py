"""Incrementally-maintained url-keyed mirror of a web-page table —
the reference's signature lifecycle (``ParquetProduction.Update``,
:52-91) on the range-partitioned versioned store:

- bootstrap: one distributed sort + write (the only time the full
  dataset is sorted);
- every later version: expand the delta through the provenance index
  (range-pruned mapping reads — no table scan), rewrite only the
  content/mapping partitions the delta touches, hardlink the rest,
  emit the exact Add/Update/Delete feed.

Cost per version = O(delta + touched partitions), the reference's
"sort only the delta, scan prior state forward" contract — improved:
prior state isn't even scanned, only range-intersected partitions are.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..engine.model import (ADD, DELETE, SEQ_COL, TYPE_COL, UPD_SEQ_COL,
                            UPDATE, KeyValuePreserver, StageSpec)
from ..engine.produce import produce_adds
from ..engine.ranged import RangedTable


def _collect(ds_or_tbl, cols) -> set:
    if isinstance(ds_or_tbl, pa.Table):
        return set(zip(*(ds_or_tbl.column(c).to_pylist() for c in cols)))
    out = set()
    for b in ds_or_tbl.select_columns(cols).iter_batches(
            batch_format="pyarrow"):
        out.update(zip(*(b.column(c).to_pylist() for c in cols)))
    return out


def webpage_mirror_spec() -> StageSpec:
    """url-keyed identity mirror of the web-page table (vectorized
    row-wise produce: no per-key Python calls)."""
    from ..sources.webpages import SCHEMA

    value_cols = ["warc_ts", "html", "text", "lang"]

    def mirror_rows(batch: pa.Table) -> pa.Table:
        cols = {"url": batch.column("url"),
                "_sk_url": batch.column("url")}
        for c in value_cols:
            cols[c] = batch.column(c)
        cols["_row"] = pa.array(np.arange(len(batch), dtype=np.int64))
        return pa.table(cols)

    return StageSpec(
        name="webpage_mirror", produce=None, produce_rows=mirror_rows,
        source_key=["url"], target_key=["url"],
        value_columns=value_cols, source_value_columns=value_cols,
        out_schema=SCHEMA, source_schema=SCHEMA)


def updates_with_type(table: pa.Table, type_: int = UPDATE) -> pa.Table:
    return table.append_column(
        TYPE_COL, pa.array(np.full(len(table), type_, np.int8)))


class IncrementalMirror:
    def __init__(self, root: str, spec: StageSpec,
                 target_rows: int = 100_000,
                 target_bytes: int | None = None):
        self.spec = spec
        self.root = root
        tk, skp = spec.target_key, spec.stored_sk
        kw = {} if target_bytes is None else {"target_bytes": target_bytes}
        self.content = RangedTable(os.path.join(root, "content"),
                                   tk + skp + [SEQ_COL], target_rows, **kw)
        self.mappings = RangedTable(os.path.join(root, "key_mappings"),
                                    skp + tk + [SEQ_COL], target_rows, **kw)

    # -- update feed persistence ---------------------------------------------

    def _feed_dir(self, version: int) -> str:
        return os.path.join(self.root, "updates", f"v{version}")

    def _write_feed_ds(self, feed_ds, version: int) -> None:
        d = self._feed_dir(version)
        import shutil
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
        feed_ds.write_parquet(d)

    def _write_feed_tbl(self, feed: pa.Table, version: int) -> None:
        import pyarrow.parquet as pq
        d = self._feed_dir(version)
        import shutil
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
        pq.write_table(feed, os.path.join(d, "part-0.parquet"))

    def read_feed(self, version: int):
        import ray.data
        d = self._feed_dir(version)
        if not os.path.isdir(d):
            return None
        return ray.data.read_parquet(d)

    # -- bootstrap ----------------------------------------------------------

    def bootstrap(self, updates_ds, version: int = 1,
                  emit_feed: bool = True) -> None:
        """Initial load through the fully-tested apply_updates bootstrap
        path; content and mappings land sorted and are persisted as
        range manifests, the feed (everything Add/Update-labeled) as a
        plain versioned parquet dir.  Bootstrap feed labeling shares
        the content's ONE full-data sort (apply_updates bootstrap
        branch); ``emit_feed=False`` still skips feed materialization
        for consumers that read content directly."""
        from ..engine.produce import apply_updates

        if hasattr(self.spec.preserver, "next_id"):
            state = self._read_state()
            self.spec.preserver.next_id = int(state.get("next_id", 1))
        content, mappings, feed = apply_updates(self.spec, updates_ds,
                                                None, None,
                                                emit_feed=emit_feed)
        self.content.write_full(content, version)
        self.mappings.write_full(mappings, version)
        if emit_feed:
            self._write_feed_ds(feed, version)
        if hasattr(self.spec.preserver, "next_id"):
            state["next_id"] = self.spec.preserver.next_id
            self._write_state(state)

    def _preserve_ids(self, adds: pa.Table, version: int) -> pa.Table:
        """F9/U12 on the ranged store: example ids come from the
        previous version's content via RANGE-PRUNED point lookups (no
        table scan); fresh ids allocate in target-key order from the
        counter persisted beside the table."""
        from ..engine.produce import _sorted_by_target_order

        spec = self.spec
        tk = spec.target_key
        idc = spec.preserver.id_column
        state = self._read_state()
        spec.preserver.next_id = int(state.get("next_id", 1))

        add_tks = _collect(adds, tk)
        prev = self.content.read_keys(version, add_tks)
        prev_ids: dict = {}
        if prev is not None:
            for *t, i in zip(*([prev.column(c).to_pylist() for c in tk]
                               + [prev.column(idc).to_pylist()])):
                prev_ids.setdefault(tuple(t), i)
        for t in _sorted_by_target_order(add_tks - prev_ids.keys(),
                                         spec.target_sort_desc(), spec):
            prev_ids[t] = spec.preserver.next_id
            spec.preserver.next_id += 1
        tups = zip(*(adds.column(c).to_pylist() for c in tk))
        ids = pa.array([prev_ids[t] for t in tups],
                       type=spec.out_schema.field(idc).type)
        # NOTE: the advanced counter is persisted by apply() AFTER all
        # version data is written — a crash mid-version then re-run
        # must reallocate the same ids (idempotent resume)
        return adds.set_column(adds.column_names.index(idc), idc, ids)

    def _preserve_values(self, adds: pa.Table, version: int) -> pa.Table:
        """General ``PreserveKeyValues`` hook (F9,
        ParquetProducerOptions.cs:16-28) on the ranged store: example
        previous values come from RANGE-PRUNED point lookups over the
        prior version, row-aligned per add row, then the user batch
        hook runs once over the whole (delta-sized) add table."""
        from ..engine.produce import EX_MARKER

        spec = self.spec
        tk, vals = spec.target_key, spec.value_columns
        add_tks = _collect(adds, tk)
        prev = self.content.read_keys(version, add_tks)
        examples: dict = {}
        if prev is not None:
            # prev is in stored (tk, sk, _seq) order → first per key
            for *t, v in zip(*([prev.column(c).to_pylist() for c in tk]
                               + [list(zip(*(prev.column(c).to_pylist()
                                             for c in vals)))])):
                examples.setdefault(tuple(t), v)
        tups = list(zip(*(adds.column(c).to_pylist() for c in tk)))
        has = [t in examples for t in tups]
        ex_cols = {
            c: pa.array([examples[t][i] if h else None
                         for t, h in zip(tups, has)],
                        type=spec.out_schema.field(c).type)
            for i, c in enumerate(vals)}
        ex_tbl = pa.table(ex_cols | {EX_MARKER: pa.array(has)})
        out_vals = spec.preserver.preserve(adds.select(tk + vals), ex_tbl)
        for c in vals:
            adds = adds.set_column(adds.column_names.index(c), c,
                                   out_vals.column(c).cast(
                                       spec.out_schema.field(c).type))
        return adds

    def info(self) -> dict:
        """Per-version inventory across the mirror's surfaces — a pure
        metadata read (manifests + directory listings), no Ray."""
        out = {}
        for v in self.content.versions():
            m = self.content.manifest(v) or {"partitions": []}
            vdir = self.content._vdir(v)
            rows = sum(p["rows"] for p in m["partitions"])
            nbytes = sum(os.path.getsize(os.path.join(vdir, p["file"]))
                         for p in m["partitions"])
            out[v] = {"partitions": len(m["partitions"]), "rows": rows,
                      "bytes": nbytes,
                      "feed": os.path.isdir(self._feed_dir(v))}
        return {"root": self.root, "versions": out,
                "state": self._read_state()}

    def compact(self, version: int) -> dict:
        """Compaction wave: version+1 is version with adjacent
        undersized partitions merged (RangedTable.compact) on both
        content and mappings.  No feed — compaction changes layout,
        not data (read_feed returns None for the compaction version,
        like a feed-less bootstrap)."""
        return {"version": version + 1,
                "content": self.content.compact(version, version + 1),
                "mappings": self.mappings.compact(version, version + 1)}

    def prune(self, keep_from: int, keep_feeds: bool = False) -> dict:
        """Retention GC across the mirror's three surfaces: content and
        mapping versions below ``keep_from`` are deleted (hardlink-aware
        — see RangedTable.prune), and unless ``keep_feeds`` the
        corresponding update-feed dirs go too (feeds are per-version
        deltas; a CDC consumer that has caught up no longer needs
        them)."""
        import shutil

        vs = self.content.versions()
        if vs:      # same newest-version clamp as RangedTable.prune,
            keep_from = min(keep_from, vs[-1])   # applied to feeds too
        out = {"content": self.content.prune(keep_from),
               "mappings": self.mappings.prune(keep_from)}
        freed_feeds = 0
        pruned_feeds = 0
        if not keep_feeds:
            for v in range(1, keep_from):
                d = self._feed_dir(v)
                if os.path.isdir(d):
                    freed_feeds += sum(
                        os.path.getsize(os.path.join(d, f))
                        for f in os.listdir(d))
                    shutil.rmtree(d)
                    pruned_feeds += 1
        out["feeds"] = {"pruned_versions": pruned_feeds,
                        "freed_bytes": freed_feeds}
        return out

    def _state_path(self) -> str:
        return os.path.join(self.root, "_state.json")

    def _read_state(self) -> dict:
        import json
        try:
            with open(self._state_path()) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def _write_state(self, state: dict) -> None:
        import json
        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_path())

    # -- one incremental version ---------------------------------------------

    def apply(self, updates_tbl: pa.Table, version: int) -> dict:
        """Apply one delta batch based on `version`, writing version+1.
        Returns {"feed": pa.Table, "content": stats, "mappings": stats}.
        """
        import ray.data

        spec = self.spec
        tk, skp, vals = spec.target_key, spec.stored_sk, spec.value_columns
        raw_sk = spec.source_key

        # reference rule (ParquetProduction.cs:326-337, same check as
        # engine/produce.py): a source key carries EITHER one Delete OR
        # upserts, never a mix
        import pyarrow.compute as pc
        is_del = pc.equal(updates_tbl.column(TYPE_COL), DELETE)
        if pc.any(is_del).as_py():
            del_sks = _collect(updates_tbl.filter(is_del), raw_sk)
            ups_sks = _collect(updates_tbl.filter(pc.invert(is_del)),
                               raw_sk)
            mixed = del_sks & ups_sks
            if mixed:
                raise ValueError(
                    "update batch mixes Delete and upsert rows for "
                    f"source key(s) {sorted(mixed)[:5]}")

        updates_tbl = updates_tbl.append_column(
            UPD_SEQ_COL, pa.array(np.arange(len(updates_tbl)),
                                  type=pa.int64()))
        updates_ds = ray.data.from_arrow(updates_tbl)
        adds_ds = produce_adds(spec, updates_ds).materialize()
        adds = pa.concat_tables(
            list(adds_ds.iter_batches(batch_format="pyarrow"))) \
            if adds_ds.count() else spec.content_schema().empty_table()
        if spec.preserver is not None and len(adds):
            adds = self._preserve_values(adds, version) \
                if isinstance(spec.preserver, KeyValuePreserver) \
                else self._preserve_ids(adds, version)

        updated_sks = _collect(updates_tbl, raw_sk)
        prior = self.mappings.read_keys(version, updated_sks)
        prior_pairs = _collect(prior, skp + tk) if prior is not None \
            else set()
        add_pairs = _collect(adds, skp + tk)
        touched_pairs = prior_pairs | add_pairs
        feed_schema = spec.feed_schema()
        if not touched_pairs:
            # no-op version: hardlink everything
            c = self.content.apply_delta(
                version, version + 1, adds.select(
                    tk + skp + vals + [SEQ_COL]), set(), tk + skp)
            m = self.mappings.apply_delta(
                version, version + 1,
                adds.select(skp + tk + [SEQ_COL]), set(), skp + tk)
            self._write_feed_tbl(feed_schema.empty_table(), version + 1)
            return {"feed": feed_schema.empty_table(), "content": c,
                    "mappings": m}

        touched_tks = {t[len(skp):] for t in touched_pairs}
        content_drops = {t[len(skp):] + t[:len(skp)]
                         for t in touched_pairs}       # (tk, sk) order

        before = self.content.read_keys(version, touched_tks)
        before_tks = _collect(before, tk) if before is not None else set()

        cstats = self.content.apply_delta(
            version, version + 1, adds.select(tk + skp + vals + [SEQ_COL]),
            content_drops, tk + skp)
        mstats = self.mappings.apply_delta(
            version, version + 1, adds.select(skp + tk + [SEQ_COL]),
            touched_pairs, skp + tk)

        # feed: full new rowset per touched tk (reference F7/F8 labels),
        # labeled VECTORIZED over the sorted table — the only Python
        # loop is over run starts (one per touched tk, delta-sized)
        after = self.content.read_keys(version + 1, touched_tks)
        parts = []
        if after is not None and len(after):
            after = after.sort_by([(c, "ascending")
                                   for c in tk + skp + [SEQ_COL]])
            n = len(after)
            new_run = np.zeros(n, dtype=bool)
            new_run[0] = True
            for c in tk:
                col = after.column(c).to_numpy(zero_copy_only=False)
                new_run[1:] |= col[1:] != col[:-1]
            run_starts = np.flatnonzero(new_run)
            run_id = np.cumsum(new_run) - 1
            upd_seq = np.arange(n) - run_starts[run_id]
            is_add_run = np.fromiter(
                (tuple(after.column(c)[int(s)].as_py() for c in tk)
                 not in before_tks for s in run_starts),
                dtype=bool, count=len(run_starts))
            types = np.full(n, UPDATE, dtype=np.int8)
            types[run_starts[is_add_run]] = ADD
            main = {c: after.column(c) for c in tk + vals}
            main[TYPE_COL] = pa.array(types)
            main[UPD_SEQ_COL] = pa.array(upd_seq, type=pa.int64())
            parts.append(pa.table(main).select(feed_schema.names)
                         .cast(feed_schema))
        live_tks = _collect(after, tk) if after is not None else set()
        dead = sorted(touched_tks - live_tks)
        if dead:
            drows = {c: pa.array([t[i] for t in dead],
                                 type=feed_schema.field(c).type)
                     for i, c in enumerate(tk)}
            for c in vals:
                drows[c] = pa.nulls(len(dead), feed_schema.field(c).type)
            drows[TYPE_COL] = pa.array([DELETE] * len(dead), pa.int8())
            drows[UPD_SEQ_COL] = pa.array([0] * len(dead), pa.int64())
            parts.append(pa.table(drows).select(feed_schema.names)
                         .cast(feed_schema))
        feed = pa.concat_tables(parts) if parts \
            else feed_schema.empty_table()
        feed = feed.sort_by([(c, "ascending") for c in tk]
                            + [(UPD_SEQ_COL, "ascending")])
        self._write_feed_tbl(feed, version + 1)
        if hasattr(spec.preserver, "next_id"):
            state = self._read_state()
            state["next_id"] = spec.preserver.next_id
            self._write_state(state)
        return {"feed": feed, "content": cstats, "mappings": mstats}
