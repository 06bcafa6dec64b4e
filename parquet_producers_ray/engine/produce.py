"""Keyed sort-then-produce with incremental maintenance — the engine
core, re-expressing the reference's single-threaded merge-scan
algorithms (F1–F9) as Ray Data shuffles.

Reference semantics reproduced (verified against
``ParquetProduction.cs`` and the reference test goldens):

- ``GenerateInstructions`` (:279-374): every updated source key first
  deletes all its previously produced (sk, tk) pairs (discovered via
  the key-mappings provenance index), then its upsert values are
  re-produced.  A key carries either one Delete or ≥1 upserts, never a
  mix (throws otherwise).
- ``ExecuteInstructionsOnMappings`` (:376-453): per (sk, tk) group —
  any instruction present ⇒ the group becomes exactly the non-deletion
  instructions (with multiplicity); otherwise existing rows pass
  through.
- ``ExecuteInstructionsOnContent`` (:463-704) with
  ``PendingDeleteState`` (PendingDeleteState.cs:37-96): per (tk, sk)
  pair touched by instructions the new rows replace old ones; the
  outgoing update feed emits, for every *touched* target key, its FULL
  new row set in (tk, sk) order — first row labeled Add iff the target
  key did not previously exist, everything else Update ("unnecessary
  upserts" included, Tests:481-517) — or a single Delete when the
  target key has no rows left.

Instead of the reference's instruction spools + external sorts
(InstructionsStorage/MergeSorter — subsumed by Ray's shuffle), the
delta's key sets (updated source keys, touched (sk,tk) pairs, touched
target keys) are collected on the driver and BROADCAST into vectorized
``map_batches`` filters over the prior state.  This matches the
reference's cost model exactly — "sort only the delta, scan prior
state forward" (README.md:160-166): prior content/mappings stream once
through a filter with no shuffle; only delta-sized sets move.  For
delta sizes beyond driver memory a partitioned join formulation is the
fallback (not needed at the reference's delta scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .model import (ADD, DELETE, SEQ_COL, SK_PREFIX, TYPE_COL, UPD_SEQ_COL,
                    UPDATE, StageSpec)

ISNEW_COL = "_isnew"
NUM_JOIN_PARTITIONS = 32


def updates_from_table(table: pa.Table):
    """Wrap an update batch (key + value cols + _type) as a Dataset with
    the within-batch order column the group stage needs."""
    import ray.data

    table = table.append_column(
        UPD_SEQ_COL, pa.array(np.arange(len(table)), type=pa.int64()))
    return ray.data.from_arrow(table)


def updates_from_dataset(ds, seq_from: str | None = None):
    """Dataset-NATIVE wave construction: append ``_upd_seq`` per batch
    without ever materializing the wave on the driver (the scale form of
    ``updates_from_table`` — a 10^12-row wave must stay distributed).

    ``_upd_seq`` orders upsert rows WITHIN one source key.  Pass
    ``seq_from=<column>`` naming a deterministic per-key order column
    (e.g. a line number) when a key can carry several upsert rows in one
    wave; keys with a single row per wave (the common case) use the
    zero default.  The input must already carry ``_type``."""

    def fn(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if seq_from is not None:
            seq = pc.cast(b.column(seq_from), pa.int64())
        else:
            seq = pa.array(np.zeros(len(b), np.int64))
        return b.append_column(UPD_SEQ_COL, seq)

    return ds.map_batches(fn, batch_format="pyarrow")


def _collect_tuples(ds, cols: list) -> set:
    """Driver-side distinct tuple set of delta-sized columns."""
    out = set()
    for batch in ds.select_columns(cols).iter_batches(batch_format="pyarrow"):
        out.update(zip(*(batch.column(c).to_pylist() for c in cols)))
    return out


def _membership_mask(batch: pa.Table, cols: list, keyset,
                     value_arr: pa.Array | None = None) -> np.ndarray:
    """Boolean mask: row's tuple over ``cols`` ∈ keyset.  Single-column
    keys use the vectorized ``pc.is_in`` kernel (pass ``value_arr`` to
    reuse a pre-converted value set across batches); compound keys fall
    back to a tuple-hash probe (keys are narrow; the wide value columns
    never enter this path)."""
    import pyarrow.compute as pc

    if len(cols) == 1:
        values = value_arr if value_arr is not None else pa.array(
            [t[0] for t in keyset],
            type=batch.schema.field(cols[0]).type)
        return pc.is_in(batch.column(cols[0]),
                        value_set=values).to_numpy(zero_copy_only=False)
    tups = zip(*(batch.column(c).to_pylist() for c in cols))
    return np.fromiter((t in keyset for t in tups), dtype=bool,
                       count=len(batch))


def _broadcast_filter(conditions):
    """map_batches fn keeping rows that satisfy ALL (cols, keyset, keep)
    conditions.  Key sets are shipped via ``ray.put`` (one object-store
    copy per node) and dereferenced once per task, never per batch —
    the broadcast-small-side pattern that replaces a shuffle join."""
    import ray

    refs = [(cols, ray.put(keyset), keep) for cols, keyset, keep in conditions]

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray
        if len(batch) == 0:
            return batch
        mask = np.ones(len(batch), dtype=bool)
        cache = getattr(fn, "_cache", None)
        if cache is None:
            # fetch each keyset once per task AND pre-convert the
            # single-column value sets to Arrow once, not per batch
            cache = fn._cache = []
            for cols, r, _ in refs:
                keyset = _ray.get(r)
                arr = pa.array(
                    [t[0] for t in keyset],
                    type=batch.schema.field(cols[0]).type) \
                    if len(cols) == 1 else None
                cache.append((keyset, arr))
        for (cols, _, keep), (keyset, arr) in zip(refs, cache):
            m = _membership_mask(batch, cols, keyset, value_arr=arr)
            mask &= m if keep else ~m
        return batch.filter(pa.array(mask))
    return fn


def _produce_group_fn(spec: StageSpec):
    tk, vals = spec.target_key, spec.value_columns
    src_vals = spec.source_value_columns
    sk = spec.source_key

    def fn(g: pa.Table) -> pa.Table:
        if UPD_SEQ_COL in g.column_names:
            g = g.sort_by(UPD_SEQ_COL)
        types = g.column(TYPE_COL).to_pylist()
        is_del = [t == DELETE for t in types]
        if any(is_del):
            if not all(is_del):
                raise ValueError(
                    f"stage {spec.name}: key carries both Delete and "
                    "upserts in one batch (reference "
                    "ParquetProduction.cs:326-337 rule)")
            out = pa.Table.from_pylist([], schema=spec.output_schema())
        else:
            key_tuple = tuple(g.column(c)[0].as_py() for c in sk)
            produced = spec.produce(key_tuple, g.select(src_vals))
            out = produced.select(tk + vals).cast(spec.output_schema())
        n = len(out)
        for c in sk:
            out = out.append_column(
                SK_PREFIX + c, pa.array([g.column(c)[0].as_py()] * n,
                                        type=g.schema.field(c).type))
        out = out.append_column(SEQ_COL, pa.array(np.arange(n),
                                                  type=pa.int64()))
        return out.select(tk + [SK_PREFIX + c for c in sk] + vals
                          + [SEQ_COL])

    return fn


def _output_schema(spec: StageSpec) -> pa.Schema:
    return spec.output_schema()


ROW_COL = "_row"
_SEQ_FAN = 1 << 20   # max emissions per input row in the row-wise path


def _produce_rows_fn(spec: StageSpec):
    """Vectorized production: per-batch call to spec.produce_rows over
    upsert rows only; _seq = upd_seq * FAN + within-row emission index
    (deterministic and batch-split-safe because each input row's
    outputs are contiguous)."""
    tk, vals, sk = spec.target_key, spec.value_columns, spec.source_key

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.not_equal(batch.column(TYPE_COL), DELETE)
        batch = batch.filter(keep)
        empty_schema = pa.schema(
            [spec.out_schema.field(c) for c in tk]
            + [spec.source_schema.field(c).with_name(SK_PREFIX + c)
               for c in sk]
            + [spec.out_schema.field(c) for c in vals]
            + [pa.field(SEQ_COL, pa.int64())])
        if len(batch) == 0:
            return empty_schema.empty_table()
        out = spec.produce_rows(batch)
        rowidx = out.column(ROW_COL).to_numpy(zero_copy_only=False)
        upd = batch.column(UPD_SEQ_COL).to_numpy(
            zero_copy_only=False)[rowidx]
        run_start = np.zeros(len(rowidx), dtype=np.int64)
        changes = np.flatnonzero(np.diff(rowidx)) + 1
        run_start[changes] = changes
        np.maximum.accumulate(run_start, out=run_start)
        within = np.arange(len(rowidx), dtype=np.int64) - run_start
        seq = upd * _SEQ_FAN + within
        cols = {c: out.column(c) for c in tk}
        for c in sk:
            cols[SK_PREFIX + c] = out.column(SK_PREFIX + c)
        for c in vals:
            cols[c] = out.column(c)
        cols[SEQ_COL] = pa.array(seq)
        return pa.table(cols).cast(empty_schema)

    return fn


def _produce_grouped_fn(spec: StageSpec):
    """Vectorized GROUPED production: each block holds COMPLETE
    source-key groups (co-located by produce_adds' keyed exchange).
    Sorts the block by (source_key, _upd_seq), enforces the
    no-mixed-Delete rule vectorized (reference
    ParquetProduction.cs:326-337), strips delete-only groups, calls
    ``spec.produce_grouped`` ONCE, and assigns ``_seq`` per source-key
    run of the output — one Python call per block instead of per key."""
    sk, tk, vals = spec.source_key, spec.target_key, spec.value_columns

    def fn(batch: pa.Table) -> pa.Table:
        schema = pa.schema(
            [spec.out_schema.field(c) for c in tk]
            + [spec.source_schema.field(c).with_name(SK_PREFIX + c)
               for c in sk]
            + [spec.out_schema.field(c) for c in vals]
            + [pa.field(SEQ_COL, pa.int64())])
        if len(batch) == 0:
            return schema.empty_table()
        batch = batch.sort_by([(c, "ascending") for c in sk]
                              + [(UPD_SEQ_COL, "ascending")])
        new = _tk_run_bounds(batch, sk)
        gid = np.cumsum(new) - 1
        ng = int(gid[-1]) + 1
        types = batch.column(TYPE_COL).to_numpy(zero_copy_only=False)
        isdel = types == DELETE
        delc = np.bincount(gid, weights=isdel.astype(np.float64),
                           minlength=ng)
        cnt = np.bincount(gid, minlength=ng)
        if np.any((delc > 0) & (delc < cnt)):
            raise ValueError(
                f"stage {spec.name}: key carries both Delete and "
                "upserts in one batch (reference "
                "ParquetProduction.cs:326-337 rule)")
        if isdel.any():
            batch = batch.filter(pa.array(~isdel))
            if len(batch) == 0:
                return schema.empty_table()
        out = spec.produce_grouped(batch)
        # _seq = emission index within each source-key run of the output
        onew = _tk_run_bounds(out, spec.stored_sk)
        rid = np.cumsum(onew) - 1
        run_start = np.flatnonzero(onew)
        seq = np.arange(len(out), dtype=np.int64) - run_start[rid] \
            if len(out) else np.array([], np.int64)
        cols = {c: out.column(c) for c in tk}
        for c in sk:
            cols[SK_PREFIX + c] = out.column(SK_PREFIX + c)
        for c in vals:
            cols[c] = out.column(c)
        cols[SEQ_COL] = pa.array(seq)
        return pa.table(cols).cast(schema)

    return fn


def produce_adds(spec: StageSpec, source_updates):
    """F1+F3 production half: group upserts by source key, run the user
    produce, emit add-instruction rows (tk + sk + values + _seq).
    Stages declaring a vectorized ``produce_rows`` skip the per-key
    grouping entirely — no shuffle, no per-key Python call; stages
    declaring ``produce_grouped`` pay ONE keyed exchange and a single
    vectorized call per block instead of Python per key."""
    if spec.produce_rows is not None:
        return source_updates.map_batches(_produce_rows_fn(spec),
                                          batch_format="pyarrow")
    if spec.produce_grouped is not None:
        co = colocate_key_groups(source_updates, spec.source_key)
        return co.map_batches(_produce_grouped_fn(spec),
                              batch_format="pyarrow", batch_size=None)
    return (source_updates.groupby(spec.source_key)
            .map_groups(_produce_group_fn(spec), batch_format="pyarrow"))


def _tk_run_bounds(batch: pa.Table, tk: list) -> np.ndarray:
    """Indices where a new target-key run starts within a sorted batch
    (vectorized per column, no Python per row)."""
    n = len(batch)
    new = np.zeros(n, dtype=bool)
    if n == 0:
        return new
    new[0] = True
    for c in tk:
        col = batch.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.to_numpy(zero_copy_only=False)
        new[1:] |= vals[1:] != vals[:-1]
    return new


def label_feed_sorted(spec: StageSpec, flagged_sorted):
    """Vectorized feed labeling over the (tk, sk, _seq)-sorted, flagged
    (ISNEW per row) and MATERIALIZED dataset.

    The per-key ``groupby().map_groups`` formulation costs one Python
    call per target key — unusable at 10^12 keys.  Here each block
    labels its runs vectorized; a cheap first pass collects per-block
    first/last keys so runs straddling block boundaries get their Add
    flag and within-key positions stitched by a broadcast fix-up map.
    """
    import ray

    tk, sk, vals = spec.target_key, spec.stored_sk, spec.value_columns

    def summarize(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.Table.from_pylist([])
        new = _tk_run_bounds(b, tk)
        last_start = int(np.flatnonzero(new)[-1])
        row = {}
        for c in tk:
            row["first_" + c] = b.column(c)[0].as_py()
            row["last_" + c] = b.column(c)[-1].as_py()
        for c in sk + [SEQ_COL]:
            row["key_" + c] = b.column(c)[0].as_py()
        row["last_run_len"] = len(b) - last_start
        return pa.Table.from_pylist([row])

    summaries = flagged_sorted.map_batches(
        summarize, batch_size=None, batch_format="pyarrow").take_all()
    # order blocks exactly as the dataset sort did — with a
    # derived_sort_key the physical order is (derived cols, tk, sk,
    # _seq), so the summaries walk must apply the SAME derived columns
    # (computed on each block's first tk) ahead of the raw tk passes;
    # walking in raw-tk order would visit blocks out of physical order
    # and mis-stitch runs straddling block boundaries (duplicate Add
    # labels + restarted _upd_seq)
    desc = spec.target_sort_desc()
    if spec.derived_sort_key is not None and len(summaries) > 1:
        tk_schema = pa.schema([spec.out_schema.field(c) for c in tk])
        mirror = pa.table(
            {c: pa.array([r["first_" + c] for r in summaries],
                         type=tk_schema.field(c).type) for c in tk})
        for c in sk + [SEQ_COL]:
            mirror = mirror.append_column(
                "key_" + c, pa.array([r["key_" + c]
                                      for r in summaries]))
        mirror = mirror.append_column(
            "_i", pa.array(np.arange(len(summaries))))
        mirror = _append_derived(spec, mirror)
        dnames = _derived_names(spec)
        keys = [(n, "descending" if d else "ascending")
                for n, d in zip(dnames, _derived_desc(spec, len(dnames)))]
        keys += [(c, "descending" if d else "ascending")
                 for c, d in zip(tk, desc)]
        keys += [("key_" + c, "ascending") for c in sk + [SEQ_COL]]
        order = mirror.sort_by(keys).column("_i").to_pylist()
        summaries = [summaries[i] for i in order]
    else:
        # per-column stable passes honoring descending tk flags
        for c in reversed(sk + [SEQ_COL]):
            summaries.sort(key=lambda r, c=c: r["key_" + c])
        for i in range(len(tk) - 1, -1, -1):
            summaries.sort(key=lambda r, c=tk[i]: r["first_" + c],
                           reverse=desc[i])
    # walk blocks in key order tracking (carry_tk, carry_cnt) = the tk
    # of the last run seen and its accumulated row count; a block whose
    # first tk equals carry_tk starts mid-group: its first run is not
    # group-first and its positions begin at carry_cnt
    fixups: dict = {}
    carry_tk, carry_cnt = None, 0
    for r in summaries:
        first_tk = tuple(r["first_" + c] for c in tk)
        last_tk = tuple(r["last_" + c] for c in tk)
        block_id = first_tk + tuple(r["key_" + c] for c in sk + [SEQ_COL])
        continues = first_tk == carry_tk
        if continues:
            fixups[block_id] = carry_cnt
        if continues and first_tk == last_tk:
            carry_cnt += r["last_run_len"]   # single-tk block extends it
        else:
            carry_cnt = r["last_run_len"]
        carry_tk = last_tk
    fix_ref = ray.put(fixups)

    def label(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            out = b.select(tk + vals)
            out = out.append_column(TYPE_COL, pa.array([], type=pa.int8()))
            return out.append_column(UPD_SEQ_COL,
                                     pa.array([], type=pa.int64()))
        import ray as _ray
        fx = _ray.get(fix_ref)
        n = len(b)
        new = _tk_run_bounds(b, tk)
        block_id = tuple(b.column(c)[0].as_py() for c in tk) \
            + tuple(b.column(c)[0].as_py() for c in sk + [SEQ_COL])
        carry = fx.get(block_id)
        run_id = np.cumsum(new) - 1
        run_start = np.flatnonzero(new)
        pos = np.arange(n, dtype=np.int64) - run_start[run_id]
        group_first = new.copy()
        if carry is not None:
            group_first[0] = False
            pos[run_id == 0] += carry
        isnew = b.column(ISNEW_COL).to_numpy(
            zero_copy_only=False).astype(bool)
        types = np.where(group_first & isnew, ADD, UPDATE).astype(np.int8)
        out = b.select(tk + vals)
        out = out.append_column(TYPE_COL, pa.array(types))
        return out.append_column(UPD_SEQ_COL, pa.array(pos))

    return flagged_sorted.map_batches(label, batch_size=None,
                                      batch_format="pyarrow")


def _sorted_by_target_order(tks: set, descending: list,
                            spec: "StageSpec | None" = None) -> list:
    """Sort target-key tuples respecting per-column descending flags
    (stable per-column passes, last column first).  With a ``spec``
    carrying ``derived_sort_key``, the derived columns order FIRST —
    surrogate ids allocate in comparer order, matching the content
    ordering (reference allocates in its TargetKeyComparer order)."""
    if spec is not None and spec.derived_sort_key is not None:
        tk = spec.target_key
        schema = pa.schema([spec.out_schema.field(c) for c in tk])
        base = list(tks)
        tbl = pa.table({c: pa.array([t[i] for t in base],
                                    type=schema.field(c).type)
                        for i, c in enumerate(tk)})
        tbl = tbl.append_column("_i", pa.array(np.arange(len(base))))
        tbl = _append_derived(spec, tbl)
        dnames = _derived_names(spec)
        keys = [(n, "descending" if d else "ascending")
                for n, d in zip(dnames, _derived_desc(spec, len(dnames)))]
        keys += [(c, "descending" if d else "ascending")
                 for c, d in zip(tk, spec.target_sort_desc())]
        order = tbl.sort_by(keys).column("_i").to_pylist()
        return [base[i] for i in order]
    out = list(tks)
    for col in range(len(descending) - 1, -1, -1):
        out.sort(key=lambda t: t[col], reverse=descending[col])
    return out


# Derived-sort-column prefix — the Ray-native form of the reference's
# arbitrary ``IComparer`` orderings (Util/Comparers.cs:11-39): the
# comparator becomes a vectorized derivation whose columns sort AHEAD
# of the raw target-key columns and are stripped before persist.
DK_PREFIX = "_dk_"


def _derived_names(spec) -> list:
    """Column names the derivation produces (probed on an empty key
    table — the derivation must handle empty input)."""
    empty = pa.schema([spec.out_schema.field(c)
                       for c in spec.target_key]).empty_table()
    return [DK_PREFIX + c
            for c in spec.derived_sort_key(empty).column_names]


def _derived_desc(spec, n: int) -> list:
    return list(spec.derived_descending or [False] * n)


def _append_derived(spec, b: pa.Table) -> pa.Table:
    dk = spec.derived_sort_key(b.select(spec.target_key))
    for i, c in enumerate(dk.column_names):
        b = b.append_column(DK_PREFIX + c, dk.column(i))
    return b


def target_order_sort(spec, ds, pre=(), post=(), post_desc=None):
    """Sort ``ds`` by ``pre + <target order> + post`` where
    ``<target order>`` is the derived sort columns (when the spec has a
    ``derived_sort_key``) followed by the raw target-key columns as the
    tie-break.  Derived columns are computed per batch, carried through
    the sort, and stripped after — callers never see them.  ``pre`` /
    ``post`` sort ascending unless ``post_desc`` overrides."""
    from ..stages.exchange import storage_sort

    tk = spec.target_key
    pre, post = list(pre), list(post)
    post_desc = list(post_desc) if post_desc is not None \
        else [False] * len(post)
    if spec.derived_sort_key is None:
        return storage_sort(ds, pre + tk + post,
                            descending=[False] * len(pre)
                            + spec.target_sort_desc() + post_desc)
    dnames = _derived_names(spec)
    ddesc = _derived_desc(spec, len(dnames))
    with_dk = ds.map_batches(lambda b: _append_derived(spec, b),
                             batch_format="pyarrow")
    out = storage_sort(with_dk, pre + dnames + tk + post,
                       descending=[False] * len(pre) + ddesc
                       + spec.target_sort_desc() + post_desc)
    return out.map_batches(lambda b: b.drop_columns(dnames),
                           batch_format="pyarrow")


# Past this many delta rows the preserve/merge machinery stops
# collecting key sets on the driver and switches to the distributed
# join formulation (the broadcast→join switch functions/graph.py uses
# is the in-repo precedent).  Below it, delta-sized driver sets are
# both cheaper and deterministic-trivial.
PRESERVE_JOIN_THRESHOLD = 200_000

# a produce_grouped delta under this fits one block — skip the keyed
# exchange (Ray's keyed repartition costs ~1-2 s of fixed setup that
# dominates toy-scale waves; at real delta sizes the exchange engages)
TINY_GROUPED_BYTES = 16 * 1024 * 1024

EX_PREFIX = "_ex_"          # example-value columns joined onto adds
EX_MARKER = "_ex__has"      # true where the target key had a previous
                            # example (the reference's non-null case)


def _exchange_partitions(*datasets) -> int:
    """Partition count for the engine's distributed joins/exchanges,
    scaled to data volume (~256 MiB per partition) like
    queries._join_partitions: Ray's join aggregator crashes when a
    partition receives ZERO rows on one side (schema-less empty table),
    so the count must stay well under the key cardinality — a non-issue
    at real scale where every partition holds millions of keys."""
    total = sum((ds.size_bytes() or 0) for ds in datasets
                if ds is not None)
    return max(2, min(NUM_JOIN_PARTITIONS,
                      int(np.ceil(total / (256 << 20)))))


def _empty_joined(left, right, how: str, on: tuple, right_on):
    """Empty result with the JOINED schema (left columns + right
    non-key columns — Ray's join column convention), so a downstream
    select()/column() on an empty join behaves like a real one."""
    import ray.data as rd

    lt = pa.Table.from_pylist([], schema=left.schema().base_schema)
    if how in ("left_semi", "left_anti"):
        return rd.from_arrow(lt)
    rt = pa.Table.from_pylist([], schema=right.schema().base_schema)
    joined = lt.join(rt, keys=list(on),
                     right_keys=list(right_on or on),
                     join_type=how.replace("_", " "))
    return rd.from_arrow(joined)


def _broadcast_join(left, right_tbl: pa.Table, how: str, on: tuple,
                    right_on=None):
    """Join a streaming ``left`` against a SMALL materialized right
    table without any exchange: the right table is ``ray.put`` once and
    each map task joins its batch against it with pyarrow (identical
    column convention to Ray's hash join: left columns + right non-key
    columns).  Row-local semantics (inner/left_*) make the per-batch
    join exact."""
    import ray

    ref = ray.put(right_tbl)
    keys, rkeys = list(on), list(right_on or on)
    jt = how.replace("_", " ")

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray
        rt = getattr(fn, "_rt", None)
        if rt is None:
            rt = fn._rt = _ray.get(ref)
        return batch.join(rt, keys=keys, right_keys=rkeys, join_type=jt)

    return left.map_batches(fn, batch_format="pyarrow")


def _safe_join(left, right, how: str, on: tuple, right_on=None,
               parts: int = 2, small_rows: int = 10_000):
    """Ray's hash join materializes each partition side from received
    shards only — a partition with ZERO rows on one side becomes a
    schema-less empty table and pyarrow's join raises ("No match ...
    for key field reference").  Resolution ladder:

    1. an entirely empty side → resolved by join semantics without any
       exchange (result built with the joined schema);
    2. a SMALL right side (< ``small_rows``) → broadcast per-batch
       pyarrow join, zero exchange — the big left side streams and is
       never funneled through one aggregator (a wave with millions of
       add rows but few distinct keys is the NORMAL regime here);
    3. a small LEFT side with a big right → broadcast-semi-filter the
       right down to left's keys first, then a one-partition join of
       two small sides;
    4. otherwise → Ray hash join over ``parts`` partitions.

    ``left``/``right`` should be cheap to count (metadata reads or
    materialized key tables)."""
    lc, rc = left.count(), right.count()
    if rc == 0:
        if how == "left_anti":
            return left
        if how == "left_semi":
            return left.limit(0)
        if how == "inner":
            return _empty_joined(left, right, how, on, right_on)
        if how == "left_outer":
            return _broadcast_join(
                left, pa.Table.from_pylist(
                    [], schema=right.schema().base_schema),
                how, on, right_on)
        raise ValueError(f"empty right side unsupported for {how}; "
                         "resolve at the call site")
    if lc == 0:
        if how in ("left_semi", "left_anti"):
            return left
        if how in ("inner", "left_outer"):
            return _empty_joined(left, right, how, on, right_on)
    if rc < small_rows and how in ("inner", "left_outer", "left_semi",
                                   "left_anti"):
        right_tbl = pa.concat_tables(
            list(right.iter_batches(batch_format="pyarrow")),
            promote_options="default")
        return _broadcast_join(left, right_tbl, how, on, right_on)
    if lc < small_rows:
        # shrink the big right side to left's keys first (broadcast
        # semi filter, zero exchange — right rows that can't match
        # never cross the wire), then resolve the residual join by
        # size: the filtered right is bounded by actual matches, which
        # is a lower bound on the join output itself
        keys = _collect_tuples(left.select_columns(list(on)), list(on))
        rkeys = list(right_on or on)
        right = right.map_batches(
            _broadcast_filter([(rkeys, keys, True)]),
            batch_format="pyarrow").materialize()
        fc = right.count()
        if fc == 0:
            if how == "left_anti":
                return left
            if how in ("left_semi", "inner"):
                return left.limit(0)
            return _broadcast_join(
                left, pa.Table.from_pylist(
                    [], schema=right.schema().base_schema),
                how, on, right_on)
        if fc < small_rows:
            right_tbl = pa.concat_tables(
                list(right.iter_batches(batch_format="pyarrow")),
                promote_options="default")
            return _broadcast_join(left, right_tbl, how, on, right_on)
        # residual join of a small left against its (match-bounded)
        # right rows — one partition, both sides provably non-empty
        return left.join(right, how, num_partitions=1, on=on,
                         right_on=right_on)
    return left.join(right, how, num_partitions=parts, on=on,
                     right_on=right_on)


def _keyed_exchange_materialize(ds, build):
    """Run ``build(ds)`` (which adds a keyed ``repartition``) and
    materialize it with HASH_SHUFFLE enabled on the lineage's captured
    DataContext, then RESTORE the previous strategy.  The context is
    shared by every dataset derived from the same root, so leaving
    HASH_SHUFFLE set leaks hash-based aggregation into later
    groupby/sort stages on that lineage — which deadlocks the
    streaming executor on small clusters (the CLAUDE.md quirk).
    Scoping the flip to this one materialize keeps the exchange keyed
    and the rest of the lineage on the default sort shuffle."""
    from ..pipelines.flagship import enable_hash_shuffle

    ctx = ds.context if hasattr(ds, "context") else None
    prev = ctx.shuffle_strategy if ctx is not None else None
    try:
        enable_hash_shuffle(ds)
        return build(ds).materialize()
    finally:
        if ctx is not None:
            ctx.shuffle_strategy = prev


def colocate_key_groups(ds, key_cols):
    """Co-locate complete key groups, one block per partition — the
    shared prelude of every vectorized per-group stage.  Single home
    of the policy (produce_adds' grouped path and pipeline's content
    ranking both call it): pin the input ONCE so the byte size can
    pick the strategy, tiny inputs skip straight to one block, larger
    ones pay ONE byte-sized keyed exchange.

    The materialize is UNCONDITIONAL: calling ``size_bytes()`` on a
    lazy transformed lineage makes Ray EXECUTE the transform just to
    measure it and then re-execute it downstream (the CLAUDE.md
    hazard) — it returns a number, not None, so a measure-then-
    maybe-pin order runs the producing stage twice.  For an already-
    materialized input the call is free."""
    ds = ds.materialize()
    nbytes = ds.size_bytes()
    if nbytes is not None and nbytes < TINY_GROUPED_BYTES:
        # a tiny delta fits one block: co-location is trivial and the
        # keyed exchange's fixed setup would dominate
        return ds.repartition(1)
    parts = _exchange_partitions(ds)
    return _keyed_exchange_materialize(
        ds, lambda d: d.repartition(parts, keys=key_cols))


def _distinct_key_ds(ds, cols: list, parts: int = NUM_JOIN_PARTITIONS):
    """Distinct tuples over ``cols`` as a MATERIALIZED Dataset: one
    keyed exchange + block-local Arrow group_by — never a driver-side
    set.  Materialized here because the keyed repartition needs the
    HASH_SHUFFLE strategy on THIS dataset's captured DataContext; a
    downstream join would plan with the other side's context and
    reject the repartition."""

    def uniq(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        return b.group_by(cols).aggregate([]).select(cols)

    d = ds.select_columns(cols).map_batches(uniq, batch_format="pyarrow")
    return _keyed_exchange_materialize(
        d, lambda x: x.repartition(parts, keys=cols).map_batches(
            uniq, batch_format="pyarrow", batch_size=None))


def _first_per_key(ds, tk: list, order_cols: list, keep: dict,
                   parts: int = NUM_JOIN_PARTITIONS):
    """One EXAMPLE row per target key — the first in ``order_cols``
    order, i.e. the reference's "example of a previous value"
    (ParquetProduction.cs:557; deterministic where the reference only
    promises *an* example).  One keyed exchange co-locates each key,
    then a block-local sort + run-bounds filter picks firsts — fully
    vectorized, no per-key Python.  ``keep`` maps source column name →
    output name."""
    src_cols = tk + list(keep)
    out_names = tk + [keep[c] for c in keep]

    def first_fn(b: pa.Table) -> pa.Table:
        b = b.select(src_cols + [c for c in order_cols
                                 if c not in src_cols])
        if len(b) == 0:
            return b.select(src_cols).rename_columns(out_names)
        b = b.sort_by([(c, "ascending") for c in tk + order_cols])
        mask = _tk_run_bounds(b, tk)
        return (b.filter(pa.array(mask)).select(src_cols)
                .rename_columns(out_names))

    # materialized for the same captured-DataContext reason as
    # _distinct_key_ds — the result feeds joins on foreign lineages
    return _keyed_exchange_materialize(
        ds, lambda x: x.repartition(parts, keys=tk).map_batches(
            first_fn, batch_format="pyarrow", batch_size=None))


def _example_ds(spec: StageSpec, adds, prev_content, keep: dict,
                small: bool, parts: int | None = None):
    """Previous-version example rows (tk + renamed kept columns +
    EX_MARKER) for every target key that ``adds`` touches and that
    existed before.  ``small`` pre-filters with the broadcast key set;
    otherwise a left_semi join keeps everything distributed."""
    if parts is None:
        parts = _exchange_partitions(adds, prev_content)
    if small:
        add_tks = _collect_tuples(adds, spec.target_key)
        touched = prev_content.map_batches(
            _broadcast_filter([(spec.target_key, add_tks, True)]),
            batch_format="pyarrow")
    else:
        keys = _distinct_key_ds(adds, spec.target_key, parts)
        touched = _safe_join(prev_content, keys, "left_semi",
                             tuple(spec.target_key), parts=parts)
    ex = _first_per_key(touched, spec.target_key,
                        spec.stored_sk + [SEQ_COL], keep, parts)

    def mark(b: pa.Table) -> pa.Table:
        return b.append_column(EX_MARKER, pa.array(
            np.ones(len(b), dtype=bool)))

    return ex.map_batches(mark, batch_format="pyarrow")


def _apply_key_value_preserver(spec: StageSpec, adds, prev_content,
                               threshold: int | None = None,
                               parts: int | None = None):
    """The GENERAL ``PreserveKeyValues`` hook (F9,
    ParquetProducerOptions.cs:16-28; model.KeyValuePreserver): join one
    example previous row per touched target key onto the add rows, call
    the user's batch-level hook with row-aligned (new_rows, examples),
    and store whatever value columns it returns."""
    if threshold is None:
        threshold = PRESERVE_JOIN_THRESHOLD
    tk, vals = spec.target_key, spec.value_columns
    hook = spec.preserver.preserve
    n = adds.count()
    if n == 0:
        return adds
    if parts is None:
        parts = _exchange_partitions(adds, prev_content)
    keep = {c: EX_PREFIX + c for c in vals}

    def null_ex(b: pa.Table) -> pa.Table:
        for c in vals:
            b = b.append_column(
                keep[c], pa.nulls(len(b), spec.out_schema.field(c).type))
        return b.append_column(EX_MARKER, pa.array(
            np.zeros(len(b), dtype=bool)))

    ex = None if prev_content is None else _example_ds(
        spec, adds, prev_content, keep,
        small=n <= threshold, parts=parts).materialize()
    if ex is None or ex.count() == 0:
        # no previous examples at all — every hook call sees null
        with_ex = adds.map_batches(null_ex, batch_format="pyarrow")
    else:
        with_ex = _safe_join(adds, ex, "left_outer", tuple(tk),
                             parts=parts)

    content_schema = spec.content_schema()
    content_cols = content_schema.names

    def call_hook(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return content_schema.empty_table()
        import pyarrow.compute as pc
        new_rows = b.select(tk + vals)
        has = pc.fill_null(b.column(EX_MARKER), False)
        examples = pa.table(
            {c: b.column(keep[c]) for c in vals}
            | {EX_MARKER: has})
        out_vals = hook(new_rows, examples)
        for c in vals:
            b = b.set_column(b.column_names.index(c), c,
                             out_vals.column(c))
        return b.select(content_cols).cast(content_schema)

    return with_ex.map_batches(call_hook,
                               batch_format="pyarrow").materialize()


def _assign_surrogate_ids(spec: StageSpec, adds, prev_content,
                          threshold: int | None = None):
    """F9/U12 (`PreserveKeyValues`, ParquetProducerOptions.cs:16-28;
    goldens Tests:558-672): every add row's id column is copied from the
    previous version's content with the same target key, else allocated
    `next_id++` in target-key order (all same-tk rows share one id); a
    key deleted and later re-added gets a fresh id.

    Deltas up to ``threshold`` rows use the broadcast-filter + driver
    dict path; larger waves (and 10^12-row preserver bootstraps) switch
    to the distributed formulation: semi-join for examples, sort +
    per-block prefix-sum for new-id allocation — the driver holds one
    integer per block, never a key set."""
    if adds.count() > (PRESERVE_JOIN_THRESHOLD if threshold is None
                       else threshold):
        return _assign_surrogate_ids_join(spec, adds, prev_content)
    tk = spec.target_key
    idc = spec.preserver.id_column
    add_tks = _collect_tuples(adds, tk)
    if not add_tks:
        return adds
    prev_ids: dict = {}
    if prev_content is not None:
        filtered = prev_content.map_batches(
            _broadcast_filter([(tk, add_tks, True)]),
            batch_format="pyarrow").select_columns(tk + [idc])
        for batch in filtered.iter_batches(batch_format="pyarrow"):
            for *t, i in zip(*(batch.column(c).to_pylist()
                               for c in tk + [idc])):
                prev_ids.setdefault(tuple(t), i)
    new_tks = _sorted_by_target_order(add_tks - prev_ids.keys(),
                                      spec.target_sort_desc(), spec)
    for t in new_tks:
        prev_ids[t] = spec.preserver.next_id
        spec.preserver.next_id += 1
    id_type = spec.out_schema.field(idc).type

    def set_ids(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        tups = zip(*(batch.column(c).to_pylist() for c in tk))
        ids = pa.array([prev_ids[t] for t in tups], type=id_type)
        return batch.set_column(batch.column_names.index(idc), idc, ids)

    return adds.map_batches(set_ids, batch_format="pyarrow").materialize()


def _assign_surrogate_ids_join(spec: StageSpec, adds, prev_content,
                               parts: int | None = None):
    """Distributed surrogate-id assignment for waves past the driver
    threshold: example ids via semi-join + first-per-key, NEW ids via
    the textbook prefix-sum allocation — distinct new keys are sorted
    in target order, each sorted block's id range is
    ``next_id + exclusive_prefix(block_row_counts)``, so ids are
    identical to the sequential driver allocation while the driver
    holds P integers."""
    import ray
    import ray.data

    tk = spec.target_key
    idc = spec.preserver.id_column
    id_type = spec.out_schema.field(idc).type
    ex_id = EX_PREFIX + idc
    if parts is None:
        parts = _exchange_partitions(adds, prev_content)

    keys = _distinct_key_ds(adds, tk, parts)
    if prev_content is not None:
        ex = _example_ds(spec, adds, prev_content, {idc: ex_id},
                         small=False, parts=parts).materialize()
        prev_ids = ex.select_columns(tk + [ex_id]).rename_columns(
            tk + [idc])
        new_keys = _safe_join(keys, ex.select_columns(tk).materialize(),
                              "left_anti", tuple(tk), parts=parts)
    else:
        prev_ids = None
        new_keys = keys

    if spec.derived_sort_key is not None:
        dnames = _derived_names(spec)
        sorted_keys = (new_keys
                       .map_batches(lambda b: _append_derived(spec, b),
                                    batch_format="pyarrow")
                       .sort(dnames + tk,
                             descending=_derived_desc(spec, len(dnames))
                             + spec.target_sort_desc())
                       .map_batches(lambda b: b.drop_columns(dnames),
                                    batch_format="pyarrow")
                       .materialize())
    else:
        sorted_keys = new_keys.sort(
            tk, descending=spec.target_sort_desc()).materialize()
    block_refs = sorted_keys.to_arrow_refs()   # in sorted order

    @ray.remote
    def _count(t: pa.Table) -> int:
        return len(t)

    key_schema = pa.schema([spec.out_schema.field(c) for c in tk]
                           + [pa.field(idc, id_type)])

    @ray.remote
    def _make_ids(t: pa.Table, base: int):
        if len(t) == 0:     # empty sort blocks carry an empty schema
            return key_schema.empty_table()
        ids = pa.array(np.arange(base, base + len(t)), type=id_type)
        return t.select(tk).append_column(idc, ids)

    counts = ray.get([_count.remote(r) for r in block_refs])
    if block_refs:
        bases = np.concatenate(([0], np.cumsum(counts)[:-1])) \
            + spec.preserver.next_id
        id_refs = [_make_ids.remote(r, int(b))
                   for r, b in zip(block_refs, bases)]
        spec.preserver.next_id += int(sum(counts))
        new_ids = ray.data.from_arrow_refs(id_refs)
    else:
        new_ids = ray.data.from_arrow(pa.schema(
            [spec.out_schema.field(c) for c in tk]
            + [pa.field(idc, id_type)]).empty_table())
    all_ids = new_ids.union(prev_ids) if prev_ids is not None else new_ids

    content_schema = spec.content_schema()
    content_cols = content_schema.names
    joined = _safe_join(adds.drop_columns([idc]),
                        all_ids.materialize(), "inner", tuple(tk),
                        parts=parts)
    return joined.map_batches(
        lambda b: b.select(content_cols).cast(content_schema),
        batch_format="pyarrow").materialize()


def _apply_preserver(spec: StageSpec, adds, prev_content):
    """Dispatch F9: engine-allocated surrogate ids vs the general
    user value-copy hook."""
    from .model import KeyValuePreserver

    if isinstance(spec.preserver, KeyValuePreserver):
        return _apply_key_value_preserver(spec, adds, prev_content)
    return _assign_surrogate_ids(spec, adds, prev_content)


def apply_updates(spec: StageSpec, source_updates, prev_content=None,
                  prev_mappings=None, num_partitions: int = NUM_JOIN_PARTITIONS,
                  emit_feed: bool = True):
    """One incremental version step (reference ``ParquetProduction.Update``,
    :52-91).  Returns (content, key_mappings, update_feed) Datasets:
    content sorted (tk, sk, _seq), mappings sorted (sk, tk, _seq), feed
    sorted (tk, sk) with exact Add/Update/Delete labels.

    ``emit_feed=False`` skips feed labeling and returns an empty feed —
    the documented 10^12-row bootstrap path, where labeling every first
    row "Add" costs a second full-data sort that downstream consumers
    don't need (they read the content table directly).  Incremental
    steps keep feeds on: those are delta-sized and cheap."""
    import ray.data

    tk, vals = spec.target_key, spec.value_columns
    sk = spec.stored_sk                 # as stored in content/mappings
    raw_sk = spec.source_key            # as named in the update stream

    # Delta production (F1+F3): delta-sized, materialized once so the
    # grouped produce never re-executes.
    adds = produce_adds(spec, source_updates).materialize()
    if spec.preserver is not None:
        adds = _apply_preserver(spec, adds, prev_content)

    if prev_content is None or prev_mappings is None:
        # Bootstrap: everything is the delta, every target key is new.
        # No driver-side key sets here — at 10^12-row initial loads the
        # delta IS the dataset and must stay distributed.
        if spec.produce_rows is not None:
            # the per-key/grouped paths enforce the no-mixed-Delete
            # rule in-group (reference ParquetProduction.cs:326-337);
            # the row-wise path filters deletes before produce, so a
            # bootstrap wave mixing Delete+upserts on one key would
            # otherwise succeed SILENTLY here while raising on every
            # other path.  DELIBERATELY STRICTER THAN THE REFERENCE:
            # ParquetProduction.cs:320-337 raises only when a Delete
            # is FOLLOWED by more updates for the same key —
            # upserts-then-Delete is legal there and nets out to a
            # delete.  This engine rejects ANY key carrying both,
            # regardless of _upd_seq order, because the row-wise path
            # drops deletes before produce: honouring the legal
            # ordering would require last-writer-wins resolution here,
            # and silently PRODUCING a key the reference would DELETE
            # is the failure mode this check exists to prevent.  The
            # policy is pinned (in the reference-legal upserts-then-
            # Delete order) by tests/test_engine_produce.py::
            # test_rowwise_mixed_delete_upsert_raises and
            # ::test_produce_rows_bootstrap_rejects_mixed_delete;
            # batches with a legal upserts-then-Delete must be split
            # into two waves (upserts, then the delete) by the caller.
            # Deletes in a bootstrap are rare: pay one
            # streaming count, and only when nonzero collect the
            # (delete-sized) key set for the membership probe.
            dels = source_updates.filter(expr=f"{TYPE_COL} == {DELETE}")
            if dels.count():
                del_sks = _collect_tuples(dels, raw_sk)
                mixed_rows = (source_updates
                              .filter(expr=f"{TYPE_COL} != {DELETE}")
                              .map_batches(
                                  _broadcast_filter(
                                      [(raw_sk, del_sks, True)]),
                                  batch_format="pyarrow"))
                sample = mixed_rows.limit(5)
                if sample.count():
                    mixed = sorted(_collect_tuples(sample, raw_sk))
                    raise ValueError(
                        f"stage {spec.name}: keys carry both Delete "
                        f"and upserts in one batch (reference "
                        f"ParquetProduction.cs:326-337 rule): {mixed}")
        if adds.count() == 0:
            return (ray.data.from_arrow(spec.content_schema().empty_table()),
                    ray.data.from_arrow(spec.mapping_schema().empty_table()),
                    ray.data.from_arrow(spec.feed_schema().empty_table()))
        new_content = adds
        mappings = adds.select_columns(sk + tk + [SEQ_COL])
        after = adds
        new_tk_set = None               # all target keys are new
        dead_tks: set = set()
    else:
        # Delta expansion (F3): prior pairs of every updated source key
        # are invalidated; new pairs come from the produce output.
        add_pairs = _collect_tuples(adds, sk + tk)
        if spec.produce_rows is not None:
            # the per-key path enforces this in-group; the vectorized
            # path checks it on the (delta-sized) key sets — order-
            # blind on purpose, same stricter-than-reference policy
            # as the bootstrap check above (see that comment)
            import pyarrow.compute as pc  # noqa: F401
            del_sks = _collect_tuples(
                source_updates.filter(expr=f"{TYPE_COL} == {DELETE}"),
                raw_sk)
            ups_sks = _collect_tuples(
                source_updates.filter(expr=f"{TYPE_COL} != {DELETE}"),
                raw_sk)
            mixed = del_sks & ups_sks
            if mixed:
                raise ValueError(
                    f"stage {spec.name}: keys carry both Delete and "
                    f"upserts in one batch (reference "
                    f"ParquetProduction.cs:326-337 rule): "
                    f"{sorted(mixed)[:5]}")
            updated_sks = del_sks | ups_sks
        else:
            updated_sks = _collect_tuples(source_updates, raw_sk)
        prior_pairs = _collect_tuples(
            prev_mappings.map_batches(
                _broadcast_filter([(sk, updated_sks, True)]),
                batch_format="pyarrow"),
            sk + tk)
        touched_pairs = prior_pairs | add_pairs
        if not touched_pairs:
            empty_feed = ray.data.from_arrow(spec.feed_schema().empty_table())
            return prev_content, prev_mappings, empty_feed
        touched_tk_set = {t[len(sk):] for t in touched_pairs}

        # Apply to state (F6/F7): prior state streams forward through a
        # broadcast filter — no shuffle of the big side.
        retained_content = prev_content.map_batches(
            _broadcast_filter([(sk + tk, touched_pairs, False)]),
            batch_format="pyarrow")
        retained_mappings = prev_mappings.map_batches(
            _broadcast_filter([(sk + tk, touched_pairs, False)]),
            batch_format="pyarrow")
        new_content = retained_content.union(adds)
        mappings = retained_mappings.union(
            adds.select_columns(sk + tk + [SEQ_COL]))

        # Update feed (F7/F8): the full new row set of every touched
        # target key — delta-sized, so materialize it once.
        touched_retained = prev_content.map_batches(
            _broadcast_filter([(sk + tk, touched_pairs, False),
                               (tk, touched_tk_set, True)]),
            batch_format="pyarrow")
        after = touched_retained.union(adds).materialize()

        before_tk_set = _collect_tuples(
            prev_mappings.map_batches(
                _broadcast_filter([(tk, touched_tk_set, True)]),
                batch_format="pyarrow"),
            tk)
        new_tk_set = touched_tk_set - before_tk_set
        live_tk_set = _collect_tuples(after, tk)
        dead_tks = touched_tk_set - live_tk_set

    # wide sorts run storage-backed (stages/exchange.py) via
    # target_order_sort: sample-sort over spill files instead of the
    # object-store all-to-all, with derived comparer columns computed,
    # carried, and stripped when the spec declares them
    mappings = target_order_sort(spec, mappings, pre=sk,
                                 post=[SEQ_COL])

    if new_tk_set is None and emit_feed:
        # BOOTSTRAP with feed: ``after`` IS the full dataset and the
        # feed's sort order equals the content's (tk, sk, _seq) — so
        # ONE full-data sort serves both outputs, instead of the
        # round-1 second full sort that made bootstrap-with-feed weak
        # at 10^12 rows.  Every target key is new, so every group's
        # first row labels Add.
        def flag_all(t: pa.Table) -> pa.Table:
            return t.append_column(
                ISNEW_COL, pa.array(np.ones(len(t), np.int8)))

        sorted_flagged = target_order_sort(
            spec, new_content.map_batches(flag_all,
                                          batch_format="pyarrow"),
            post=sk + [SEQ_COL]).materialize()
        content_cols = spec.content_schema().names
        new_content = sorted_flagged.map_batches(
            lambda t: t.select(content_cols), batch_format="pyarrow")
        feed = label_feed_sorted(spec, sorted_flagged)
        return new_content, mappings, feed

    new_content = target_order_sort(spec, new_content,
                                    post=sk + [SEQ_COL])

    if not emit_feed:
        import ray.data
        return (new_content, mappings,
                ray.data.from_arrow(spec.feed_schema().empty_table()))

    # incremental path: only brand-new target keys flag Add
    flag_sets = [(tk, new_tk_set, None)]

    def flag(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(ISNEW_COL,
                                   pa.array([], type=pa.int8()))
        m = _membership_mask(t, tk, flag_sets[0][1])
        return t.append_column(ISNEW_COL,
                               pa.array(m.astype(np.int8)))

    flagged = after.map_batches(flag, batch_format="pyarrow")
    sorted_flagged = target_order_sort(
        spec, flagged, post=sk + [SEQ_COL]).materialize()
    feed = label_feed_sorted(spec, sorted_flagged)

    if dead_tks:
        # Suppressed-delete semantics (F8): a touched target key with no
        # remaining rows emits exactly one Delete with null values.
        n = len(dead_tks)
        cols = {}
        tk_schema = pa.schema([spec.out_schema.field(c) for c in tk])
        for i, c in enumerate(tk):
            cols[c] = pa.array([t[i] for t in sorted(dead_tks)],
                               type=tk_schema.field(c).type)
        for c in vals:
            cols[c] = pa.nulls(n, spec.out_schema.field(c).type)
        cols[TYPE_COL] = pa.array(np.full(n, DELETE, np.int8))
        cols[UPD_SEQ_COL] = pa.array(np.zeros(n, np.int64))
        deletes = pa.table(cols).select(tk + vals
                                        + [TYPE_COL, UPD_SEQ_COL])
        # the labeled stream is already sorted; merging the (delta-sized)
        # deletes needs one small re-sort
        feed = target_order_sort(
            spec, feed.union(ray.data.from_arrow(deletes)),
            post=[UPD_SEQ_COL])
    return new_content, mappings, feed
