"""Model-based differential test of the incremental engine: random
multi-version update sequences applied both through `apply_updates` and
through an independent driver-side Python model; full content /
key-mapping / update-feed equality asserted after every version.

The transform fans out (one output row per value), migrates keys
(tk = value % 3) and collides target keys across source keys — the
shapes the reference goldens exercise, but over random sequences.
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_producers_ray.engine.model import (ADD, DELETE, TYPE_COL,
                                                UPDATE, StageSpec)
from parquet_producers_ray.engine.produce import (apply_updates,
                                                  updates_from_table)

SOURCE = pa.schema([pa.field("k", pa.int64()), pa.field("v", pa.int64())])
OUT = pa.schema([pa.field("tk", pa.int64()), pa.field("val", pa.string())])


def produce(key, values: pa.Table) -> pa.Table:
    vs = values.column("v").to_pylist()
    return pa.table({
        "tk": pa.array([v % 3 for v in vs], type=pa.int64()),
        "val": pa.array([f"{key[0]}:{v}" for v in vs]),
    })


SPEC = StageSpec(
    name="prop", produce=produce,
    source_key=["k"], target_key=["tk"],
    value_columns=["val"], source_value_columns=["v"],
    out_schema=OUT, source_schema=SOURCE)


# -- independent model -------------------------------------------------------

def model_rows(state: dict) -> list:
    """state {sk: [v,...]} → content rows (tk, sk, val, emission_idx)."""
    rows = []
    for sk, vs in state.items():
        for i, v in enumerate(vs):
            rows.append((v % 3, sk, f"{sk}:{v}", i))
    return rows


def model_apply(state: dict, batch: dict):
    """Returns (content, mappings, feed) exactly per the reference
    semantics, computed independently of the engine."""
    prev_rows = model_rows(state)
    prior_pairs = {(sk, tk) for tk, sk, _, _ in prev_rows
                   if sk in batch}
    before_tks = {tk for tk, _, _, _ in prev_rows}

    for sk, vs in batch.items():
        if vs is None:
            state.pop(sk, None)
        else:
            state[sk] = list(vs)

    new_rows = model_rows(state)
    add_pairs = {(sk, tk) for tk, sk, _, _ in new_rows if sk in batch}
    touched_tks = ({tk for _, tk in prior_pairs}
                   | {tk for _, tk in add_pairs})

    # content sorted (tk, sk, emission idx) — the engine's (tk, sk, _seq)
    content = sorted(new_rows, key=lambda r: (r[0], r[1], r[3]))
    mappings = sorted((sk, tk, i) for tk, sk, _, i in new_rows)

    feed = []
    for tk in sorted(touched_tks):
        rows = sorted((r for r in new_rows if r[0] == tk),
                      key=lambda r: (r[1], r[3]))
        if rows:
            for j, (tkv, sk, val, _) in enumerate(rows):
                typ = ADD if (j == 0 and tk not in before_tks) else UPDATE
                feed.append((typ, tkv, val))
        else:
            feed.append((DELETE, tk, None))
    return (content, [(a, b) for a, b, _ in mappings], feed)


# -- engine driver ------------------------------------------------------------

def engine_apply(prev, batch: dict):
    import ray.data
    rows = []
    for sk in sorted(batch):
        vs = batch[sk]
        if vs is None:
            rows.append({"k": sk, "v": None, TYPE_COL: DELETE})
        else:
            for v in vs:
                rows.append({"k": sk, "v": v, TYPE_COL: UPDATE})
    tbl = pa.Table.from_pylist(
        rows, schema=pa.schema(list(SOURCE) + [pa.field(TYPE_COL,
                                                        pa.int8())]))
    prev_c = ray.data.from_arrow(prev[0]) if prev else None
    prev_m = ray.data.from_arrow(prev[1]) if prev else None
    c, m, f = apply_updates(SPEC, updates_from_table(tbl), prev_c, prev_m)

    def tbl_of(ds, fallback):
        sch = ds.schema()
        return pa.Table.from_pylist(
            ds.take_all(),
            schema=sch.base_schema if sch is not None else fallback)

    ct = tbl_of(c, SPEC.content_schema())
    mt = tbl_of(m, SPEC.mapping_schema())
    ft = tbl_of(f, SPEC.feed_schema())
    return ct, mt, ft


batches = st.dictionaries(
    st.integers(0, 4),
    st.one_of(st.none(), st.lists(st.integers(0, 8), min_size=1,
                                  max_size=3)),
    min_size=1, max_size=4)


@settings(max_examples=12, deadline=None)
@given(st.lists(batches, min_size=1, max_size=3))
def test_engine_matches_model(ray_session, seq):
    state: dict = {}
    prev = None
    for batch in seq:
        # reference rule: a key is delete XOR upsert per batch — the
        # strategy already guarantees that (dict keys are unique)
        want_content, want_mappings, want_feed = model_apply(state, batch)
        ct, mt, ft = engine_apply(prev, batch)
        got_content = [(r["tk"], r["_sk_k"], r["val"], 0)
                       for r in ct.to_pylist()]
        assert [(a, b, c) for a, b, c, _ in got_content] \
            == [(a, b, c) for a, b, c, _ in want_content]
        got_mappings = [(r["_sk_k"], r["tk"]) for r in mt.to_pylist()]
        assert got_mappings == want_mappings
        got_feed = [(r[TYPE_COL], r["tk"], r["val"])
                    for r in ft.to_pylist()]
        assert got_feed == want_feed
        prev = (ct, mt)
