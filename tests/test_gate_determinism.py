"""Driver-gate determinism audit (round-2 verdict task #8): run every
float-bearing in-window query TWICE under different block splits and
assert byte-identical canonical output.

This is the regression net for the `u10_join` round-2 failure class:
float64 aggregation whose low-order bits depend on Ray's block/partial
summation order.  Every query here was rewritten to aggregate exact
integers (cents) or to mirror DuckDB's float expression op-for-op, so
its canonical value hash must be invariant to how the input is split
into blocks.  Shrinking ``DataContext.target_max_block_size`` forces a
different read split AND different map_batches boundaries, i.e. a
different partial-aggregation tree.
"""

import hashlib

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

# queries whose output carries float64 derived from aggregation (the
# flakiness class); int-only queries cannot flake.  Includes the
# out-of-window entries the round-3 cents rewrite modified AFTER their
# last driver row (u6_partial_avg, broadcast_join, salted_join,
# join3_topk, windowed_agg, sliding_window) so pytest pins them even
# though the driver gate no longer sees them.
FLOAT_QUERIES = [
    "u10_join", "window_cumsum", "left_join", "full_outer_join",
    "stats_agg", "time_bucket", "zscore", "moving_avg", "bloom_join",
    "mad", "percentile_cont", "engine_join_view",
    "u6_partial_avg", "broadcast_join", "salted_join", "join3_topk",
    "windowed_agg", "sliding_window",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.decode("utf-8", "replace")
                if isinstance(v, (bytes, bytearray)) else v)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            h.update(col.to_numpy(dtype="float64").tobytes())
        elif pd.api.types.is_integer_dtype(col):
            h.update(col.to_numpy(dtype="int64").tobytes())
        else:
            h.update(repr(col.tolist()).encode())
    return h.hexdigest()


def _run(name: str, block_size: int | None) -> str:
    from ray.data import DataContext

    from parquet_producers_ray.pipelines.queries import REGISTRY

    ctx = DataContext.get_current()
    saved = ctx.target_max_block_size
    try:
        if block_size is not None:
            ctx.target_max_block_size = block_size
        res = REGISTRY[name][0](SF_DIR)
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        return _value_hash(_canon(df))
    finally:
        ctx.target_max_block_size = saved


@pytest.mark.parametrize("name", FLOAT_QUERIES)
def test_float_query_hash_invariant_to_block_split(ray_session, name):
    # default split vs many tiny blocks — different partial-sum trees
    assert _run(name, None) == _run(name, 64 * 1024)
