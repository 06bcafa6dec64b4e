"""Pytest-side oracle parity for the session's newest registry entries:
run each Ray pipeline AND its DuckDB oracle SQL on sf0.001 and compare
row count + column names + values (order-insensitive, float-tolerant).
This mirrors the driver's correctness gate (tools/check_oracle.py) for
the operators added after the engine goldens were frozen.
"""

import duckdb
import pandas as pd
import pytest

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

NEW_QUERIES = [
    "window_cumsum", "sample_stratified", "pivot",
    "left_join", "full_outer_join", "rollup", "stats_agg",
    "intersect_keys", "except_keys", "histogram", "percentile_cont",
    "regex_extract", "arg_max", "time_bucket",
    "dedup_jaccard_capped", "cross_join",
    "unpivot", "tf_idf", "zscore", "redact", "decontaminate",
    "ntile", "mode", "pagerank",
    "cube", "window_lead", "moving_avg", "dense_rank",
    "host_agg", "url_normalize", "bloom_join",
    "curate", "model_score",
    "ngram_counts", "funnel", "retention", "percent_rank",
    "inverted_index", "mad", "co_occurrence",
    "entropy", "pack_sequences", "fuzzy_pairs", "embed_quantize",
    "salted_join", "row_number_global", "html_extract",
    "media_thumbnail", "embed_neardup_lsh", "dedup_substring",
    "audio_chunks", "video_frames_gif", "media_jpeg",
]


def test_scaled_parts_policy():
    """_scaled_parts: floor preserves toy-scale parallelism, the count
    grows with bytes past floor x 128 MiB, unsized lineages stay at
    the floor, and the cap bounds runaway inputs."""
    from parquet_producers_ray.pipelines.queries import _scaled_parts

    class FakeDs:
        def __init__(self, nbytes):
            self._n = nbytes

        def size_bytes(self):
            return self._n

    assert _scaled_parts(FakeDs(None), 16) == 16
    assert _scaled_parts(FakeDs(0), 16) == 16
    assert _scaled_parts(FakeDs(10 << 20), 16) == 16
    assert _scaled_parts(FakeDs(16 * (128 << 20)), 16) == 16
    assert _scaled_parts(FakeDs(100 * (128 << 20)), 16) == 100
    assert _scaled_parts(FakeDs(1 << 50), 16) == 4096


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_query_matches_oracle(ray_session, sf_dir, oracle_con, name):
    from parquet_producers_ray.pipelines.queries import REGISTRY

    fn, sql = REGISTRY[name]
    assert sql is not None, f"{name} must be oracle-checked"
    got = _canon(fn(sf_dir).to_pandas())
    want = _canon(oracle_con.execute(sql).fetchdf())
    assert len(got) == len(want), (len(got), len(want))
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-5)
