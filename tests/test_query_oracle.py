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
    "media_jpeg_color", "media_jpeg_progressive", "media_png_color",
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


def test_cents_three_decimal_ties(ray_session, tmp_path):
    """The CENTS PATTERN's latent-risk closer (queries.py module
    docstring): on >=3-decimal data, x*100 lands exactly on .5 for
    many rows, where pyarrow round() (half-to-even) and DuckDB
    round() (half-away-from-zero) DISAGREE.  Both sides now compute
    floor(x*100 + 0.5), so a query over a 3-decimal corpus must stay
    EXACTLY hash-identical to its oracle.  The fixture is built to
    contain genuine double-precision ties (asserted below) plus
    negative values, and u6_partial_avg runs unmodified over it."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_producers_ray.pipelines.queries import (SQL_U6, _cents,
                                                         q_u6_partial_avg)

    # 3-decimal money values; include known exact ties (0.005*100 is
    # exactly 0.5 in float64) and negatives
    vals = np.concatenate([
        np.round(np.arange(-400, 400) * 0.005, 3),      # *.005 steps
        np.arange(2000) * 0.001,                        # 3-decimal sweep
        [2.675, -2.675, 0.005, -0.005, 1.015, -1.015],
    ])
    scaled = vals * 100.0
    frac = scaled - np.floor(scaled)
    n_ties = int((frac == 0.5).sum())
    assert n_ties >= 100, f"fixture must carry real ties, got {n_ties}"
    # ...and on those ties the two round() tie modes genuinely differ,
    # i.e. this fixture would have flipped the OLD pattern red:
    ties = scaled[frac == 0.5]
    half_even = np.asarray(pc.round(pa.array(ties)))
    half_away = np.sign(ties) * np.floor(np.abs(ties) + 0.5)
    assert (half_even != half_away).any()

    prios = np.array(["A", "B", "C"])[np.arange(len(vals)) % 3]
    t = pa.table({"o_orderpriority": pa.array(prios),
                  "o_totalprice": pa.array(vals)})
    pq.write_table(t, tmp_path / "orders.parquet")

    got = _canon(q_u6_partial_avg(str(tmp_path)).to_pandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")
    want = _canon(con.execute(SQL_U6).fetchdf())
    # exact — the whole point is bit-identical agreement on ties
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)

    # the helper itself mirrors DuckDB floor() for every fixture value
    eng = np.asarray(_cents(pa.array(vals)))
    sql = con.execute(
        "SELECT floor(o_totalprice * 100 + 0.5) AS c FROM orders"
    ).fetchnumpy()["c"]
    assert (eng == sql).all()
