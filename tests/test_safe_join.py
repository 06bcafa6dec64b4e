"""_safe_join resolution-ladder semantics (ADVICE r2: the old
min-side<10k clamp funneled the FULL prior table through one join
aggregator whenever the key side was small — the normal regime for
the engine's distributed preserve/read_sources paths).

Every (how, size-regime) cell must match pyarrow's reference join."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


def _sorted(tbl: pa.Table) -> list:
    cols = sorted(tbl.column_names)
    rows = [tuple(r[c] for c in cols) for r in tbl.select(cols).to_pylist()]
    return sorted(rows, key=lambda t: tuple(str(x) for x in t))


def _collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if not batches:
        return ds.schema().base_schema.empty_table()
    return pa.concat_tables(batches, promote_options="default")


LEFT = pa.table({"k": [1, 2, 2, 3, 5], "a": ["p", "q", "r", "s", "t"]})
RIGHT = pa.table({"rk": [2, 3, 3, 4], "b": [10.0, 20.0, 30.0, 40.0]})


@pytest.mark.parametrize("how", ["inner", "left_outer", "left_semi",
                                 "left_anti"])
@pytest.mark.parametrize("small_rows", [10_000, 1])
def test_safe_join_matches_pyarrow(ray_session, how, small_rows):
    """small_rows=10_000 exercises the broadcast paths (both sides
    'small'); small_rows=1 forces the plain hash-join path."""
    from parquet_producers_ray.engine.produce import _safe_join

    got = _collect(_safe_join(_ds(LEFT), _ds(RIGHT), how, ("k",),
                              right_on=("rk",), small_rows=small_rows))
    want = LEFT.join(RIGHT, keys=["k"], right_keys=["rk"],
                     join_type=how.replace("_", " "))
    assert _sorted(got) == _sorted(want)
    assert sorted(got.column_names) == sorted(want.column_names)


@pytest.mark.parametrize("how", ["inner", "left_outer", "left_semi",
                                 "left_anti"])
def test_safe_join_empty_right_schema(ray_session, how):
    from parquet_producers_ray.engine.produce import _safe_join

    empty_r = RIGHT.slice(0, 0)
    got = _collect(_safe_join(_ds(LEFT), _ds(empty_r), how, ("k",),
                              right_on=("rk",)))
    want = LEFT.join(empty_r, keys=["k"], right_keys=["rk"],
                     join_type=how.replace("_", " "))
    assert _sorted(got) == _sorted(want)
    # the joined schema must carry the right side's non-key columns
    # even when the result is empty (ADVICE r2 low #1)
    assert sorted(got.column_names) == sorted(want.column_names)


@pytest.mark.parametrize("how", ["inner", "left_outer", "left_semi",
                                 "left_anti"])
def test_safe_join_empty_left_schema(ray_session, how):
    from parquet_producers_ray.engine.produce import _safe_join

    empty_l = LEFT.slice(0, 0)
    got = _collect(_safe_join(_ds(empty_l), _ds(RIGHT), how, ("k",),
                              right_on=("rk",)))
    want = empty_l.join(RIGHT, keys=["k"], right_keys=["rk"],
                        join_type=how.replace("_", " "))
    assert len(got) == 0
    assert sorted(got.column_names) == sorted(want.column_names)


def test_safe_join_small_left_big_right(ray_session):
    """The lc<small, rc>=small branch: broadcast-semi shrink of the
    big right, then a match-bounded residual join."""
    from parquet_producers_ray.engine.produce import _safe_join

    rng = np.random.default_rng(5)
    big = pa.table({"rk": rng.integers(0, 50, 30_000),
                    "b": rng.standard_normal(30_000)})
    small = pa.table({"k": [3, 7, 99], "a": ["x", "y", "z"]})
    got = _collect(_safe_join(_ds(small), _ds(big), "inner", ("k",),
                              right_on=("rk",), small_rows=10))
    want = small.join(big, keys=["k"], right_keys=["rk"],
                      join_type="inner")
    assert len(got) == len(want)
    assert _sorted(got) == _sorted(want)
