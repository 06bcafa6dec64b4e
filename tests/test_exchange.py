"""storage_sort (stages/exchange.py): storage-backed sample sort.

Covers the fast range path (asc/desc, multi-column ties), the
documented fallbacks (nulls in the routing column, too few distinct
leading values), and empty input.  Global order is asserted against
Arrow's own sort_by on the collected table.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from parquet_producers_ray.stages import exchange
from parquet_producers_ray.stages.exchange import storage_sort


@pytest.fixture(autouse=True)
def _force_storage_path(monkeypatch):
    # test inputs are far below the production small-sort cutoff;
    # drop it so the range/spill path (the thing under test) runs
    monkeypatch.setattr(exchange, "SMALL_SORT_BYTES", 0)


def _collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if not batches:
        return None
    return pa.concat_tables(batches)


def _expect(t: pa.Table, cols, desc) -> pa.Table:
    return t.sort_by([(c, "descending" if d else "ascending")
                      for c, d in zip(cols, desc)])


def _mk(n=60_000, seed=3) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, 5_000, n)),
        "s": pa.array([f"u{v:05d}" for v in rng.integers(0, 20_000, n)]),
        "seq": pa.array(np.arange(n)),
    })


def test_storage_sort_global_order_int_leading(ray_session):
    t = _mk()
    ds = ray.data.from_arrow(t).repartition(8)
    cols, desc = ["k", "s", "seq"], [False, False, False]
    got = _collect(storage_sort(ds, cols, descending=desc))
    exp = _expect(t, cols, desc)
    assert got.num_rows == exp.num_rows
    for c in cols:
        assert got.column(c).to_pylist() == exp.column(c).to_pylist()


def test_storage_sort_string_leading_descending_tiebreak(ray_session):
    t = _mk(seed=11)
    ds = ray.data.from_arrow(t).repartition(8)
    cols, desc = ["s", "k", "seq"], [False, True, False]
    got = _collect(storage_sort(ds, cols, descending=desc))
    exp = _expect(t, cols, desc)
    for c in cols:
        assert got.column(c).to_pylist() == exp.column(c).to_pylist()


def test_storage_sort_descending_leading(ray_session):
    t = _mk(seed=19)
    ds = ray.data.from_arrow(t).repartition(8)
    cols, desc = ["k", "seq"], [True, False]
    got = _collect(storage_sort(ds, cols, descending=desc))
    exp = _expect(t, cols, desc)
    for c in cols:
        assert got.column(c).to_pylist() == exp.column(c).to_pylist()


def test_storage_sort_fallback_nulls(ray_session):
    t = pa.table({"k": pa.array([None, 3, 1, 2], pa.int64()),
                  "v": pa.array([0, 1, 2, 3])})
    got = _collect(storage_sort(ray.data.from_arrow(t), ["k"]))
    # Ray's sort places nulls last by default
    assert got.column("k").to_pylist()[:3] == [1, 2, 3]


def test_storage_sort_fallback_few_distinct(ray_session):
    t = pa.table({"k": pa.array([1, 2] * 5_000),
                  "v": pa.array(range(10_000))})
    got = _collect(storage_sort(
        ray.data.from_arrow(t).repartition(4), ["k", "v"]))
    assert got.column("k").to_pylist() == sorted([1, 2] * 5_000)
    assert got.column("v").to_pylist()[:3] == [0, 2, 4]


def test_storage_sort_empty(ray_session):
    t = pa.table({"k": pa.array([], pa.int64())})
    out = storage_sort(ray.data.from_arrow(t), ["k"])
    assert out.count() == 0
