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
    # test inputs are far below the production small-sort cutoffs;
    # drop BOTH so the range/spill path (the thing under test) runs —
    # zeroing only SMALL_SORT_BYTES let the later TINY_SORT_BYTES
    # shortcut swallow every test input and left the spill path
    # untested (which is how the spill-name collision bug survived)
    monkeypatch.setattr(exchange, "SMALL_SORT_BYTES", 0)
    monkeypatch.setattr(exchange, "TINY_SORT_BYTES", 0)


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


def test_storage_sort_identical_leading_blocks_lossless(ray_session):
    """Regression: spill names were content digests of the LEADING
    column only, so two blocks whose leading column was identical (a
    hot key filling several blocks, or bulk duplicate rows) wrote the
    same file name and os.replace silently dropped one block's rows.
    Names now carry the block ordinal.  Three blocks: two with an
    identical all-hot leading column (different payloads), one diverse
    tail to satisfy the distinct-values guard."""
    hot_a = pa.table({"k": pa.array([7] * 4000, pa.int64()),
                      "v": pa.array(range(4000), pa.int64())})
    hot_b = pa.table({"k": pa.array([7] * 4000, pa.int64()),
                      "v": pa.array(range(4000, 8000), pa.int64())})
    rng = np.random.default_rng(11)
    tail = pa.table({"k": pa.array(rng.integers(100, 10_000, 4000),
                                   pa.int64()),
                     "v": pa.array(range(8000, 12000), pa.int64())})
    ds = ray.data.from_arrow([hot_a, hot_b, tail])
    got = _collect(storage_sort(ds, ["k", "v"], num_partitions=4))
    exp = _expect(pa.concat_tables([hot_a, hot_b, tail]),
                  ["k", "v"], [False, False])
    assert got.num_rows == 12000
    assert got.column("k").to_pylist() == exp.column("k").to_pylist()
    assert got.column("v").to_pylist() == exp.column("v").to_pylist()


def test_storage_sort_duplicate_content_blocks_lossless(ray_session):
    """Even two ENTIRELY identical blocks (bulk duplicate rows — the
    dedup corpora shape) must both survive the spill."""
    dup = pa.table({"k": pa.array(list(range(2000)), pa.int64()),
                    "v": pa.array([1] * 2000, pa.int64())})
    ds = ray.data.from_arrow([dup, dup])
    got = _collect(storage_sort(ds, ["k", "v"], num_partitions=4))
    assert got.num_rows == 4000
    assert got.column("k").to_pylist() == sorted(list(range(2000)) * 2)


def test_storage_sort_uint64_highbit_falls_back(ray_session):
    """uint64 leading values >= 2^63 have no int64 coarsening: the
    sort must fall back to ds.sort, not crash in the sample pass."""
    t = pa.table({"k": pa.array([2**63 + 5, 3, 2**64 - 1, 17] * 500,
                                pa.uint64()),
                  "v": pa.array(range(2000), pa.int64())})
    got = _collect(storage_sort(ray.data.from_arrow(t), ["k"]))
    ks = got.column("k").to_pylist()
    assert ks == sorted(ks) and len(ks) == 2000
