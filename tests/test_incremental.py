"""Tests for the range-partitioned incremental store: delta application
rewrites only touched partitions (rest hardlinked), results equal a
from-scratch recompute, CDC feed labels are exact."""

import os

import numpy as np
import pyarrow as pa
import pytest

from parquet_producers_ray.engine.model import (ADD, DELETE, TYPE_COL,
                                                UPD_SEQ_COL, UPDATE)
from parquet_producers_ray.engine.ranged import RangedTable
from parquet_producers_ray.pipelines.incremental import (IncrementalMirror,
                                                         updates_with_type,
                                                         webpage_mirror_spec)
from parquet_producers_ray.sources.webpages import generate_table


def _bootstrap(tmp_path, rows=4000, target_rows=500):
    import ray.data
    base = generate_table(rows)
    mirror = IncrementalMirror(str(tmp_path / "mirror"),
                               webpage_mirror_spec(),
                               target_rows=target_rows)
    ups = updates_with_type(base)
    ups = ups.append_column(UPD_SEQ_COL,
                            pa.array(np.arange(len(ups), dtype=np.int64)))
    mirror.bootstrap(ray.data.from_arrow(ups).repartition(8), 1)
    return base, mirror


def _content_rows(mirror, version):
    import pyarrow.parquet as pq
    files = mirror.content.files(version)
    t = pa.concat_tables([pq.read_table(f) for f in files])
    return t.sort_by([("url", "ascending")])


def test_bootstrap_matches_input(ray_session, tmp_path):
    base, mirror = _bootstrap(tmp_path)
    got = _content_rows(mirror, 1)
    want = base.sort_by([("url", "ascending")])
    assert got.column("url").equals(want.column("url"))
    assert got.column("text").equals(want.column("text"))
    m = mirror.content.manifest(1)
    assert len(m["partitions"]) > 1
    # partitions are disjoint and ordered
    parts = m["partitions"]
    for a, b in zip(parts, parts[1:]):
        assert tuple(a["max"]) < tuple(b["min"])


def test_feedless_bootstrap_matches_and_deltas_still_feed(
        ray_session, tmp_path):
    """emit_feed=False bootstrap: content/mappings identical to the
    feed path, no bootstrap feed dir written, and a later delta wave
    still emits its (delta-sized) feed."""
    import ray.data

    base = generate_table(1000)
    ups = updates_with_type(base)
    ups = ups.append_column(UPD_SEQ_COL,
                            pa.array(np.arange(len(ups), dtype=np.int64)))

    m_feed = IncrementalMirror(str(tmp_path / "with_feed"),
                               webpage_mirror_spec(), target_rows=300)
    m_feed.bootstrap(ray.data.from_arrow(ups).repartition(4), 1)
    m_nf = IncrementalMirror(str(tmp_path / "no_feed"),
                             webpage_mirror_spec(), target_rows=300)
    m_nf.bootstrap(ray.data.from_arrow(ups).repartition(4), 1,
                   emit_feed=False)

    got = _content_rows(m_nf, 1)
    want = _content_rows(m_feed, 1)
    assert got.column("url").equals(want.column("url"))
    assert got.column("text").equals(want.column("text"))
    assert m_feed.read_feed(1) is not None
    assert m_nf.read_feed(1) is None

    # a delta on the feed-less mirror still emits an exact feed
    delta = base.slice(0, 10)
    new_text = pa.array(["v2 " + t
                         for t in delta.column("text").to_pylist()])
    delta = delta.set_column(delta.column_names.index("text"), "text",
                             new_text)
    res = m_nf.apply(updates_with_type(delta), 1)
    assert len(res["feed"]) == 10
    assert set(res["feed"].column(TYPE_COL).to_pylist()) == {UPDATE}


def test_delta_touches_only_intersecting_partitions(ray_session, tmp_path):
    base, mirror = _bootstrap(tmp_path)
    urls = base.column("url").to_pylist()

    # a clustered delta: 20 consecutive urls (sorted order) modified,
    # the next 5 deleted — plus 10 brand-new urls elsewhere
    order = sorted(range(len(urls)), key=lambda i: urls[i])
    mod_rows = base.take(pa.array(order[100:120]))
    new_text = pa.array(["MODIFIED " + t for t in
                         mod_rows.column("text").to_pylist()])
    mod_rows = mod_rows.set_column(
        mod_rows.column_names.index("text"), "text", new_text)
    delete_urls = [urls[i] for i in order[120:125]]
    add_rows = generate_table(10, seed=999)
    add_urls = pa.array([f"https://zzz.example/p/{i:04d}"
                         for i in range(10)])   # sorts past everything:
    add_rows = add_rows.set_column(              # clusters in one part
        add_rows.column_names.index("url"), "url", add_urls).cast(
        base.schema)

    upd = pa.concat_tables([
        updates_with_type(mod_rows, UPDATE),
        updates_with_type(add_rows, UPDATE),
    ])
    del_tbl = pa.table({
        "url": pa.array(delete_urls),
        "warc_ts": pa.nulls(5, pa.timestamp("us")),
        "html": pa.nulls(5, pa.large_binary()),
        "text": pa.nulls(5, pa.string()),
        "lang": pa.nulls(5, pa.string()),
    }).cast(mod_rows.schema)
    upd = pa.concat_tables([upd, updates_with_type(del_tbl, DELETE)])

    res = mirror.apply(upd, 1)
    stats = res["content"]
    assert stats["rewritten"] >= 1
    assert stats["linked"] >= 1

    # untouched files are hardlinks of the previous version (zero copy)
    m1 = {p["file"] for p in mirror.content.manifest(1)["partitions"]}
    m2 = mirror.content.manifest(2)["partitions"]
    linked = [p for p in m2 if p["file"] in m1]
    assert linked
    for p in linked:
        path = os.path.join(mirror.content.root, "v2", p["file"])
        assert os.stat(path).st_nlink >= 2

    # equivalence against from-scratch recompute
    keep = np.ones(len(base), dtype=bool)
    for i in order[100:125]:
        keep[i] = False
    expected = pa.concat_tables([
        base.filter(pa.array(keep)), mod_rows, add_rows
    ]).sort_by([("url", "ascending")])
    got = _content_rows(mirror, 2)
    assert got.column("url").equals(expected.column("url"))
    assert got.column("text").equals(expected.column("text"))
    assert got.column("html").equals(expected.column("html"))

    # feed labels: adds for brand-new urls, updates for modified,
    # deletes for removed
    feed = res["feed"]
    types = {r["url"]: r[TYPE_COL] for r in feed.to_pylist()}
    for u in add_rows.column("url").to_pylist():
        assert types[u] == ADD
    for u in mod_rows.column("url").to_pylist():
        assert types[u] == UPDATE
    for u in delete_urls:
        assert types[u] == DELETE
    assert len(feed) == len(mod_rows) + len(add_rows) + len(delete_urls)


def test_noop_delta_links_everything(ray_session, tmp_path):
    base, mirror = _bootstrap(tmp_path, rows=1000, target_rows=300)
    empty = updates_with_type(base.slice(0, 0))
    res = mirror.apply(empty, 1)
    assert res["content"]["rewritten"] == 0
    assert len(res["feed"]) == 0
    got = _content_rows(mirror, 2)
    assert got.column("url").equals(
        base.sort_by([("url", "ascending")]).column("url"))


def test_read_keys_prunes_partitions(ray_session, tmp_path):
    base, mirror = _bootstrap(tmp_path, rows=1000, target_rows=200)
    urls = sorted(base.column("url").to_pylist())
    want = {(urls[3],), (urls[700],)}
    t = mirror.content.read_keys(1, want)
    got = {(u,) for u in t.column("url").to_pylist()}
    assert got == want


def test_oversized_partition_splits(ray_session, tmp_path):
    base, mirror = _bootstrap(tmp_path, rows=1000, target_rows=200)
    m1 = mirror.content.manifest(1)
    # add 900 new urls all clustered past the end of the url space
    add = generate_table(900, seed=77)
    add_urls = pa.array([f"https://zzz.example/p/{i:05d}"
                         for i in range(900)])
    add = add.set_column(add.column_names.index("url"), "url",
                         add_urls).cast(base.schema)
    mirror.apply(updates_with_type(add), 1)
    m2 = mirror.content.manifest(2)
    # the single rightmost partition absorbed 900 rows > 2*target and split
    assert len(m2["partitions"]) > len(m1["partitions"])
    parts = m2["partitions"]
    for a, b in zip(parts, parts[1:]):
        assert tuple(a["max"]) <= tuple(b["min"])
    got = _content_rows(mirror, 2)
    assert len(got) == 1900


def test_ranged_table_descending_bootstrap_and_empty_rebuild(
        ray_session, tmp_path):
    """Manifest ranges must be orientation-agnostic (a descending
    bootstrap writes last < first) and a delta applied on top of an
    empty version must rebuild the table instead of crashing."""
    import ray.data as rd

    from parquet_producers_ray.engine.ranged import RangedTable

    t1 = pa.table({"k": pa.array([9, 8, 7], pa.int64()),
                   "v": pa.array([1, 2, 3], pa.int64()),
                   "_seq": pa.array([0, 0, 0], pa.int64())})
    t2 = pa.table({"k": pa.array([6, 5, 4], pa.int64()),
                   "v": pa.array([4, 5, 6], pa.int64()),
                   "_seq": pa.array([0, 0, 0], pa.int64())})
    # target_rows=3 → the 6 rows split into 2 partitions (write_full
    # partitions by rows explicitly, not by incidental block structure)
    rt = RangedTable(str(tmp_path / "rt"), ["k", "_seq"], target_rows=3)
    rt.write_full(rd.from_arrow([t1, t2]), 1)
    m = rt.manifest(1)
    assert len(m["partitions"]) == 2
    for p in m["partitions"]:
        assert tuple(p["min"]) <= tuple(p["max"])
    # range-pruned point lookup into the "inverted" second file
    got = rt.read_keys(1, {(5,)})
    assert got.column("v").to_pylist() == [5]
    # delta across partitions: drop from one file, add beyond the range
    adds = pa.table({"k": pa.array([10], pa.int64()),
                     "v": pa.array([99], pa.int64()),
                     "_seq": pa.array([0], pa.int64())})
    rt.apply_delta(1, 2, adds, {(8,)}, ["k"])
    assert sorted(r["k"] for r in rt.read(2).take_all()) == \
        [4, 5, 6, 7, 9, 10]

    # drop EVERYTHING -> empty version -> re-add must not crash
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64()),
                      "_seq": pa.array([], pa.int64())})
    rt.apply_delta(2, 3, empty, {(k,) for k in [4, 5, 6, 7, 9, 10]},
                   ["k"])
    assert rt.manifest(3)["partitions"] == []
    assert rt.read(3) is None
    rt.apply_delta(3, 4, adds, set(), ["k"])
    assert [r["k"] for r in rt.read(4).take_all()] == [10]


def test_ranged_table_timestamp_keys_round_trip(ray_session, tmp_path):
    """Timestamp sort keys must survive the manifest JSON round-trip
    with working range comparisons (epoch-µs normalization)."""
    import datetime

    import ray.data as rd

    from parquet_producers_ray.engine.ranged import RangedTable

    base = datetime.datetime(2024, 1, 1)
    ts = [base + datetime.timedelta(minutes=m) for m in range(6)]
    t1 = pa.table({"ts": pa.array(ts[:3], pa.timestamp("us")),
                   "v": pa.array([0, 1, 2], pa.int64()),
                   "_seq": pa.array([0, 0, 0], pa.int64())})
    t2 = pa.table({"ts": pa.array(ts[3:], pa.timestamp("us")),
                   "v": pa.array([3, 4, 5], pa.int64()),
                   "_seq": pa.array([0, 0, 0], pa.int64())})
    rt = RangedTable(str(tmp_path / "ts"), ["ts", "_seq"],
                     target_rows=3)   # 6 rows → 2 explicit partitions
    rt.write_full(rd.from_arrow([t1, t2]), 1)
    got = rt.read_keys(1, {(ts[4],)})
    assert got.column("v").to_pylist() == [4]
    adds = pa.table({"ts": pa.array([ts[1]], pa.timestamp("us")),
                     "v": pa.array([99], pa.int64()),
                     "_seq": pa.array([1], pa.int64())})
    stats = rt.apply_delta(1, 2, adds, {(ts[0],)}, ["ts"])
    assert stats == {"rewritten": 1, "linked": 1}
    assert sorted(r["v"] for r in rt.read(2).take_all()) == \
        [1, 2, 3, 4, 5, 99]


def test_mirror_rejects_mixed_delete_and_upsert(ray_session, tmp_path):
    from parquet_producers_ray.engine.model import DELETE, UPDATE
    from parquet_producers_ray.pipelines.incremental import (
        IncrementalMirror, webpage_mirror_spec)
    from parquet_producers_ray.sources.webpages import generate_shard

    import ray.data as rd

    mirror = IncrementalMirror(str(tmp_path / "m"), webpage_mirror_spec())
    boot = updates_with_type(generate_shard(0, 64))
    boot = boot.append_column(UPD_SEQ_COL, pa.array(
        np.arange(len(boot), dtype=np.int64)))
    mirror.bootstrap(rd.from_arrow(boot), 1)
    bad = generate_shard(0, 2)
    bad = bad.append_column(TYPE_COL, pa.array(
        [DELETE, UPDATE], pa.int8()))
    # same url twice: one Delete + one upsert
    bad = bad.set_column(bad.column_names.index("url"), "url",
                         pa.array([bad.column("url")[1].as_py()] * 2))
    with pytest.raises(ValueError, match="mixes Delete"):
        mirror.apply(bad, 1)


def test_read_range_prunes_partitions(ray_session, tmp_path):
    """Key-range scan: only partitions whose manifest zone intersects
    [lo, hi] are read; the residual bound filter is exact."""
    import ray.data as rd

    from parquet_producers_ray.engine.ranged import RangedTable

    tables = [pa.table({"k": pa.array(list(range(s, s + 10)), pa.int64()),
                        "v": pa.array(list(range(s, s + 10)), pa.int64()),
                        "_seq": pa.array([0] * 10, pa.int64())})
              for s in (0, 10, 20, 30)]
    rt = RangedTable(str(tmp_path / "rng"), ["k", "_seq"], target_rows=10)
    rt.write_full(rd.from_arrow(tables), 1)
    assert len(rt.manifest(1)["partitions"]) == 4

    # mid-range crossing two partitions, inclusive bounds
    got = rt.read_range(1, lo=7, hi=13)
    assert sorted(r["k"] for r in got.take_all()) == [7, 8, 9, 10, 11, 12, 13]

    # unbounded below / above
    assert sorted(r["k"] for r in rt.read_range(1, hi=2).take_all()) == [0, 1, 2]
    assert sorted(r["k"] for r in rt.read_range(1, lo=37).take_all()) == [37, 38, 39]

    # zone-map pruning is real: a range inside one partition reads 1 file
    m = rt.manifest(1)
    hit = [p for p in m["partitions"]
           if not (p["max"][0] < 15 or p["min"][0] > 16)]
    assert len(hit) == 1
    got = rt.read_range(1, lo=15, hi=16)
    assert sorted(r["k"] for r in got.take_all()) == [15, 16]

    # fully outside every zone
    assert rt.read_range(1, lo=100, hi=200) is None

    # tuple-prefix bounds exercise the composite-key residual path
    got = rt.read_range(1, lo=(7, 0), hi=(9, 0))
    assert sorted(r["k"] for r in got.take_all()) == [7, 8, 9]


def test_read_range_timestamp_bounds(ray_session, tmp_path):
    """Timestamp bounds normalize for zone pruning and compare as real
    timestamps in the vectorized residual filter."""
    import datetime

    import ray.data as rd

    from parquet_producers_ray.engine.ranged import RangedTable

    base = datetime.datetime(2024, 1, 1)
    ts = [base + datetime.timedelta(hours=h) for h in range(8)]
    t1 = pa.table({"ts": pa.array(ts[:4], pa.timestamp("us")),
                   "v": pa.array([0, 1, 2, 3], pa.int64()),
                   "_seq": pa.array([0] * 4, pa.int64())})
    t2 = pa.table({"ts": pa.array(ts[4:], pa.timestamp("us")),
                   "v": pa.array([4, 5, 6, 7], pa.int64()),
                   "_seq": pa.array([0] * 4, pa.int64())})
    rt = RangedTable(str(tmp_path / "tsr"), ["ts", "_seq"], target_rows=4)
    rt.write_full(rd.from_arrow([t1, t2]), 1)
    got = rt.read_range(1, lo=ts[2], hi=ts[5])
    assert sorted(r["v"] for r in got.take_all()) == [2, 3, 4, 5]


def test_mirror_prune_retention_gc(ray_session, tmp_path):
    """prune() deletes versions below keep-from without touching the
    survivors: hardlinked partition files shared with newer versions
    keep their inodes, the newest version reads identically, and the
    freed-bytes accounting only counts last-link files."""
    base, mirror = _bootstrap(tmp_path, rows=2000, target_rows=300)

    def wave(lo, hi, v):
        delta = base.slice(lo, hi - lo)
        new_text = pa.array([f"v{v} " + t
                             for t in delta.column("text").to_pylist()])
        delta = delta.set_column(delta.column_names.index("text"),
                                 "text", new_text)
        mirror.apply(updates_with_type(delta), v)

    wave(0, 20, 1)     # -> v2
    wave(500, 520, 2)  # -> v3
    assert mirror.content.versions() == [1, 2, 3]
    before = _content_rows(mirror, 3)

    res = mirror.prune(3)
    assert res["content"]["pruned_versions"] == 2
    assert res["mappings"]["pruned_versions"] == 2
    assert res["feeds"]["pruned_versions"] == 2
    assert res["content"]["freed_bytes"] > 0
    assert mirror.content.versions() == [3]
    assert mirror.read_feed(1) is None and mirror.read_feed(3) is not None

    # v3 (with its hardlinked partitions) reads byte-identically
    after = _content_rows(mirror, 3)
    assert after.equals(before)

    # pruning can never delete the newest version
    res2 = mirror.prune(99)
    assert mirror.content.versions() == [3]
    assert res2["content"]["pruned_versions"] == 0

    # keep_feeds leaves feed dirs alone
    wave(100, 110, 3)  # -> v4
    res3 = mirror.prune(4, keep_feeds=True)
    assert res3["feeds"]["pruned_versions"] == 0
    assert mirror.read_feed(3) is not None


def test_mirror_compact_merges_small_partitions(ray_session, tmp_path):
    """After a delete-heavy wave shrinks partitions, compact() merges
    adjacent undersized ones into ~target_rows files: data identical,
    partition count drops, full partitions hardlink, and a later delta
    applies cleanly on the compacted version."""
    base, mirror = _bootstrap(tmp_path, rows=3000, target_rows=400)
    urls = base.column("url").to_pylist()

    # delete ~2 of every 3 rows -> every partition shrinks
    drop = pa.table({
        "url": pa.array([u for i, u in enumerate(urls) if i % 3 != 0]),
        "warc_ts": pa.nulls(2000, base.schema.field("warc_ts").type),
        "html": pa.nulls(2000, base.schema.field("html").type),
        "text": pa.nulls(2000, pa.string()),
        "lang": pa.nulls(2000, pa.string()),
    })
    mirror.apply(updates_with_type(drop, DELETE), 1)
    before = _content_rows(mirror, 2)
    n_before = len(mirror.content.manifest(2)["partitions"])

    res = mirror.compact(2)
    assert res["version"] == 3
    n_after = res["content"]["partitions_after"]
    assert n_after < n_before
    assert res["content"]["merged_groups"] >= 1
    after = _content_rows(mirror, 3)
    assert after.equals(before)
    # manifest ranges stay ordered and disjoint
    parts = mirror.content.manifest(3)["partitions"]
    for a, b in zip(parts, parts[1:]):
        assert tuple(a["max"]) < tuple(b["min"])

    # a later delta applies on the compacted version
    mod = base.slice(0, 9)   # doc 0,3,6 survive; others re-add
    res2 = mirror.apply(updates_with_type(mod), 3)
    got = _content_rows(mirror, 4)
    assert got.num_rows == before.num_rows + 6   # 6 re-added rows
    assert res2["content"]["rewritten"] >= 1


def test_half_corpus_delta_matches_recompute(ray_session, tmp_path):
    """Round-5 large-delta pin (VERDICT item 10): a 50%-of-corpus
    delta wave must land content identical to bootstrapping the
    updated corpus from scratch, with rewrite confined to touched
    partitions (bench.py records the wall/rewrite-fraction ladder at
    1%/10%/50%)."""
    base, mirror = _bootstrap(tmp_path, rows=4000, target_rows=500)

    n_half = len(base) // 2
    delta = base.slice(0, n_half)
    delta = delta.set_column(
        delta.column_names.index("text"), "text",
        pa.array(["v2 " + t for t in delta.column("text").to_pylist()]))
    res = mirror.apply(updates_with_type(delta), 1)
    stats = res["content"]
    assert stats["rewritten"] >= 1
    got = _content_rows(mirror, 2)

    want_tbl = base.set_column(
        base.column_names.index("text"), "text",
        pa.array((["v2 " + t for t in
                   base.column("text").to_pylist()[:n_half]]
                  + base.column("text").to_pylist()[n_half:])))
    import ray.data

    m3 = IncrementalMirror(str(tmp_path / "recompute"),
                           webpage_mirror_spec(), target_rows=500)
    ups = updates_with_type(want_tbl)
    ups = ups.append_column(
        UPD_SEQ_COL, pa.array(np.arange(len(ups), dtype=np.int64)))
    m3.bootstrap(ray.data.from_arrow(ups).repartition(8), 1)
    want = _content_rows(m3, 1)
    assert got.column("url").equals(want.column("url"))
    assert got.column("text").equals(want.column("text"))
