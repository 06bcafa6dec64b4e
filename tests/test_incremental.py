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
