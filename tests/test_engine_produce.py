"""Golden tests for the keyed sort-then-produce engine core, mirroring
the reference's `ValidFromEmpty` end-to-end scenario
(Parquet.Producers.Tests/ParquetProductionTests.cs:184-266, FIXTURES.md
F-2): initial load, 1→n fan-out re-production, key migration between
target groups, and source-key deletion — asserting full content /
key-mapping tables with strict ordering after every version.
"""

import pyarrow as pa
import pytest

from parquet_producers_ray.engine.model import (ADD, DELETE, TYPE_COL,
                                                UPDATE, StageSpec)
from parquet_producers_ray.engine.produce import (SEQ_COL, apply_updates,
                                                  updates_from_table)

SOURCE_SCHEMA = pa.schema([
    pa.field("key", pa.int64()),
    pa.field("first_name", pa.string()),
    pa.field("last_name", pa.string()),
    pa.field("copies", pa.int64()),
])

OUT_SCHEMA = pa.schema([
    pa.field("count", pa.int64()),
    pa.field("id", pa.int64()),
    pa.field("first_full_name", pa.string()),
    pa.field("copy", pa.int64()),
])


def project_stuff(key, values: pa.Table) -> pa.Table:
    """Reference ProjectStuff (Tests:161-182): per source key — count
    values, take first full name, max copies; emit `copies` rows keyed
    by the count."""
    count = len(values)
    first = (f"{values.column('first_name')[0].as_py()} "
             f"{values.column('last_name')[0].as_py()}")
    copies = max(v.as_py() for v in values.column("copies"))
    return pa.table({
        "count": pa.array([count] * copies, type=pa.int64()),
        "id": pa.array([key[0]] * copies, type=pa.int64()),
        "first_full_name": pa.array([first] * copies),
        "copy": pa.array(list(range(1, copies + 1)), type=pa.int64()),
    })


SPEC = StageSpec(
    name="stuff",
    produce=project_stuff,
    source_key=["key"],
    target_key=["count"],
    value_columns=["id", "first_full_name", "copy"],
    source_value_columns=["first_name", "last_name", "copies"],
    out_schema=OUT_SCHEMA,
    source_schema=SOURCE_SCHEMA,
)


def upd(key, first=None, last=None, copies=None, type_=UPDATE):
    return {"key": key, "first_name": first, "last_name": last,
            "copies": copies, TYPE_COL: type_}


class Harness:
    """In-memory multi-version driver (reference DataStore harness,
    Tests:17-109)."""

    def __init__(self, spec):
        self.spec = spec
        self.content = None
        self.mappings = None

    def update(self, rows):
        import ray.data

        table = pa.Table.from_pylist(
            rows, schema=pa.schema(list(SOURCE_SCHEMA)
                                   + [pa.field(TYPE_COL, pa.int8())]))
        updates = updates_from_table(table)
        prev_c = (ray.data.from_arrow(self.content)
                  if self.content is not None else None)
        prev_m = (ray.data.from_arrow(self.mappings)
                  if self.mappings is not None else None)
        c, m, f = apply_updates(self.spec, updates, prev_c, prev_m,
                                num_partitions=4)
        self.content = pa.Table.from_pylist(c.take_all(), schema=c.schema().base_schema)
        self.mappings = pa.Table.from_pylist(m.take_all(), schema=m.schema().base_schema)
        self.feed = pa.Table.from_pylist(f.take_all(), schema=f.schema().base_schema)
        return self.content, self.mappings, self.feed

    def assert_contents(self, expected):
        got = [(r["count"], r["_sk_key"], r["id"], r["first_full_name"],
                r["copy"]) for r in self.content.to_pylist()]
        assert got == expected, f"content mismatch:\n{got}\nvs\n{expected}"

    def assert_mappings(self, expected):
        got = [(r["_sk_key"], r["count"]) for r in self.mappings.to_pylist()]
        assert got == expected, f"mappings mismatch:\n{got}\nvs\n{expected}"

    def assert_feed(self, expected):
        got = [(r[TYPE_COL], r["count"], r["id"], r["first_full_name"],
                r["copy"]) for r in self.feed.to_pylist()]
        assert got == expected, f"feed mismatch:\n{got}\nvs\n{expected}"


@pytest.fixture()
def harness(ray_session):
    return Harness(SPEC)


def test_valid_from_empty_scenario(harness):
    h = harness

    # version 1 — initial load (Tests:193-209)
    h.update([
        upd(1, "Randy", "Newman", 1),
        upd(2, "Gary", "Oldman", 1),
        upd(2, "Gary", "Newman", 1),
        upd(3, "Randy", "Oldman", 1),
    ])
    h.assert_contents([
        (1, 1, 1, "Randy Newman", 1),
        (1, 3, 3, "Randy Oldman", 1),
        (2, 2, 2, "Gary Oldman", 1),
    ])
    h.assert_mappings([(1, 1), (2, 2), (3, 1)])
    # all target keys new: first row of each tk = Add, rest Update
    h.assert_feed([
        (ADD, 1, 1, "Randy Newman", 1),
        (UPDATE, 1, 3, "Randy Oldman", 1),
        (ADD, 2, 2, "Gary Oldman", 1),
    ])

    # version 2 — 1→n fan-out for source key 1 (Tests:212-231)
    h.update([upd(1, "Randy", "Newman", 3)])
    h.assert_contents([
        (1, 1, 1, "Randy Newman", 1),
        (1, 1, 1, "Randy Newman", 2),
        (1, 1, 1, "Randy Newman", 3),
        (1, 3, 3, "Randy Oldman", 1),
        (2, 2, 2, "Gary Oldman", 1),
    ])
    h.assert_mappings([(1, 1), (1, 1), (1, 1), (2, 2), (3, 1)])
    # tk 1 touched & existed → full new row set as Updates
    h.assert_feed([
        (UPDATE, 1, 1, "Randy Newman", 1),
        (UPDATE, 1, 1, "Randy Newman", 2),
        (UPDATE, 1, 1, "Randy Newman", 3),
        (UPDATE, 1, 3, "Randy Oldman", 1),
    ])

    # version 3 — key migration: source key 3 now produces tk 2
    # (Tests:233-251)
    h.update([
        upd(3, "Silly", "Oldman", 1),
        upd(3, "Randy", "Oldman", 1),
    ])
    h.assert_contents([
        (1, 1, 1, "Randy Newman", 1),
        (1, 1, 1, "Randy Newman", 2),
        (1, 1, 1, "Randy Newman", 3),
        (2, 2, 2, "Gary Oldman", 1),
        (2, 3, 3, "Silly Oldman", 1),
    ])
    h.assert_mappings([(1, 1), (1, 1), (1, 1), (2, 2), (3, 2)])
    # tk 1 lost a row but still has rows → Updates; tk 2 gains → Updates
    h.assert_feed([
        (UPDATE, 1, 1, "Randy Newman", 1),
        (UPDATE, 1, 1, "Randy Newman", 2),
        (UPDATE, 1, 1, "Randy Newman", 3),
        (UPDATE, 2, 2, "Gary Oldman", 1),
        (UPDATE, 2, 3, "Silly Oldman", 1),
    ])

    # version 4 — delete source key 2 (Tests:252-265)
    h.update([upd(2, type_=DELETE)])
    h.assert_contents([
        (1, 1, 1, "Randy Newman", 1),
        (1, 1, 1, "Randy Newman", 2),
        (1, 1, 1, "Randy Newman", 3),
        (2, 3, 3, "Silly Oldman", 1),
    ])
    h.assert_mappings([(1, 1), (1, 1), (1, 1), (3, 2)])
    h.assert_feed([
        (UPDATE, 2, 3, "Silly Oldman", 1),
    ])


def test_mixed_delete_and_upsert_raises(harness):
    with pytest.raises(Exception):
        harness.update([
            upd(1, "A", "B", 1),
            upd(1, type_=DELETE),
        ])


def test_delete_of_unknown_key_is_noop(harness):
    h = harness
    h.update([upd(1, "A", "B", 1)])
    c, m, f = h.update([upd(99, type_=DELETE)])
    h.assert_contents([(1, 1, 1, "A B", 1)])
    assert len(f) == 0


# ---------------------------------------------------------------------------
# Vectorized row-wise production (the web-scale path: no per-key
# Python calls, no grouping shuffle)

ROWWISE_SOURCE = pa.schema([
    pa.field("id", pa.int64()),
    pa.field("phrase", pa.string()),
])


def split_rows(batch: pa.Table) -> pa.Table:
    """U2 flat-map, vectorized: one output row per word."""
    import numpy as np
    import pyarrow.compute as pc
    words = pc.split_pattern(batch.column("phrase"), " ")
    n = pc.list_value_length(words).fill_null(0).to_numpy(
        zero_copy_only=False)
    row = np.repeat(np.arange(len(batch), dtype=np.int64), n)
    return pa.table({
        "word": pc.list_flatten(words),
        "_sk_id": batch.column("id").take(pa.array(row)),
        "wid": batch.column("id").take(pa.array(row)),
        "_row": pa.array(row),
    })


ROWWISE_SPEC = StageSpec(
    name="rowwise_words",
    produce=None,
    produce_rows=split_rows,
    source_key=["id"], target_key=["word"],
    value_columns=["wid"], source_value_columns=["phrase"],
    out_schema=pa.schema([pa.field("word", pa.string()),
                          pa.field("wid", pa.int64())]),
    source_schema=ROWWISE_SOURCE)


def rupd(id_, phrase=None, type_=UPDATE):
    return {"id": id_, "phrase": phrase, TYPE_COL: type_}


def test_rowwise_produce_multi_version(ray_session):
    import ray.data

    def run(rows, prev_c, prev_m):
        table = pa.Table.from_pylist(
            rows, schema=pa.schema(list(ROWWISE_SOURCE)
                                   + [pa.field(TYPE_COL, pa.int8())]))
        c, m, f = apply_updates(ROWWISE_SPEC, updates_from_table(table),
                                prev_c, prev_m)
        return c.materialize(), m.materialize(), f.materialize()

    c, m, f = run([rupd(1, "b a"), rupd(2, "a c")], None, None)
    content = [(r["word"], r["_sk_id"], r["wid"]) for r in c.take_all()]
    assert content == [("a", 1, 1), ("a", 2, 2), ("b", 1, 1), ("c", 2, 2)]
    feed = [(r[TYPE_COL], r["word"], r["wid"]) for r in f.take_all()]
    assert feed == [(ADD, "a", 1), (UPDATE, "a", 2), (ADD, "b", 1),
                    (ADD, "c", 2)]

    # delta: re-key id 1, delete nothing
    c2, m2, f2 = run([rupd(1, "c c")], c, m)
    content = [(r["word"], r["_sk_id"], r["wid"]) for r in c2.take_all()]
    assert content == [("a", 2, 2), ("c", 1, 1), ("c", 1, 1), ("c", 2, 2)]
    feed = [(r[TYPE_COL], r["word"]) for r in f2.take_all()]
    # a lost sk1's row but keeps sk2's → full new rowset as updates;
    # b vanished → Delete; c gains rows → full new rowset as updates
    assert feed == [(UPDATE, "a"), (DELETE, "b"), (UPDATE, "c"),
                    (UPDATE, "c"), (UPDATE, "c")]

    # delete id 2 entirely
    c3, m3, f3 = run([rupd(2, type_=DELETE)], c2, m2)
    content = [(r["word"], r["_sk_id"]) for r in c3.take_all()]
    assert content == [("c", 1), ("c", 1)]
    feed = [(r[TYPE_COL], r["word"]) for r in f3.take_all()]
    assert feed == [(DELETE, "a"), (UPDATE, "c"), (UPDATE, "c")]


def test_rowwise_mixed_delete_upsert_raises(ray_session):
    """Pins the DELIBERATELY STRICTER-than-reference mixed-Delete
    policy (see apply_updates' bootstrap comment): the wave below is
    upsert-then-Delete on key 1 — LEGAL in the reference
    (ParquetProduction.cs:320-337 raises only for Delete-then-upsert;
    this order nets out to a delete) — but this engine rejects both
    orders because the row-wise path drops deletes before produce and
    must never silently PRODUCE a key the reference would DELETE."""
    import ray.data
    table = pa.Table.from_pylist(
        [rupd(1, "a"), rupd(1, type_=DELETE)],
        schema=pa.schema(list(ROWWISE_SOURCE)
                         + [pa.field(TYPE_COL, pa.int8())]))
    prev = pa.Table.from_pylist(
        [rupd(9, "z")], schema=pa.schema(list(ROWWISE_SOURCE)
                                         + [pa.field(TYPE_COL, pa.int8())]))
    c, m, f = apply_updates(ROWWISE_SPEC, updates_from_table(prev),
                            None, None)
    with pytest.raises(Exception):
        apply_updates(ROWWISE_SPEC, updates_from_table(table),
                      c.materialize(), m.materialize())


def test_updates_from_dataset_matches_table_wave(ray_session):
    """Dataset-native wave construction (updates_from_dataset — the
    scale form that never materializes the wave on the driver) must
    produce the same content as a driver-side updates_from_table wave,
    including multi-row-per-key order via ``seq_from`` (project_stuff
    takes the FIRST full name per key, so _upd_seq order is visible in
    the output)."""
    import numpy as np
    import ray.data

    from parquet_producers_ray.engine.produce import updates_from_dataset

    rows = pa.table({
        "key": pa.array([1, 1, 2, 3], pa.int64()),
        "first_name": pa.array(["a", "b", "c", "d"]),
        "last_name": pa.array(["x", "y", "z", "w"]),
        "copies": pa.array([1, 1, 2, 1], pa.int64()),
    })
    with_type = rows.append_column(
        TYPE_COL, pa.array(np.full(4, UPDATE, np.int8)))
    line = pa.array([0, 1, 0, 0], pa.int64())   # within-key order

    c_a, _, _ = apply_updates(SPEC, updates_from_table(with_type),
                              None, None, num_partitions=4)

    wave_b = updates_from_dataset(
        ray.data.from_arrow(with_type.append_column("line", line)),
        seq_from="line").map_batches(
            lambda b: b.drop_columns(["line"]), batch_format="pyarrow")
    c_b, _, _ = apply_updates(SPEC, wave_b, None, None, num_partitions=4)

    a = c_a.to_pandas().sort_values(["count", "_sk_key", "copy"])
    b = c_b.to_pandas().sort_values(["count", "_sk_key", "copy"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_label_feed_sorted_derived_order_multiblock(ray_session):
    """Regression: the feed-labeling block-summary walk ordered blocks
    by RAW target key even when the spec's derived_sort_key had sorted
    the data by derived columns — so a key run straddling two blocks
    was visited out of physical order, double-labeling Add and
    restarting _upd_seq.  Drive label_feed_sorted directly with two
    physically derived-ordered blocks (word DESC) whose 'b' run
    straddles the boundary."""
    import numpy as np
    import ray.data

    from parquet_producers_ray.engine.model import (SEQ_COL, StageSpec,
                                                    UPD_SEQ_COL, ADD,
                                                    UPDATE, TYPE_COL)
    from parquet_producers_ray.engine.produce import (ISNEW_COL,
                                                      label_feed_sorted)

    spec = StageSpec(
        name="desc_words", produce=lambda k, v: None,
        source_key=["sid"], target_key=["word"], value_columns=["n"],
        source_value_columns=["word"],
        out_schema=pa.schema([pa.field("word", pa.string()),
                              pa.field("n", pa.int64())]),
        source_schema=pa.schema([pa.field("sid", pa.int64()),
                                 pa.field("word", pa.string())]),
        derived_sort_key=lambda t: pa.table(
            {"w": t.column("word")}),
        derived_descending=[True])

    def blk(words, sks, seqs):
        return pa.table({
            "word": pa.array(words, pa.string()),
            "n": pa.array(list(range(len(words))), pa.int64()),
            "_sk_sid": pa.array(sks, pa.int64()),
            SEQ_COL: pa.array(seqs, pa.int64()),
            ISNEW_COL: pa.array(np.ones(len(words), np.int8))})

    # physical order = word DESC: [c, b, b] | [b, a]
    b1 = blk(["c", "b", "b"], [10, 11, 12], [0, 0, 0])
    b2 = blk(["b", "a"], [13, 14], [0, 0])
    flagged = ray.data.from_arrow([b1, b2]).materialize()
    feed = label_feed_sorted(spec, flagged)
    rows = {(r["word"], r["n"]): (r[TYPE_COL], r[UPD_SEQ_COL])
            for r in pa.concat_tables(
                list(feed.iter_batches(batch_format="pyarrow"))).to_pylist()}
    assert rows[("c", 0)] == (ADD, 0)
    assert rows[("b", 1)] == (ADD, 0)      # first b of the run
    assert rows[("b", 2)] == (UPDATE, 1)
    assert rows[("b", 0)] == (UPDATE, 2)   # straddling block: carries on
    assert rows[("a", 1)] == (ADD, 0)


def test_produce_rows_bootstrap_rejects_mixed_delete(ray_session):
    """Regression: the row-wise produce path silently dropped Delete
    rows at bootstrap, skipping the mixed Delete/upsert rule the
    per-key and grouped paths enforce (reference
    ParquetProduction.cs:326-337).  A bootstrap wave mixing both on
    one source key must raise on every path."""
    import ray.data

    from parquet_producers_ray.engine.model import (DELETE, TYPE_COL,
                                                    UPDATE, StageSpec,
                                                    UPD_SEQ_COL)
    from parquet_producers_ray.engine.produce import apply_updates

    def rows_fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "word": batch.column("word"),
            "_sk_sid": batch.column("sid"),
            "n": pa.array([1] * n, pa.int64()),
            "_row": pa.array(list(range(n)), pa.int64())})

    spec = StageSpec(
        name="rows_boot", produce=lambda k, v: None,
        source_key=["sid"], target_key=["word"], value_columns=["n"],
        source_value_columns=["word"],
        out_schema=pa.schema([pa.field("word", pa.string()),
                              pa.field("n", pa.int64())]),
        source_schema=pa.schema([pa.field("sid", pa.int64()),
                                 pa.field("word", pa.string())]),
        produce_rows=rows_fn)

    upd = pa.table({
        "sid": pa.array([1, 1, 2], pa.int64()),
        "word": pa.array(["a", "b", "c"], pa.string()),
        TYPE_COL: pa.array([UPDATE, DELETE, UPDATE], pa.int8()),
        UPD_SEQ_COL: pa.array([0, 1, 0], pa.int64())})
    with pytest.raises(ValueError, match="Delete"):
        apply_updates(spec, ray.data.from_arrow(upd))

    # a clean delete-free bootstrap still works
    ok = pa.table({
        "sid": pa.array([1, 2], pa.int64()),
        "word": pa.array(["a", "c"], pa.string()),
        TYPE_COL: pa.array([UPDATE, UPDATE], pa.int8()),
        UPD_SEQ_COL: pa.array([0, 0], pa.int64())})
    content, mappings, feed = apply_updates(spec, ray.data.from_arrow(ok))
    assert content.count() == 2
