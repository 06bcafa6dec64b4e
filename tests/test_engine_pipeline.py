"""Golden tests for the DAG cascade + ReadSources merge + surrogate-id
preservation, mirroring the reference's `WordCounting` (Tests:292-543)
and `PreservingValues` (Tests:558-672) end-to-end scenarios."""

import pyarrow as pa
import pytest

from parquet_producers_ray.engine.io import MemoryStore
from parquet_producers_ray.engine.model import (ADD, DELETE, TYPE_COL,
                                                UPDATE, StageSpec,
                                                SurrogateIdPreserver)
from parquet_producers_ray.engine.pipeline import Producer
from parquet_producers_ray.engine.produce import updates_from_table

INT = pa.int64()
STR = pa.string()


def identity_produce(key, values: pa.Table) -> pa.Table:
    n = len(values)
    return pa.table({"id": pa.array([key[0]] * n, type=INT),
                     "phrase": values.column("phrase")})


def split_produce(key, values: pa.Table) -> pa.Table:
    words, wids = [], []
    for v in values.column("phrase").to_pylist():
        for w in v.split(" "):
            words.append(w)
            wids.append(key[0])
    return pa.table({"word": pa.array(words, type=STR),
                     "wid": pa.array(wids, type=INT)})


def count_produce(key, values: pa.Table) -> pa.Table:
    return pa.table({"count": pa.array([len(values)], type=INT),
                     "word_v": pa.array([key[0]], type=STR)})


TEXT_SCHEMA = pa.schema([pa.field("id", INT), pa.field("phrase", STR)])


def text_spec(name: str) -> StageSpec:
    return StageSpec(
        name=name, produce=identity_produce,
        source_key=["id"], target_key=["id"],
        value_columns=["phrase"], source_value_columns=["phrase"],
        out_schema=TEXT_SCHEMA, source_schema=TEXT_SCHEMA)


IDSBYWORD_SPEC = StageSpec(
    name="idsByWord", produce=split_produce,
    source_key=["id"], target_key=["word"],
    value_columns=["wid"], source_value_columns=["phrase"],
    out_schema=pa.schema([pa.field("word", STR), pa.field("wid", INT)]),
    source_schema=TEXT_SCHEMA)

WORDCOUNTS_SPEC = StageSpec(
    name="wordCounts", produce=count_produce,
    source_key=["word"], target_key=["count"],
    value_columns=["word_v"], source_value_columns=["wid"],
    out_schema=pa.schema([pa.field("count", INT), pa.field("word_v", STR)]),
    source_schema=pa.schema([pa.field("word", STR), pa.field("wid", INT)]),
    target_descending=[True])


def upd_table(rows, schema=TEXT_SCHEMA):
    return pa.Table.from_pylist(
        rows, schema=pa.schema(list(schema) + [pa.field(TYPE_COL, pa.int8())]))


def table_of(store, stage, kind, version, cols):
    ds = store.open_read(stage, kind, version)
    rows = ds.take_all()
    return [tuple(r[c] for c in cols) for r in rows]


@pytest.fixture()
def stores(ray_session):
    return MemoryStore()


@pytest.mark.parametrize("rs_threshold", [None, 0],
                         ids=["driver-set", "join-path"])
def test_word_counting_dag(stores, monkeypatch, rs_threshold):
    # rs_threshold=0 forces EVERY read_sources merge through the
    # distributed semi-join formulation (engine/pipeline.py:
    # _read_sources_join); the goldens must be identical
    if rs_threshold is not None:
        import parquet_producers_ray.engine.produce as prod
        monkeypatch.setattr(prod, "PRESERVE_JOIN_THRESHOLD", rs_threshold)
    store = stores
    phrases = Producer(store, text_spec("phrasesById"))
    books = Producer(store, text_spec("booksById"))
    ids_by_word = Producer(store, IDSBYWORD_SPEC, [phrases, books])
    word_counts = ids_by_word.produces(WORDCOUNTS_SPEC)
    assert word_counts.sources == [ids_by_word]

    # wave A (v0 → v1): both feeders load, then the 2-feeder merge
    # (reference Tests:320-366: phrases.Update, books.Update,
    # idsByWord.UpdateFrom(phrases, books))
    phrases._update_internal(updates_from_table(upd_table([
        {"id": 1, "phrase": "the quick brown fox", TYPE_COL: UPDATE},
        {"id": 2, "phrase": "jumps over the lazy dog", TYPE_COL: UPDATE},
        {"id": 3, "phrase": "sometimes a dog is brown", TYPE_COL: UPDATE},
        {"id": 4, "phrase": "brown is my favourite colour", TYPE_COL: UPDATE},
    ])), 0)
    assert table_of(store, "phrasesById", "content", 1,
                    ["id", "phrase"]) == [
        (1, "the quick brown fox"),
        (2, "jumps over the lazy dog"),
        (3, "sometimes a dog is brown"),
        (4, "brown is my favourite colour")]

    books._update_internal(updates_from_table(upd_table([
        {"id": 1, "phrase": "the brain police", TYPE_COL: UPDATE},
        {"id": 2, "phrase": "sometimes the fox is lazy", TYPE_COL: UPDATE},
        {"id": 3, "phrase": "the mystery at dog hall", TYPE_COL: UPDATE},
    ])), 0)
    ids_by_word._update_from_sources(0)

    got = table_of(store, "idsByWord", "content", 1, ["word", "wid"])
    # reference golden (Tests:369-400): idsByWord contents after merge
    expected = [
        ("a", 3), ("at", 3), ("brain", 1), ("brown", 1), ("brown", 3),
        ("brown", 4), ("colour", 4), ("dog", 2), ("dog", 3), ("dog", 3),
        ("favourite", 4), ("fox", 1), ("fox", 2), ("hall", 3),
        ("is", 2), ("is", 3), ("is", 4), ("jumps", 2), ("lazy", 2),
        ("lazy", 2), ("my", 4), ("mystery", 3), ("over", 2),
        ("police", 1), ("quick", 1), ("sometimes", 2), ("sometimes", 3),
        ("the", 1), ("the", 1), ("the", 2), ("the", 2), ("the", 3)]
    assert got == expected

    word_counts._update_from_sources(0)
    got = table_of(store, "wordCounts", "content", 1, ["count", "word_v"])
    expected_counts = [
        (5, "the"), (3, "brown"), (3, "dog"), (3, "is"), (2, "fox"),
        (2, "lazy"), (2, "sometimes"), (1, "a"), (1, "at"), (1, "brain"),
        (1, "colour"), (1, "favourite"), (1, "hall"), (1, "jumps"),
        (1, "my"), (1, "mystery"), (1, "over"), (1, "police"),
        (1, "quick")]
    assert got == expected_counts

    # wave B (v1 → v2): delete phrase 2 — the CASCADE runs idsByWord
    # (books silent: fallback to its v1 content) then wordCounts
    # (Tests:440-543)
    timings = phrases.update(updates_from_table(upd_table([
        {"id": 2, "phrase": None, TYPE_COL: DELETE}])), 1)
    assert set(timings) == {"phrasesById", "idsByWord", "wordCounts"}

    got = table_of(store, "idsByWord", "content", 2, ["word", "wid"])
    expected_after = [
        ("a", 3), ("at", 3), ("brain", 1), ("brown", 1), ("brown", 3),
        ("brown", 4), ("colour", 4), ("dog", 3), ("dog", 3),
        ("favourite", 4), ("fox", 1), ("fox", 2), ("hall", 3),
        ("is", 2), ("is", 3), ("is", 4), ("lazy", 2), ("my", 4),
        ("mystery", 3), ("police", 1), ("quick", 1), ("sometimes", 2),
        ("sometimes", 3), ("the", 1), ("the", 1), ("the", 2), ("the", 3)]
    assert got == expected_after

    # the update feed of idsByWord (Tests:481-500): deletions for
    # jumps/over, "unnecessary upserts" for book 2's re-sent words
    feed = table_of(store, "idsByWord", "updates", 2,
                    ["word", "wid", TYPE_COL])
    expected_feed = [
        ("dog", 3, UPDATE), ("dog", 3, UPDATE),
        ("fox", 1, UPDATE), ("fox", 2, UPDATE),
        ("is", 2, UPDATE), ("is", 3, UPDATE), ("is", 4, UPDATE),
        ("jumps", None, DELETE),
        ("lazy", 2, UPDATE),
        ("over", None, DELETE),
        ("sometimes", 2, UPDATE), ("sometimes", 3, UPDATE),
        ("the", 1, UPDATE), ("the", 1, UPDATE), ("the", 2, UPDATE),
        ("the", 3, UPDATE)]
    assert feed == expected_feed

    got = table_of(store, "wordCounts", "content", 2, ["count", "word_v"])
    expected_counts2 = [
        (4, "the"), (3, "brown"), (3, "is"), (2, "dog"), (2, "fox"),
        (2, "sometimes"), (1, "a"), (1, "at"), (1, "brain"),
        (1, "colour"), (1, "favourite"), (1, "hall"), (1, "lazy"),
        (1, "my"), (1, "mystery"), (1, "police"), (1, "quick")]
    assert got == expected_counts2


WORDS_SPEC_SCHEMA = pa.schema([pa.field("id", INT), pa.field("w", STR)])


def word_gen_produce(key, values: pa.Table) -> pa.Table:
    words = values.column("w").to_pylist()
    return pa.table({
        "word": pa.array(words, type=STR),
        "wid": pa.array([0] * len(words), type=INT),  # overwritten by F9
    })


def test_preserving_values(stores):
    """Reference `PreservingValues` (Tests:558-672): surrogate ids
    copied from the previous version per target key, fresh ids in
    target-key order, id loss on delete + fresh id on re-add."""
    store = stores
    spec = StageSpec(
        name="words", produce=word_gen_produce,
        source_key=["id"], target_key=["word"],
        value_columns=["wid"], source_value_columns=["w"],
        out_schema=pa.schema([pa.field("word", STR), pa.field("wid", INT)]),
        source_schema=WORDS_SPEC_SCHEMA,
        preserver=SurrogateIdPreserver(id_column="wid"))
    words = Producer(store, spec)

    def upd(rows, v):
        words.update(updates_from_table(pa.Table.from_pylist(
            rows, schema=pa.schema(list(WORDS_SPEC_SCHEMA)
                                   + [pa.field(TYPE_COL, pa.int8())]))), v)

    upd([{"id": 1, "w": "dog", TYPE_COL: UPDATE},
         {"id": 1, "w": "budgie", TYPE_COL: UPDATE},
         {"id": 2, "w": "dog", TYPE_COL: UPDATE},
         {"id": 2, "w": "cat", TYPE_COL: UPDATE},
         {"id": 3, "w": "eagle", TYPE_COL: UPDATE},
         {"id": 3, "w": "dog", TYPE_COL: UPDATE},
         {"id": 3, "w": "cat", TYPE_COL: UPDATE}], 0)
    assert table_of(store, "words", "content", 1,
                    ["word", "_sk_id", "wid"]) == [
        ("budgie", 1, 1), ("cat", 2, 2), ("cat", 3, 2), ("dog", 1, 3),
        ("dog", 2, 3), ("dog", 3, 3), ("eagle", 3, 4)]
    feed = table_of(store, "words", "updates", 1,
                    ["word", "wid", TYPE_COL])
    assert feed == [
        ("budgie", 1, ADD), ("cat", 2, ADD), ("cat", 2, UPDATE),
        ("dog", 3, ADD), ("dog", 3, UPDATE), ("dog", 3, UPDATE),
        ("eagle", 4, ADD)]

    upd([{"id": 2, "w": "frog", TYPE_COL: UPDATE},
         {"id": 2, "w": "eagle", TYPE_COL: UPDATE},
         {"id": 2, "w": "ant", TYPE_COL: UPDATE}], 1)
    assert table_of(store, "words", "content", 2,
                    ["word", "_sk_id", "wid"]) == [
        ("ant", 2, 5), ("budgie", 1, 1), ("cat", 3, 2), ("dog", 1, 3),
        ("dog", 3, 3), ("eagle", 2, 4), ("eagle", 3, 4), ("frog", 2, 6)]

    upd([{"id": 1, "w": "dog", TYPE_COL: UPDATE},
         {"id": 1, "w": "frog", TYPE_COL: UPDATE}], 2)
    assert table_of(store, "words", "content", 3,
                    ["word", "_sk_id", "wid"]) == [
        ("ant", 2, 5), ("cat", 3, 2), ("dog", 1, 3), ("dog", 3, 3),
        ("eagle", 2, 4), ("eagle", 3, 4), ("frog", 1, 6), ("frog", 2, 6)]

    # budgie re-added in a later version → FRESH id 7, not 1
    upd([{"id": 1, "w": "dog", TYPE_COL: UPDATE},
         {"id": 1, "w": "budgie", TYPE_COL: UPDATE}], 3)
    assert table_of(store, "words", "content", 4,
                    ["word", "_sk_id", "wid"]) == [
        ("ant", 2, 5), ("budgie", 1, 7), ("cat", 3, 2), ("dog", 1, 3),
        ("dog", 3, 3), ("eagle", 2, 4), ("eagle", 3, 4), ("frog", 2, 6)]


def test_ranged_producer_matches_dataset_producer(stores, tmp_path):
    """The same 2-stage cascade on the range-partitioned store and on
    the Dataset store must produce identical content at every version
    (the ranged path additionally rewrites only touched partitions)."""
    from parquet_producers_ray.engine.pipeline import RangedProducer

    def specs():
        return (StageSpec(
            name="idsByWord2", produce=split_produce,
            source_key=["id"], target_key=["word"],
            value_columns=["wid"], source_value_columns=["phrase"],
            out_schema=pa.schema([pa.field("word", STR),
                                  pa.field("wid", INT)]),
            source_schema=TEXT_SCHEMA),
            StageSpec(
            name="wordCounts2", produce=count_produce,
            source_key=["word"], target_key=["count"],
            value_columns=["word_v"], source_value_columns=["wid"],
            out_schema=pa.schema([pa.field("count", INT),
                                  pa.field("word_v", STR)]),
            source_schema=pa.schema([pa.field("word", STR),
                                     pa.field("wid", INT)]),
            target_descending=[True]))

    s1, s2 = specs()
    mem_split = Producer(stores, s1)
    mem_counts = mem_split.produces(s2)
    r1, r2 = specs()
    rg_split = RangedProducer(str(tmp_path / "rg"), r1, target_rows=16)
    rg_counts = rg_split.produces(r2)

    waves = [
        [{"id": 1, "phrase": "a b b", TYPE_COL: UPDATE},
         {"id": 2, "phrase": "b c", TYPE_COL: UPDATE},
         {"id": 3, "phrase": "c c d", TYPE_COL: UPDATE}],
        [{"id": 2, "phrase": "e b", TYPE_COL: UPDATE}],
        [{"id": 1, "phrase": None, TYPE_COL: DELETE}],
    ]
    for v, rows in enumerate(waves):
        tbl = upd_table(rows)
        mem_split.update(updates_from_table(tbl), v)
        rg_split.update(tbl, v)

        for stage, rgp in (("idsByWord2", rg_split),
                           ("wordCounts2", rg_counts)):
            mem = stores.open_read(stage, "content", v + 1).take_all()
            rgc = rgp.mirror.content.read(v + 1)
            rg = rgc.take_all() if rgc is not None else []
            key = lambda r: tuple(sorted(r.items()))
            assert sorted(map(key, rg)) == sorted(map(key, mem)), \
                f"{stage} v{v+1}"


def test_preserving_values_on_ranged_store(ray_session, tmp_path):
    """The PreservingValues golden (Tests:558-672) through
    RangedProducer: ids preserved via range-pruned point lookups, the
    counter persisted in the stage state file."""
    from parquet_producers_ray.engine.pipeline import RangedProducer

    spec = StageSpec(
        name="wordsRanged", produce=word_gen_produce,
        source_key=["id"], target_key=["word"],
        value_columns=["wid"], source_value_columns=["w"],
        out_schema=pa.schema([pa.field("word", STR), pa.field("wid", INT)]),
        source_schema=WORDS_SPEC_SCHEMA,
        preserver=SurrogateIdPreserver(id_column="wid"))
    words = RangedProducer(str(tmp_path / "pv"), spec, target_rows=4)

    def upd(rows, v):
        words.update(pa.Table.from_pylist(
            rows, schema=pa.schema(list(WORDS_SPEC_SCHEMA)
                                   + [pa.field(TYPE_COL, pa.int8())])), v)

    def content(v):
        t = words.mirror.content.read(v).take_all()
        return sorted((r["word"], r["_sk_id"], r["wid"]) for r in t)

    upd([{"id": 1, "w": "dog", TYPE_COL: UPDATE},
         {"id": 1, "w": "budgie", TYPE_COL: UPDATE},
         {"id": 2, "w": "dog", TYPE_COL: UPDATE},
         {"id": 2, "w": "cat", TYPE_COL: UPDATE},
         {"id": 3, "w": "eagle", TYPE_COL: UPDATE},
         {"id": 3, "w": "dog", TYPE_COL: UPDATE},
         {"id": 3, "w": "cat", TYPE_COL: UPDATE}], 0)
    assert content(1) == [
        ("budgie", 1, 1), ("cat", 2, 2), ("cat", 3, 2), ("dog", 1, 3),
        ("dog", 2, 3), ("dog", 3, 3), ("eagle", 3, 4)]

    upd([{"id": 2, "w": "frog", TYPE_COL: UPDATE},
         {"id": 2, "w": "eagle", TYPE_COL: UPDATE},
         {"id": 2, "w": "ant", TYPE_COL: UPDATE}], 1)
    assert content(2) == [
        ("ant", 2, 5), ("budgie", 1, 1), ("cat", 3, 2), ("dog", 1, 3),
        ("dog", 3, 3), ("eagle", 2, 4), ("eagle", 3, 4), ("frog", 2, 6)]

    upd([{"id": 1, "w": "dog", TYPE_COL: UPDATE},
         {"id": 1, "w": "frog", TYPE_COL: UPDATE}], 2)
    upd([{"id": 1, "w": "dog", TYPE_COL: UPDATE},
         {"id": 1, "w": "budgie", TYPE_COL: UPDATE}], 3)
    # budgie re-added in a later version -> FRESH id 7
    assert content(4) == [
        ("ant", 2, 5), ("budgie", 1, 7), ("cat", 3, 2), ("dog", 1, 3),
        ("dog", 3, 3), ("eagle", 2, 4), ("eagle", 3, 4), ("frog", 2, 6)]


def test_empty_feed_cascade_through_parquet_store(ray_session, tmp_path):
    """A no-op update wave writes an EMPTY update feed; through
    ParquetStore that reads back as a zero-file, schema-less dataset
    (write_parquet emits no files for 0 rows) — the cascade must still
    carry version N+1 through every downstream stage unchanged."""
    from parquet_producers_ray.engine.io import ParquetStore

    store = ParquetStore(str(tmp_path / "store"))
    s1 = Producer(store, text_spec("s1"))
    s2 = s1.produces(text_spec("s2"))

    s1.update(updates_from_table(upd_table([
        {"id": 1, "phrase": "a", TYPE_COL: ADD},
        {"id": 2, "phrase": "b", TYPE_COL: ADD}])), 0)
    assert table_of(store, "s2", "content", 1, ["id", "phrase"]) == [
        (1, "a"), (2, "b")]

    # wave 2: update carrying identical values -> s1 emits an empty feed
    s1.update(updates_from_table(upd_table(
        [{"id": 1, "phrase": "a", TYPE_COL: ADD}])), 1)
    assert table_of(store, "s2", "content", 2, ["id", "phrase"]) == [
        (1, "a"), (2, "b")]

    # wave 3: an entirely empty external batch
    s1.update(updates_from_table(upd_table([])), 2)
    assert table_of(store, "s2", "content", 3, ["id", "phrase"]) == [
        (1, "a"), (2, "b")]


def test_preserving_values_distributed_join_path(stores, monkeypatch):
    """The PreservingValues golden again with the driver-set threshold
    forced to 0 so EVERY wave runs the distributed formulation
    (semi-join examples + sorted prefix-sum id allocation,
    produce._assign_surrogate_ids_join).  Ids must equal the
    sequential driver allocation exactly."""
    import parquet_producers_ray.engine.produce as prod

    monkeypatch.setattr(prod, "PRESERVE_JOIN_THRESHOLD", 0)
    store = stores
    spec = StageSpec(
        name="wordsJ", produce=word_gen_produce,
        source_key=["id"], target_key=["word"],
        value_columns=["wid"], source_value_columns=["w"],
        out_schema=pa.schema([pa.field("word", STR), pa.field("wid", INT)]),
        source_schema=WORDS_SPEC_SCHEMA,
        preserver=SurrogateIdPreserver(id_column="wid"))
    words = Producer(store, spec)

    def upd(rows, v):
        words.update(updates_from_table(pa.Table.from_pylist(
            rows, schema=pa.schema(list(WORDS_SPEC_SCHEMA)
                                   + [pa.field(TYPE_COL, pa.int8())]))), v)

    upd([{"id": 1, "w": "dog", TYPE_COL: UPDATE},
         {"id": 1, "w": "budgie", TYPE_COL: UPDATE},
         {"id": 2, "w": "dog", TYPE_COL: UPDATE},
         {"id": 2, "w": "cat", TYPE_COL: UPDATE},
         {"id": 3, "w": "eagle", TYPE_COL: UPDATE},
         {"id": 3, "w": "dog", TYPE_COL: UPDATE},
         {"id": 3, "w": "cat", TYPE_COL: UPDATE}], 0)
    assert table_of(store, "wordsJ", "content", 1,
                    ["word", "_sk_id", "wid"]) == [
        ("budgie", 1, 1), ("cat", 2, 2), ("cat", 3, 2), ("dog", 1, 3),
        ("dog", 2, 3), ("dog", 3, 3), ("eagle", 3, 4)]

    upd([{"id": 2, "w": "frog", TYPE_COL: UPDATE},
         {"id": 2, "w": "eagle", TYPE_COL: UPDATE},
         {"id": 2, "w": "ant", TYPE_COL: UPDATE}], 1)
    assert table_of(store, "wordsJ", "content", 2,
                    ["word", "_sk_id", "wid"]) == [
        ("ant", 2, 5), ("budgie", 1, 1), ("cat", 3, 2), ("dog", 1, 3),
        ("dog", 3, 3), ("eagle", 2, 4), ("eagle", 3, 4), ("frog", 2, 6)]

    upd([{"id": 1, "w": "dog", TYPE_COL: UPDATE},
         {"id": 1, "w": "frog", TYPE_COL: UPDATE}], 2)
    # budgie re-added later -> FRESH id 7, same as the driver path
    upd([{"id": 1, "w": "dog", TYPE_COL: UPDATE},
         {"id": 1, "w": "budgie", TYPE_COL: UPDATE}], 3)
    assert table_of(store, "wordsJ", "content", 4,
                    ["word", "_sk_id", "wid"]) == [
        ("ant", 2, 5), ("budgie", 1, 7), ("cat", 3, 2), ("dog", 1, 3),
        ("dog", 3, 3), ("eagle", 2, 4), ("eagle", 3, 4), ("frog", 2, 6)]


STAMP_SCHEMA = pa.schema([pa.field("id", INT), pa.field("w", STR),
                          pa.field("st", STR)])


def word_stamp_produce(key, values: pa.Table) -> pa.Table:
    return pa.table({"word": values.column("w"),
                     "st": values.column("st")})


def keep_created_stamp(new_rows: pa.Table, examples: pa.Table) -> pa.Table:
    """Copy the created-at stamp from the example previous value when
    one exists — the reference's canonical hook usage
    (ParquetProducerOptions.cs:20-27 Guid example)."""
    import pyarrow.compute as pc

    from parquet_producers_ray.engine.produce import EX_MARKER
    has = examples.column(EX_MARKER)
    st = pc.if_else(has, examples.column("st"), new_rows.column("st"))
    return pa.table({"st": st})


def _stamp_spec(name: str) -> StageSpec:
    from parquet_producers_ray.engine.model import KeyValuePreserver
    return StageSpec(
        name=name, produce=word_stamp_produce,
        source_key=["id"], target_key=["word"],
        value_columns=["st"], source_value_columns=["w", "st"],
        out_schema=pa.schema([pa.field("word", STR), pa.field("st", STR)]),
        source_schema=STAMP_SCHEMA,
        preserver=KeyValuePreserver(preserve=keep_created_stamp))


STAMP_WAVES = [
    # v0: ids 1,2 each contribute words stamped "v0"
    [{"id": 1, "w": "dog", "st": "v0", TYPE_COL: UPDATE},
     {"id": 1, "w": "cat", "st": "v0", TYPE_COL: UPDATE},
     {"id": 2, "w": "dog", "st": "v0", TYPE_COL: UPDATE},
     {"id": 2, "w": "emu", "st": "v0", TYPE_COL: UPDATE}],
    # v1: id 2 re-keys to dog+frog stamped "v1": dog must KEEP "v0"
    # (copied from the example previous value), frog is new -> "v1",
    # emu disappears with its only source
    [{"id": 2, "w": "dog", "st": "v1", TYPE_COL: UPDATE},
     {"id": 2, "w": "frog", "st": "v1", TYPE_COL: UPDATE}],
]

STAMP_V1 = [("cat", 1, "v0"), ("dog", 1, "v0"), ("dog", 2, "v0"),
            ("emu", 2, "v0")]
STAMP_V2 = [("cat", 1, "v0"), ("dog", 1, "v0"), ("dog", 2, "v0"),
            ("frog", 2, "v1")]


@pytest.mark.parametrize("threshold", [None, 0],
                         ids=["driver-set", "join-path"])
def test_general_key_value_preserver(stores, monkeypatch, threshold):
    """F9 in full generality: a KeyValuePreserver copying a NON-id
    persistent field (created-at stamp) from the example previous
    value, on both the broadcast-set and distributed-join paths."""
    if threshold is not None:
        import parquet_producers_ray.engine.produce as prod
        monkeypatch.setattr(prod, "PRESERVE_JOIN_THRESHOLD", threshold)
    store = stores
    name = f"stamps{'J' if threshold is not None else 'D'}"
    words = Producer(store, _stamp_spec(name))

    def upd(rows, v):
        words.update(updates_from_table(pa.Table.from_pylist(
            rows, schema=pa.schema(list(STAMP_SCHEMA)
                                   + [pa.field(TYPE_COL, pa.int8())]))), v)

    upd(STAMP_WAVES[0], 0)
    assert table_of(store, name, "content", 1,
                    ["word", "_sk_id", "st"]) == STAMP_V1
    upd(STAMP_WAVES[1], 1)
    assert table_of(store, name, "content", 2,
                    ["word", "_sk_id", "st"]) == STAMP_V2


def test_general_key_value_preserver_ranged(ray_session, tmp_path):
    """The same created-at-stamp hook through RangedProducer's
    range-pruned point-lookup path."""
    from parquet_producers_ray.engine.pipeline import RangedProducer

    words = RangedProducer(str(tmp_path / "kvp"), _stamp_spec("stampsR"),
                           target_rows=4)

    def upd(rows, v):
        words.update(pa.Table.from_pylist(
            rows, schema=pa.schema(list(STAMP_SCHEMA)
                                   + [pa.field(TYPE_COL, pa.int8())])), v)

    def content(v):
        t = words.mirror.content.read(v).take_all()
        return sorted((r["word"], r["_sk_id"], r["st"]) for r in t)

    upd(STAMP_WAVES[0], 0)
    assert content(1) == STAMP_V1
    upd(STAMP_WAVES[1], 1)
    assert content(2) == STAMP_V2


# -- Arbitrary-comparer orderings (F16: Util/Comparers.cs:11-39) ------------
# Mirrors the reference's compound supplier+amount TargetKeyComparer
# (TestCommand/Program.cs:29-33, ByAbsoluteAmountSupplierAndType): the
# derived ordering is (case-insensitive supplier, |amount|) — neither is
# column-lexicographic over the raw key — expressed as a
# derived_sort_key derivation that the engine computes, carries through
# every sort, and strips before persist.

TXN_SCHEMA = pa.schema([pa.field("txn_id", INT), pa.field("supplier", STR),
                        pa.field("amount", INT)])


def txn_produce(key, values: pa.Table) -> pa.Table:
    return pa.table({"supplier": values.column("supplier"),
                     "amount": values.column("amount"),
                     "txn": pa.array([key[0]] * len(values), type=INT)})


def _supplier_abs_order(tk: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    return pa.table({
        "sup_ci": pc.utf8_lower(tk.column("supplier")),
        "abs_amount": pc.abs(tk.column("amount")),
    })


def test_derived_sort_key_compound_comparer(stores):
    """Content/mapping/feed order follows the derived comparer, raw
    key columns persist unchanged and no _dk_ column leaks out."""
    spec = StageSpec(
        name="credits", produce=txn_produce,
        source_key=["txn_id"], target_key=["supplier", "amount"],
        value_columns=["txn"], source_value_columns=["supplier", "amount"],
        out_schema=pa.schema([pa.field("supplier", STR),
                              pa.field("amount", INT),
                              pa.field("txn", INT)]),
        source_schema=TXN_SCHEMA,
        derived_sort_key=_supplier_abs_order)
    prod = Producer(stores, spec)

    def upd(rows, v):
        prod.update(updates_from_table(pa.Table.from_pylist(
            rows, schema=pa.schema(list(TXN_SCHEMA)
                                   + [pa.field(TYPE_COL, pa.int8())]))), v)

    upd([{"txn_id": 1, "supplier": "acme", "amount": -50, TYPE_COL: UPDATE},
         {"txn_id": 2, "supplier": "Acme", "amount": 20, TYPE_COL: UPDATE},
         {"txn_id": 3, "supplier": "Zeta", "amount": -5, TYPE_COL: UPDATE},
         {"txn_id": 4, "supplier": "beta", "amount": 100, TYPE_COL: UPDATE},
         {"txn_id": 5, "supplier": "ACME", "amount": 20, TYPE_COL: UPDATE}],
        0)
    got = table_of(stores, "credits", "content", 1,
                   ["supplier", "amount", "txn"])
    # comparer order: (lower(supplier), |amount|), tie-break raw key
    assert got == [
        ("ACME", 20, 5), ("Acme", 20, 2), ("acme", -50, 1),
        ("beta", 100, 4), ("Zeta", -5, 3)]
    # derived columns never persist
    ds = stores.open_read("credits", "content", 1)
    assert not [c for c in ds.schema().names if c.startswith("_dk_")]

    # mappings: (sk, <comparer order>)
    m = table_of(stores, "credits", "key_mappings", 1,
                 ["_sk_txn_id", "supplier", "amount"])
    assert m == [(1, "acme", -50), (2, "Acme", 20), (3, "Zeta", -5),
                 (4, "beta", 100), (5, "ACME", 20)]

    # an update wave: the feed sorts in comparer order too and the
    # deleted key's single Delete lands in comparer position
    upd([{"txn_id": 3, "supplier": None, "amount": None,
          TYPE_COL: DELETE},
         {"txn_id": 1, "supplier": "acme", "amount": -50,
          TYPE_COL: UPDATE}], 1)
    feed = table_of(stores, "credits", "updates", 2,
                    ["supplier", "amount", TYPE_COL])
    assert feed == [("acme", -50, UPDATE), ("Zeta", -5, DELETE)]
    got2 = table_of(stores, "credits", "content", 2,
                    ["supplier", "amount", "txn"])
    assert got2 == [
        ("ACME", 20, 5), ("Acme", 20, 2), ("acme", -50, 1),
        ("beta", 100, 4)]


def test_derived_sort_key_with_surrogate_ids(stores, monkeypatch):
    """derived_sort_key + SurrogateIdPreserver: fresh ids allocate in
    COMPARER order (the reference allocates in TargetKeyComparer
    order), on both the driver-set and distributed-join paths."""
    import parquet_producers_ray.engine.produce as prod_mod

    for threshold, name in ((None, "cmpD"), (0, "cmpJ")):
        if threshold is not None:
            monkeypatch.setattr(prod_mod, "PRESERVE_JOIN_THRESHOLD",
                                threshold)
        spec = StageSpec(
            name=name, produce=txn_produce,
            source_key=["txn_id"], target_key=["supplier", "amount"],
            value_columns=["txn"],
            source_value_columns=["supplier", "amount"],
            out_schema=pa.schema([pa.field("supplier", STR),
                                  pa.field("amount", INT),
                                  pa.field("txn", INT)]),
            source_schema=TXN_SCHEMA,
            derived_sort_key=_supplier_abs_order,
            preserver=SurrogateIdPreserver(id_column="txn"))
        producer = Producer(stores, spec)
        producer.update(updates_from_table(pa.Table.from_pylist(
            [{"txn_id": 1, "supplier": "Zeta", "amount": -5,
              TYPE_COL: UPDATE},
             {"txn_id": 2, "supplier": "acme", "amount": -50,
              TYPE_COL: UPDATE},
             {"txn_id": 3, "supplier": "beta", "amount": 100,
              TYPE_COL: UPDATE}],
            schema=pa.schema(list(TXN_SCHEMA)
                             + [pa.field(TYPE_COL, pa.int8())]))), 0)
        got = table_of(stores, name, "content", 1,
                       ["supplier", "amount", "txn"])
        # ids 1..3 in comparer order acme < beta < Zeta (ci), not in
        # raw byte order (which would put Zeta before acme/beta)
        assert got == [("acme", -50, 1), ("beta", 100, 2),
                       ("Zeta", -5, 3)], (name, got)


# -- read_sources formulations: randomized differential ---------------------
# The broadcast-set path and the distributed semi-join path
# (_read_sources_join) must produce identical merged update streams on
# ANY input — the goldens pin the semantics, this pins the equivalence.

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_feeder_state = st.dictionaries(
    st.integers(0, 5),
    st.lists(st.text(alphabet="abc", min_size=1, max_size=2),
             min_size=1, max_size=2),
    min_size=0, max_size=4)
_feeder_feed = st.dictionaries(
    st.integers(0, 5),
    st.one_of(st.none(),
              st.lists(st.text(alphabet="abc", min_size=1, max_size=2),
                       min_size=1, max_size=2)),
    min_size=0, max_size=4)


def _mk_feeder(state: dict, feed: dict, spec):
    """(feed_ds, content_ds) tables in the engine's stored shapes."""
    import ray.data

    from parquet_producers_ray.engine.model import SEQ_COL
    from parquet_producers_ray.engine.pipeline import UPD_SEQ_COL

    crows = [{"id": k, "_sk_id": k, "phrase": v, SEQ_COL: i}
             for k in sorted(state) for i, v in enumerate(state[k])]
    content = pa.Table.from_pylist(crows, schema=pa.schema(
        [pa.field("id", INT), pa.field("_sk_id", INT),
         pa.field("phrase", STR), pa.field(SEQ_COL, INT)]))
    frows = []
    for k in sorted(feed):
        if feed[k] is None:
            frows.append({"id": k, "phrase": None, TYPE_COL: DELETE,
                          UPD_SEQ_COL: 0})
        else:
            for i, v in enumerate(feed[k]):
                frows.append({"id": k, "phrase": v, TYPE_COL: UPDATE,
                              UPD_SEQ_COL: i})
    feed_t = pa.Table.from_pylist(frows, schema=pa.schema(
        [pa.field("id", INT), pa.field("phrase", STR),
         pa.field(TYPE_COL, pa.int8()), pa.field(UPD_SEQ_COL, INT)]))
    return (ray.data.from_arrow(feed_t) if len(feed_t) else None,
            ray.data.from_arrow(content) if len(content) else None,
            spec)


@settings(max_examples=6, deadline=None)
@given(s1=_feeder_state, f1=_feeder_feed, s2=_feeder_state,
       f2=_feeder_feed)
def test_read_sources_formulations_agree(ray_session, s1, f1, s2, f2):
    from parquet_producers_ray.engine.pipeline import (UPD_SEQ_COL,
                                                       read_sources)

    up1, up2 = text_spec("fA"), text_spec("fB")
    feeders = [_mk_feeder(s1, f1, up1), _mk_feeder(s2, f2, up2)]
    outs = []
    for threshold in (None, 0):
        ds = read_sources(feeders, IDSBYWORD_SPEC, threshold=threshold)
        rows = sorted((r["id"], r[TYPE_COL], r["phrase"], r[UPD_SEQ_COL])
                      for r in ds.take_all())
        outs.append(rows)
    assert outs[0] == outs[1]


def test_engine_join_view_incremental(stores):
    """Incremental maintenance of the orders⋈lineitem GROUP BY view
    (reference README.md:234-236 incremental joins): after the
    bootstrap wave, delete one order and re-send another order's
    lineitems — the view updates through the cascade to exactly the
    recomputed answer, rewriting only delta-affected keys."""
    import numpy as np

    from parquet_producers_ray.engine.produce import updates_from_table
    from parquet_producers_ray.pipelines.queries import _join_view_specs

    feeder, j_spec, k_spec = _join_view_specs()
    store = stores
    ord_p = Producer(store, feeder("ordK"))
    line_p = Producer(store, feeder("lineK"))
    j_spec = j_spec.__class__(**{**j_spec.__dict__, "name": "ordRevT"})
    k_spec = k_spec.__class__(**{**k_spec.__dict__, "name": "custRevT"})
    join_p = Producer(store, j_spec, [ord_p, line_p])
    join_p.produces(k_spec)

    INTER = pa.schema([pa.field("okey", INT), pa.field("kind", STR),
                       pa.field("custkey", INT),
                       pa.field("amount", pa.float64())])

    def upd(rows, type_=UPDATE):
        t = pa.Table.from_pylist(rows, schema=INTER)
        t = t.append_column(TYPE_COL,
                            pa.array(np.full(len(t), type_, np.int8)))
        return updates_from_table(t)

    def orow(okey, cust):
        return {"okey": okey, "kind": "O", "custkey": cust,
                "amount": None}

    def lrow(okey, amt):
        # the interchange schema carries integer CENTS (queries.py
        # _join_view_specs: exact, summation-order-free aggregation);
        # custRev divides by 100 on output
        return {"okey": okey, "kind": "L", "custkey": None,
                "amount": float(amt) * 100.0}

    # bootstrap: cust 1 owns orders 10 (rev 5) and 20 (rev 7);
    # cust 2 owns order 30 (rev 11); order 40 has no lineitems
    ord_p._update_internal(upd([orow(10, 1), orow(20, 1), orow(30, 2),
                                orow(40, 2)]), 0)
    line_p._update_internal(upd([lrow(10, 2), lrow(10, 3), lrow(20, 7),
                                 lrow(30, 11)]), 0)
    join_p._update_from_sources(0)
    for t in join_p.targets:
        t._update_from_sources(0)

    def view(v):
        return sorted(
            (r["custkey"], r["total_revenue"])
            for r in store.open_read("custRevT", "content", v).take_all())

    assert view(1) == [(1, 12.0), (2, 11.0)]

    # delta: delete order 20 on BOTH sides; order 30's lineitems
    # re-sent with a new amount; order 40 gains its first lineitem
    ord_p._update_internal(upd([{"okey": 20, "kind": None,
                                 "custkey": None, "amount": None}],
                               DELETE), 1)
    line_delta = pa.Table.from_pylist(
        [lrow(30, 13), lrow(40, 1),
         {"okey": 20, "kind": None, "custkey": None, "amount": None}],
        schema=INTER).append_column(
            TYPE_COL, pa.array([UPDATE, UPDATE, DELETE], pa.int8()))
    line_p._update_internal(updates_from_table(line_delta), 1)
    join_p._update_from_sources(1)
    for t in join_p.targets:
        t._update_from_sources(1)
    # recomputed truth: cust1 keeps only order 10 (5); cust2 = order 30
    # re-priced to 13 + order 40's new lineitem 1 = 14
    assert view(2) == [(1, 5.0), (2, 14.0)]
