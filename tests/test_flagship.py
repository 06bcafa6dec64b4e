"""Flagship pipeline tests: synthetic web-page table → bucketed encode
→ manifests → decode, asserting the reference's golden round-trip
discipline (byte-identical columns, `extract_text(html) == text` per
url — BASELINE.json input_hint) plus checkpoint resume.
"""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_producers_ray.engine import manifest as mf
from parquet_producers_ray.sources import webpages as W
from parquet_producers_ray.stages.encode import (EncoderPool, decode_segment,
                                                 encode_table)

ROWS = 3000


@pytest.fixture(scope="module")
def table():
    return W.generate_table(ROWS)


def test_generator_deterministic(table):
    assert table.equals(W.generate_table(ROWS))
    assert table.schema.equals(W.SCHEMA)
    # urls unique
    assert len(set(table.column("url").to_pylist())) == ROWS


def test_extract_text_invariant(table):
    ext = W.extract_text(table.column("html").combine_chunks())
    assert ext.equals(table.column("text").combine_chunks())


def test_encode_table_roundtrip(table):
    seg, choices = encode_table(table)
    back = decode_segment(seg)
    assert back.equals(table)
    assert set(choices) == set(table.column_names)


def test_encoder_pool_state_reuse(table):
    pool = EncoderPool()
    seg1 = pool(table.slice(0, 1500))
    seg2 = pool(table.slice(1500, 1500))
    # pinned codecs + shared fsst tables after first batch
    assert pool.pinned is not None
    t1, t2 = decode_segment(seg1), decode_segment(seg2)
    assert pa.concat_tables([t1, t2]).equals(table)


@pytest.fixture(scope="module")
def encoded_dir(ray_session, table, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("flagship"))
    src = os.path.join(out, "input.parquet")
    pq.write_table(table, src)
    from parquet_producers_ray.pipelines import flagship as F

    man = F.encode_pipeline(rd.read_parquet(src), out + "/enc",
                            num_buckets=8)
    summary = F.summarize(man)
    return out, summary


def test_pipeline_roundtrip_bit_identical(encoded_dir, table):
    from parquet_producers_ray.pipelines import flagship as F

    out, summary = encoded_dir
    assert summary["partitions"] == 8
    assert summary["rows"] == ROWS
    back = F.decode_pipeline(out + "/enc").take_all()
    orig = table.sort_by("url").to_pylist()
    back_sorted = sorted(back, key=lambda r: r["url"])
    assert len(back_sorted) == len(orig)
    for a, b in zip(back_sorted, orig):
        assert a == b


def test_compressed_size_beats_plain_parquet(encoded_dir, table):
    out, summary = encoded_dir
    plain = os.path.getsize(os.path.join(out, "input.parquet"))
    assert summary["stored_bytes"] <= plain


def test_resume_skips_completed_partitions(encoded_dir):
    import ray.data as rd

    from parquet_producers_ray.pipelines import flagship as F

    out, _ = encoded_dir
    man2 = F.encode_pipeline(rd.read_parquet(os.path.join(out, "input.parquet")),
                             out + "/enc", num_buckets=8)
    s2 = F.summarize(man2)
    assert s2["skipped_partitions"] == 8

    # corrupt one manifest → that partition (only) is redone
    mans = sorted(f for f in os.listdir(out + "/enc")
                  if f.endswith(".manifest.json"))
    os.remove(os.path.join(out + "/enc", mans[0]))
    man3 = F.encode_pipeline(rd.read_parquet(os.path.join(out, "input.parquet")),
                             out + "/enc", num_buckets=8)
    s3 = F.summarize(man3)
    assert s3["skipped_partitions"] == 7
    assert len(mf.list_manifests(out + "/enc")) == 8


def test_decode_segments_batch_coalesced(ray_session):
    """Ray may coalesce several encode outputs into one block; the
    decode stage must split on segment boundaries (repeated column
    name) and reassemble all rows."""
    from parquet_producers_ray.stages.encode import (decode_segments_batch,
                                                     encode_table)

    t1 = pa.table({"k": ["a", "b"], "v": [1, 2]})
    t2 = pa.table({"k": ["c", None], "v": [3, None]})
    seg1, _ = encode_table(t1)
    seg2, _ = encode_table(t2)
    merged = pa.concat_tables([seg1, seg2])
    out = decode_segments_batch(merged)
    assert out.equals(pa.concat_tables([t1, t2]))


def test_decode_metrics_per_partition(encoded_dir):
    from parquet_producers_ray.pipelines import flagship as F

    out, _ = encoded_dir
    metrics = F.decode_metrics_pipeline(out + "/enc").take_all()
    assert len(metrics) == 8
    assert sorted(m["part"] for m in metrics) == list(range(8))
    total_rows = sum(m["rows"] for m in metrics)
    assert total_rows == ROWS
    assert all(m["decoded_bytes"] > 0 and m["decode_sec"] >= 0
               for m in metrics)


def test_interrupted_run_resume_bit_identical(encoded_dir, table, tmp_path):
    """BASELINE criterion 'kill mid-run, re-run': simulate a crash that
    left some partitions missing, one mid-replace (.tmp orphan) and one
    manifest orphaned; the resumed run must skip completed partitions
    and produce byte-identical outputs to an uninterrupted run."""
    import ray.data as rd

    from parquet_producers_ray.pipelines import flagship as F

    out, _ = encoded_dir
    clean = out + "/enc"
    src = os.path.join(out, "input.parquet")

    crashed = str(tmp_path / "crashed")
    F.summarize(F.encode_pipeline(rd.read_parquet(src), crashed,
                                  num_buckets=8).materialize())
    # simulate the crash: two partitions vanish entirely, one is caught
    # mid-replace (.tmp orphan, data+manifest gone), one manifest lost
    for part in (1, 3):
        dp, mp = mf.partition_paths(crashed, part)
        os.remove(dp)
        os.remove(mp)
    dp5, mp5 = mf.partition_paths(crashed, 5)
    os.rename(dp5, dp5 + ".tmp")
    os.remove(mp5)
    dp6, mp6 = mf.partition_paths(crashed, 6)
    os.remove(mp6)

    man = F.encode_pipeline(rd.read_parquet(src), crashed, num_buckets=8)
    s = F.summarize(man)
    assert s["skipped_partitions"] == 4          # 0,2,4,7 untouched
    for part in range(8):
        dp_a, _ = mf.partition_paths(clean, part)
        dp_b, _ = mf.partition_paths(crashed, part)
        with open(dp_a, "rb") as fa, open(dp_b, "rb") as fb:
            assert fa.read() == fb.read(), part


def test_decode_column_pruned(encoded_dir, table):
    from parquet_producers_ray.pipelines import flagship as F

    out, _ = encoded_dir
    ds = F.decode_pipeline(out + "/enc", columns=["url", "lang"])
    got = ds.take_all()
    assert len(got) == ROWS
    assert set(got[0].keys()) == {"url", "lang"}
    want = {r["url"]: r["lang"] for r in
            table.select(["url", "lang"]).to_pylist()}
    for r in got:
        assert want[r["url"]] == r["lang"]
    # the store really is row-group-per-column, so the pruned read can
    # skip the html/text payload bytes at the Parquet layer
    f = mf.list_partition_files(out + "/enc")[0]
    md = pq.ParquetFile(f).metadata
    assert md.num_row_groups == len(table.column_names)


def test_lookup_partition_pruned(encoded_dir, table):
    from parquet_producers_ray.pipelines import flagship as F

    out, _ = encoded_dir
    urls = table.column("url").to_pylist()[::700]  # a handful, spread out
    got = F.lookup(out + "/enc", urls)
    assert got.num_rows == len(urls)
    by_url = {r["url"]: r for r in got.to_pylist()}
    src = {r["url"]: r for r in table.to_pylist() if r["url"] in set(urls)}
    assert by_url == src
    # column-pruned lookup
    got2 = F.lookup(out + "/enc", urls, columns=["text"])
    assert set(got2.column_names) == {"url", "text"}
    assert {r["url"]: r["text"] for r in got2.to_pylist()} == \
        {u: src[u]["text"] for u in urls}
    # absent keys: empty result, correct schema
    none = F.lookup(out + "/enc", ["https://nosuch.example/x"])
    assert none.num_rows == 0
    assert none.schema.equals(table.schema)


def test_resume_reuses_meta_num_buckets(encoded_dir):
    import ray.data as rd

    from parquet_producers_ray.pipelines import flagship as F

    out, _ = encoded_dir
    # resume WITHOUT passing num_buckets: _meta.json pins it to the
    # original 8 (a different count would orphan completed partitions)
    man = F.encode_pipeline(
        rd.read_parquet(os.path.join(out, "input.parquet")), out + "/enc")
    s = F.summarize(man)
    assert s["partitions"] == 8
    assert s["skipped_partitions"] == 8


def test_verify_store_detects_tampering(encoded_dir):
    import json as _json

    from parquet_producers_ray.pipelines import flagship as F

    out, _ = encoded_dir
    rows = F.verify_store(out + "/enc").take_all()
    assert len(rows) == 8
    assert all(r["rows_ok"] and r["digest_ok"] for r in rows)
    # tamper one manifest's digest: exactly that partition flags
    man_path = mf.partition_paths(out + "/enc", rows[0]["part"])[1]
    with open(man_path) as f:
        original = f.read()
    man = _json.loads(original)
    man["key_digest"] = "0" * 16
    with open(man_path, "w") as f:
        _json.dump(man, f)
    try:
        rows2 = F.verify_store(out + "/enc").take_all()
        bad = [r for r in rows2 if not r["digest_ok"]]
        assert [r["part"] for r in bad] == [rows[0]["part"]]
    finally:
        with open(man_path, "w") as f:
            f.write(original)


def test_recompress_preserves_data_and_resumes(encoded_dir, table,
                                               tmp_path_factory):
    from parquet_producers_ray.pipelines import flagship as F

    out, _ = encoded_dir
    dst = str(tmp_path_factory.mktemp("recmp")) + "/store"
    s1 = F.summarize(F.recompress_pipeline(out + "/enc", dst))
    assert s1["rows"] == ROWS and s1["skipped_partitions"] == 0
    back = F.decode_pipeline(dst).take_all()
    orig = table.sort_by("url").to_pylist()
    assert sorted(back, key=lambda r: r["url"]) == orig
    # second run: every partition skips
    s2 = F.summarize(F.recompress_pipeline(out + "/enc", dst))
    assert s2["skipped_partitions"] == s1["partitions"]
    # the migrated store answers point lookups (meta carried over)
    got = F.lookup(dst, [orig[0]["url"]])
    assert got.num_rows == 1 and got.to_pylist()[0] == orig[0]


@pytest.mark.parametrize("exchange,compression", [
    ("object_store", None),
    ("object_store", "zstd"),
])
def test_exchange_backend_parity(encoded_dir, table, tmp_path,
                                 exchange, compression):
    """Every exchange backend (storage spills — the default the
    `encoded_dir` fixture used — object-store raw rows, object-store
    zstd-packed blobs) must produce an identical store: same
    partitions, same stored bytes, bit-identical decode."""
    import ray.data as rd

    from parquet_producers_ray.pipelines import flagship as F

    out, summary = encoded_dir
    src = os.path.join(out, "input.parquet")
    alt = str(tmp_path / f"{exchange}_{compression}")
    man = F.encode_pipeline(rd.read_parquet(src), alt, num_buckets=8,
                            exchange=exchange,
                            shuffle_compression=compression)
    s2 = F.summarize(man)
    assert s2["partitions"] == summary["partitions"]
    assert s2["rows"] == summary["rows"]
    # bucket membership is a pure function of the data: per-partition
    # contents (hence encoded bytes) match across backends exactly
    assert s2["stored_bytes"] == summary["stored_bytes"]
    back = sorted(F.decode_pipeline(alt).take_all(),
                  key=lambda r: r["url"])
    orig = table.sort_by("url").to_pylist()
    assert back == orig
    # the storage backend consumed and removed its spills
    assert not os.path.exists(os.path.join(out + "/enc", "_shuffle")) or \
        not os.listdir(os.path.join(out + "/enc", "_shuffle"))


def test_storage_exchange_duplicate_blocks_lossless(ray_session, tmp_path):
    """Regression: spill names were content digests of each slice's
    key column, so two input blocks with identical key content (e.g.
    literally duplicated input shards — recrawls, double-uploaded
    files) collided and one block's rows silently vanished.  Names now
    carry a per-invocation tag and reducers consume exactly the files
    the materialized spill manifest records."""
    import ray.data as rd

    from parquet_producers_ray.pipelines import flagship as F
    from parquet_producers_ray.sources.webpages import generate_shard

    t = generate_shard(0, 500)
    ds = rd.from_arrow([t, t])          # two byte-identical blocks
    out = str(tmp_path / "enc")
    man = F.encode_pipeline(ds, out, num_buckets=4)
    summary = F.summarize(man)
    assert summary["rows"] == 1000      # both copies survive
    back = F.decode_pipeline(out).take_all()
    assert len(back) == 1000


def test_storage_reduce_partial_spill_loss(ray_session, tmp_path):
    """A reduce retry that finds SOME but not ALL manifest-recorded
    spill files (a prior attempt died mid-rmtree) must NOT encode the
    surviving subset over a complete partition — that is silent row
    loss.  With no completed partition manifest it raises; with one it
    resumes (skipped row), exactly like the all-missing branch."""
    import json

    from parquet_producers_ray.pipelines.flagship import \
        StorageBucketEncoder
    from parquet_producers_ray.sources.webpages import generate_shard

    t = generate_shard(0, 50)
    shuffle = tmp_path / "shuffle"
    d = shuffle / "b00000"
    d.mkdir(parents=True)
    opts = pa.ipc.IpcWriteOptions(compression="lz4")
    for name in ("s1.arrows", "s2.arrows"):
        with pa.OSFile(str(d / name), "wb") as f, \
                pa.ipc.new_stream(f, t.schema, options=opts) as w:
            w.write_table(t)
    (d / "s2.arrows").unlink()          # partial loss
    batch = pa.table({
        "part": pa.array([0], pa.int64()),
        "files": pa.array([json.dumps(["s1.arrows", "s2.arrows"])])})

    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    enc = StorageBucketEncoder(out, str(shuffle))
    with pytest.raises(RuntimeError, match="partial spill loss"):
        enc(batch)

    # a completed partition manifest flips the same call into a resume
    enc._encode_group(0, pa.concat_tables([t, t]))
    rows = enc(batch).to_pylist()
    assert len(rows) == 1 and rows[0]["skipped"]
    assert not os.path.exists(d)        # stale spills swept
