"""Multi-format ingestion: JSONL / CSV / WET-style readers all land on
the canonical webpage schema and feed the flagship encode unchanged.
The reference reads only Parquet (Parquet.Producers/Parquet/
ParquetReader.cs); these readers widen the source surface.
"""

import json
import os

import pyarrow as pa
import pyarrow.csv as pacsv
import pytest

from parquet_producers_ray.sources import ingest as I
from parquet_producers_ray.sources import webpages as W

ROWS = 400


@pytest.fixture(scope="module")
def table():
    return W.generate_table(ROWS)


@pytest.fixture(scope="module")
def src_sorted(table):
    return table.sort_by("url")


def test_jsonl_roundtrip(ray_session, table, src_sorted, tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    p = str(d / "a.jsonl")
    with open(p, "w") as f:
        for r in table.to_pylist():
            r["html"] = r["html"].decode()
            r["warc_ts"] = r["warc_ts"].isoformat()
            f.write(json.dumps(r) + "\n")
    got = pa.Table.from_pylist(I.read_webpages_jsonl(p).take_all(),
                               schema=W.SCHEMA)
    assert got.sort_by("url").equals(src_sorted)


def test_csv_partial_columns(ray_session, table, src_sorted,
                             tmp_path_factory):
    d = tmp_path_factory.mktemp("csv")
    p = str(d / "a.csv")
    pacsv.write_csv(table.select(["url", "warc_ts", "text", "lang"]), p)
    got = pa.Table.from_pylist(I.read_webpages_csv(p).take_all(),
                               schema=W.SCHEMA)
    assert got.num_rows == ROWS
    # absent html column loads as nulls; the rest round-trips
    assert got.column("html").null_count == ROWS
    gs = got.sort_by("url")
    for c in ("url", "warc_ts", "text", "lang"):
        assert gs.column(c).equals(src_sorted.column(c)), c


def test_wet_roundtrip_and_encode(ray_session, table, src_sorted,
                                  tmp_path_factory):
    d = tmp_path_factory.mktemp("wet")
    p = str(d / "a.wet")
    I.write_wet(table, p)
    ds = I.read_webpages_wet([p])
    got = pa.Table.from_pylist(ds.take_all(), schema=W.SCHEMA)
    gs = got.sort_by("url")
    for c in ("url", "warc_ts", "text"):
        assert gs.column(c).equals(src_sorted.column(c)), c
    # and the normalized Dataset feeds the flagship encode directly
    from parquet_producers_ray.pipelines import flagship as F
    out = str(tmp_path_factory.mktemp("wetenc"))
    man = F.encode_pipeline(I.read_webpages_wet([p]), out, num_buckets=2)
    s = F.summarize(man)
    assert s["rows"] == ROWS and s["partitions"] == 2
    back = pa.Table.from_pylist(F.decode_pipeline(out).take_all(),
                                schema=W.SCHEMA)
    assert back.sort_by("url").column("text").equals(
        src_sorted.column("text"))


def test_wet_gzip_transparent(ray_session, table, src_sorted,
                              tmp_path_factory):
    """Real Common-Crawl WET segments ship as *.warc.wet.gz — the
    reader must decompress by extension and produce identical rows."""
    import gzip

    d = tmp_path_factory.mktemp("wetgz")
    plain = str(d / "a.wet")
    I.write_wet(table, plain)
    gz = str(d / "a.warc.wet.gz")
    with open(plain, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    got = pa.Table.from_pylist(I.read_webpages_wet([gz]).take_all(),
                               schema=W.SCHEMA).sort_by("url")
    for c in ("url", "warc_ts", "text"):
        assert got.column(c).equals(src_sorted.column(c)), c


def test_warc_roundtrip_html_bytes(ray_session, table, src_sorted,
                                   tmp_path_factory):
    """WARC response records carry the raw html BYTES (not valid UTF-8
    necessarily); the reader must round-trip them exactly and leave
    text/lang null for the extraction stage."""
    import gzip

    d = tmp_path_factory.mktemp("warc")
    # make one body non-UTF-8 to prove byte-exactness
    html = table.column("html").to_pylist()
    html[0] = b"\xff\xfe<raw>" + bytes(range(256))
    t2 = table.set_column(table.column_names.index("html"), "html",
                          pa.array(html, pa.large_binary()))
    p = str(d / "a.warc")
    I.write_warc(t2, p)
    gz = str(d / "a.warc.gz")
    with open(p, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    for src in (p, gz):
        got = pa.Table.from_pylist(I.read_webpages_warc([src]).take_all(),
                                   schema=W.SCHEMA).sort_by("url")
        want = t2.sort_by("url")
        assert got.column("url").equals(want.column("url"))
        assert got.column("html").equals(want.column("html"))
        assert got.column("warc_ts").equals(want.column("warc_ts"))
        assert got.column("text").null_count == got.num_rows


def test_curate_encode_from_warc(ray_session, table, tmp_path_factory):
    """End-to-end: WARC (html only) → extraction → quality filter →
    exact dedup → encoded store.  Injected duplicate html collapses to
    the smallest url; every stored text is the html extraction."""
    import numpy as np

    from parquet_producers_ray.functions.text import extract_text_from_html
    from parquet_producers_ray.pipelines import flagship as F
    from parquet_producers_ray.pipelines.curation import (
        curate_encode_pipeline)

    d = tmp_path_factory.mktemp("curate")
    # duplicate row 0's html under a LARGER url so the keeper is row 0
    html = table.column("html").to_pylist()
    urls = table.column("url").to_pylist()
    html.append(html[0])
    urls.append("https://zzz.example/dup")
    t2 = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(
            table.column("warc_ts").to_pylist()
            + [table.column("warc_ts")[0].as_py()], pa.timestamp("us")),
        "html": pa.array(html, pa.large_binary()),
    })
    p = str(d / "crawl.warc")
    I.write_warc(t2, p)

    out = str(tmp_path_factory.mktemp("curstore"))
    man = curate_encode_pipeline(I.read_webpages_warc([p]), out,
                                 min_tokens=5, num_buckets=2)
    s = F.summarize(man)
    back = pa.Table.from_pylist(F.decode_pipeline(out).take_all(),
                                schema=W.SCHEMA)
    # dup collapsed: the zzz url must not survive, row count <= input
    assert "https://zzz.example/dup" not in back.column("url").to_pylist()
    assert s["rows"] == back.num_rows <= table.num_rows
    # every stored text equals the extraction of its html
    want = extract_text_from_html(back.column("html").combine_chunks())
    assert back.column("text").combine_chunks().equals(want)
    # quality floor holds
    ntok = np.array([len(t.split()) for t in
                     back.column("text").to_pylist()])
    assert (ntok >= 5).all()


def test_warc_real_format_z_dates_and_1_1(ray_session, tmp_path_factory):
    """Real Common-Crawl records use WARC/1.1 headers and Z-suffixed
    UTC WARC-Dates ("2017-03-22T17:15:02Z") — both must parse (the
    repo's own writer emits zone-less 1.0, so this fixture is
    hand-built in the real wire format)."""
    d = tmp_path_factory.mktemp("warc11")
    body = b"<html>hello</html>"
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    rec = (b"WARC/1.1\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: https://example.com/a\r\n"
           b"WARC-Date: 2017-03-22T17:15:02Z\r\n"
           b"Content-Length: %d\r\n\r\n" % len(http)) + http + b"\r\n\r\n"
    rec2 = (b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: https://example.com/b\r\n"
            b"WARC-Date: 2018-01-02T03:04:05+00:00\r\n"
            b"Content-Length: %d\r\n\r\n" % len(http)) + http + b"\r\n\r\n"
    p = str(d / "a.warc")
    with open(p, "wb") as f:
        f.write(rec + rec2)
    got = pa.Table.from_pylist(I.read_webpages_warc([p]).take_all(),
                               schema=W.SCHEMA).sort_by("url")
    assert got.num_rows == 2
    assert got.column("url").to_pylist() == [
        "https://example.com/a", "https://example.com/b"]
    import datetime as dt
    assert got.column("warc_ts").to_pylist() == [
        dt.datetime(2017, 3, 22, 17, 15, 2),
        dt.datetime(2018, 1, 2, 3, 4, 5)]
    assert got.column("html").to_pylist() == [body, body]

    # WET sibling: same Z-date + 1.1 tolerance
    wet = (b"WARC/1.1\r\n"
           b"WARC-Type: conversion\r\n"
           b"WARC-Target-URI: https://example.com/c\r\n"
           b"WARC-Date: 2017-03-22T17:15:02Z\r\n"
           b"Content-Length: 5\r\n\r\nhello\r\n\r\n")
    pw = str(d / "a.wet")
    with open(pw, "wb") as f:
        f.write(wet)
    gw = pa.Table.from_pylist(I.read_webpages_wet([pw]).take_all(),
                              schema=W.SCHEMA)
    assert gw.num_rows == 1
    assert gw.column("text").to_pylist() == ["hello"]
    assert gw.column("warc_ts").to_pylist() == [
        dt.datetime(2017, 3, 22, 17, 15, 2)]


def test_warc_wet_writers_skip_null_keys(ray_session, tmp_path_factory):
    """Writers skip rows missing url or warc_ts instead of crashing
    (they are exported alongside the readers, not just test fixtures)."""
    import datetime as dt

    d = tmp_path_factory.mktemp("nulls")
    t = pa.table({
        "url": pa.array(["https://x/1", None, "https://x/3"]),
        "warc_ts": pa.array([dt.datetime(2020, 1, 1), dt.datetime(2020, 1, 2),
                             None], pa.timestamp("us")),
        "text": pa.array(["a", "b", "c"]),
        "html": pa.array([b"<a>", b"<b>", b"<c>"], pa.large_binary()),
    })
    pw = str(d / "n.wet")
    I.write_wet(t, pw)
    gw = pa.Table.from_pylist(I.read_webpages_wet([pw]).take_all(),
                              schema=W.SCHEMA)
    assert gw.column("url").to_pylist() == ["https://x/1"]
    pc_ = str(d / "n.warc")
    I.write_warc(t, pc_)
    gc = pa.Table.from_pylist(I.read_webpages_warc([pc_]).take_all(),
                              schema=W.SCHEMA)
    assert gc.column("url").to_pylist() == ["https://x/1"]


def test_wet_roundtrip_byte_exact_payloads(ray_session, tmp_path):
    """Regression: the WET parser split on the record magic and
    rstripped newlines, corrupting payloads that end in newlines or
    contain 'WARC/1.0' lines themselves.  Content-Length is now
    authoritative, so both survive exactly."""
    import datetime

    import pyarrow as pa

    from parquet_producers_ray.sources.ingest import (read_webpages_wet,
                                                      write_wet)

    ts = datetime.datetime(2017, 3, 22, 17, 15, 2)
    texts = ["hello\nworld\n\n",
             "before\r\nWARC/1.0\r\nafter",
             "plain"]
    t = pa.table({
        "url": pa.array([f"http://e.com/{i}" for i in range(3)]),
        "warc_ts": pa.array([ts] * 3, pa.timestamp("us")),
        "text": pa.array(texts)})
    p = str(tmp_path / "x.warc.wet")
    write_wet(t, p)
    back = read_webpages_wet([p]).to_pandas().sort_values("url")
    assert list(back["text"]) == texts


def test_warc_headers_decode_utf8_uris(ray_session, tmp_path):
    """WARC/ISO-28500 headers are UTF-8: a non-ASCII WARC-Target-URI
    must come back as the same unicode string the CSV reader would
    produce for that URL (latin-1 decoding mojibakes it and breaks
    cross-source key joins)."""
    import datetime

    import pyarrow as pa

    from parquet_producers_ray.sources.ingest import (read_webpages_warc,
                                                      read_webpages_wet,
                                                      write_warc, write_wet)

    ts = datetime.datetime(2017, 3, 22, 17, 15, 2)
    url = "http://münchen.example/straße/π"
    t = pa.table({
        "url": pa.array([url]),
        "warc_ts": pa.array([ts], pa.timestamp("us")),
        "text": pa.array(["körper text"])})
    p = str(tmp_path / "u.warc.wet")
    write_wet(t, p)
    back = read_webpages_wet([p]).take_all()
    assert back[0]["url"] == url

    th = pa.table({
        "url": pa.array([url]),
        "warc_ts": pa.array([ts], pa.timestamp("us")),
        "html": pa.array(["<p>ok</p>".encode()], pa.large_binary())})
    ph = str(tmp_path / "u.warc")
    write_warc(th, ph)
    backh = read_webpages_warc([ph]).take_all()
    assert backh[0]["url"] == url


def test_wet_zstd_transparent(ray_session, tmp_path):
    """.zst record files stream through pyarrow's zstd codec — same
    contract as the gzip transparency."""
    import datetime

    import pyarrow as pa

    from parquet_producers_ray.sources.ingest import (read_webpages_wet,
                                                      write_wet)

    ts = datetime.datetime(2017, 3, 22, 17, 15, 2)
    t = pa.table({
        "url": pa.array([f"http://z.com/{i}" for i in range(4)]),
        "warc_ts": pa.array([ts] * 4, pa.timestamp("us")),
        "text": pa.array([f"zstd body {i}\n" for i in range(4)])})
    plain = str(tmp_path / "x.warc.wet")
    write_wet(t, plain)
    zpath = str(tmp_path / "x.warc.wet.zst")
    with open(plain, "rb") as f:
        raw = f.read()
    with pa.CompressedOutputStream(zpath, "zstd") as z:
        z.write(raw)
    back = read_webpages_wet([zpath]).to_pandas().sort_values("url")
    assert list(back["text"]) == t.column("text").to_pylist()
