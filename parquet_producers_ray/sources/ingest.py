"""Alternative ingestion formats for the web-page pipeline.

The flagship consumes Parquet (`pipelines/flagship.py::read_input`),
but Common-Crawl-style corpora also arrive as JSONL dumps, CSV exports
and WET-style record streams.  Each reader here yields a
`ray.data.Dataset` normalized to the canonical webpage schema
(`sources/webpages.py::SCHEMA` — BASELINE.json ``input_hint``), so any
of them can feed `encode_pipeline` unchanged.  The reference engine
reads only Parquet (`Parquet.Producers/Parquet/ParquetReader.cs`);
multi-format ingestion is part of this engine's wider source surface.

Scale notes: all three build on Ray Data's file-based readers, so the
unit of parallelism is the input file — shard a 100 TB corpus into
many files and every reader streams.  Normalization runs as a
`map_batches` over Arrow batches (casts + timestamp parse), zero
Python rows.
"""

from __future__ import annotations

import re

import pyarrow as pa

from .webpages import SCHEMA


def _normalize(batch: pa.Table) -> pa.Table:
    """Cast a loosely-typed batch onto the canonical webpage schema.

    Accepts `warc_ts` as timestamp or ISO-8601 string, `html` as
    binary or (JSON/CSV-transported) string; missing `text`/`lang`
    become nulls so partially-populated dumps still load."""
    cols = {}
    for field in SCHEMA:
        if field.name not in batch.column_names:
            cols[field.name] = pa.nulls(batch.num_rows, field.type)
            continue
        arr = batch.column(field.name).combine_chunks()
        if arr.type == field.type:
            cols[field.name] = arr
        else:
            # one cast covers every transported representation —
            # including ISO-8601 `warc_ts` strings (Arrow parses them
            # with or without fractional seconds)
            cols[field.name] = arr.cast(field.type)
    return pa.table(cols, schema=SCHEMA)


def read_webpages_jsonl(paths) -> "ray.data.Dataset":  # noqa: F821
    """JSONL corpus → canonical webpage Dataset.

    JSON cannot carry raw bytes, so `html` travels as a UTF-8 string
    (lossless for markup) and is cast back to binary here."""
    import ray.data
    return (ray.data.read_json(paths)
            .map_batches(_normalize, batch_format="pyarrow"))


def read_webpages_csv(paths) -> "ray.data.Dataset":  # noqa: F821
    import ray.data
    return (ray.data.read_csv(paths)
            .map_batches(_normalize, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# WET-style record stream (the Common-Crawl extracted-text container):
# each record is a small header block ("WARC/1.0", "WARC-Target-URI:",
# "WARC-Date:", "Content-Length:") followed by the payload text and a
# blank-line separator.  Parsed vectorized: one split per file, then
# numpy field extraction — no per-record Python loop over lines.

_HDR_URI = "WARC-Target-URI: "
_HDR_DATE = "WARC-Date: "

# Any WARC/1.x minor version (real Common Crawl ships both 1.0 and
# 1.1); matching only 1.0 would silently drop 1.1 records.
_WARC_MAGIC_BYTES_RE = re.compile(rb"WARC/1\.\d+\r\n")


def _ts_array(tss: list) -> pa.Array:
    """WARC-Date strings → timestamp('us').  Real WARC dates are UTC
    with a 'Z' suffix ("2017-03-22T17:15:02Z"), which Arrow's plain
    timestamp cast rejects ("expected no zone offset"); normalize by
    stripping a trailing 'Z' or '+00:00' before the cast.  Non-UTC
    offsets are left for the cast to reject loudly rather than
    silently mislabeled."""
    norm = [None if t is None
            else t[:-1] if t.endswith("Z")
            else t[:-6] if t.endswith("+00:00")
            else t
            for t in tss]
    return pa.array(norm, pa.string()).cast(pa.timestamp("us"))


def write_wet(table: pa.Table, path: str) -> None:
    """Serialize a webpage table as a WET-style record stream (test
    fixture / interchange helper; payload is the `text` column)."""
    with open(path, "wb") as f:
        for row in table.select(["url", "warc_ts", "text"]).to_pylist():
            ts = row["warc_ts"]
            if row["url"] is None or ts is None:
                continue    # a record needs both; skip rather than crash
            payload = (row["text"] or "").encode()
            f.write(b"WARC/1.0\r\n")
            f.write(b"WARC-Type: conversion\r\n")
            f.write(_HDR_URI.encode() + row["url"].encode() + b"\r\n")
            f.write(_HDR_DATE.encode()
                    + ts.isoformat().encode() + b"\r\n")
            f.write(b"Content-Length: %d\r\n" % len(payload))
            f.write(b"\r\n")
            f.write(payload)
            f.write(b"\r\n\r\n")


def _parse_wet_bytes(blob: bytes) -> pa.Table:
    """Length-delimited scan, Content-Length authoritative (the same
    discipline as ``_parse_warc_bytes``): payload bytes survive
    EXACTLY — including trailing newlines and text that itself
    contains ``WARC/1.0`` lines, both of which a magic-split +
    rstrip parser silently corrupts.  Records without Content-Length
    (non-conforming producers) fall back to splitting at the next
    record magic, with the record separator trimmed."""
    urls, tss, texts = [], [], []
    pos = 0
    n = len(blob)
    while True:
        m = _WARC_MAGIC_BYTES_RE.search(blob, pos)
        if m is None:
            break
        head_end = blob.find(b"\r\n\r\n", m.start())
        if head_end < 0:
            break
        # WARC (ISO 28500 §4) headers are UTF-8; decoding latin-1 here
        # would mojibake non-ASCII WARC-Target-URIs and break key joins
        # against the CSV reader's representation of the same URL.
        # Offsets stay byte-based, so the decode never shifts the scan.
        head = blob[m.end():head_end].decode("utf-8", "replace")
        url = ts = None
        clen = -1
        for line in head.split("\r\n"):
            if line.startswith(_HDR_URI):
                url = line[len(_HDR_URI):]
            elif line.startswith(_HDR_DATE):
                ts = line[len(_HDR_DATE):]
            elif line.startswith(_HDR_CLEN):
                clen = int(line[len(_HDR_CLEN):])
        content_start = head_end + 4
        if clen >= 0:
            body = blob[content_start:content_start + clen]
            pos = min(content_start + clen, n)
        else:
            nxt = _WARC_MAGIC_BYTES_RE.search(blob, content_start)
            end = nxt.start() if nxt else n
            body = blob[content_start:end].rstrip(b"\r\n")
            pos = end
        if url is None:
            continue
        urls.append(url)
        tss.append(ts)
        texts.append(body.decode("utf-8", "replace"))
    t = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": _ts_array(tss),
        "text": pa.array(texts, pa.string()),
    })
    return _normalize(t)


def _read_record_files(paths, parse_fn) -> "ray.data.Dataset":  # noqa: F821
    """Shared loader for WET/WARC record streams: one task per file
    (the 100 TB regime is tens of thousands of ~1 GiB segment files —
    exactly Ray Data's file-parallel shape), gzip- AND
    zstd-transparent by extension (.zst/.zstd stream through
    pyarrow's zstd codec — no extra dependency), directory paths
    expanded to their sorted entries."""
    import gzip
    import os

    import ray.data

    def _load(batch: pa.Table) -> pa.Table:
        tables = []
        for p in batch.column("path").to_pylist():
            if p.endswith((".zst", ".zstd")):
                blob = pa.input_stream(p, compression="zstd").read()
                tables.append(parse_fn(bytes(blob)))
                continue
            opener = gzip.open if p.endswith(".gz") else open
            with opener(p, "rb") as f:
                tables.append(parse_fn(f.read()))
        return pa.concat_tables(tables) if tables \
            else SCHEMA.empty_table()

    if isinstance(paths, str):
        paths = ([os.path.join(paths, p) for p in sorted(os.listdir(paths))]
                 if os.path.isdir(paths) else [paths])
    return (ray.data.from_items([{"path": p} for p in paths])
            .map_batches(_load, batch_format="pyarrow", batch_size=1))


def read_webpages_wet(paths) -> "ray.data.Dataset":  # noqa: F821
    """WET-style record files → canonical webpage Dataset (html/lang
    null — WET carries extracted text only)."""
    return _read_record_files(paths, _parse_wet_bytes)


# ---------------------------------------------------------------------------
# WARC-style response records (the raw-crawl container: WET's sibling
# that CARRIES THE HTML).  Each record is a WARC header block
# ("WARC/1.0", "WARC-Type: response", "WARC-Target-URI:", "WARC-Date:",
# "Content-Length:") followed by an HTTP response (status line +
# headers, blank line, body) — the html payload is the HTTP body,
# length-delimited by Content-Length so binary bodies survive.  Like
# the WET reader this is a per-file task (gzip transparent by
# extension); `text`/`lang` load as nulls for a downstream extraction
# stage to fill, which is exactly the real division of labour between
# a crawl and its text-extraction pass.

_WARC_TYPE = "WARC-Type: "
_HDR_CLEN = "Content-Length: "


def write_warc(table: pa.Table, path: str) -> None:
    """Serialize (url, warc_ts, html) as WARC-style response records
    (test fixture / interchange helper)."""
    with open(path, "wb") as f:
        for row in table.select(["url", "warc_ts", "html"]).to_pylist():
            if row["url"] is None or row["warc_ts"] is None:
                continue    # a record needs both; skip rather than crash
            body = row["html"] or b""
            http = (b"HTTP/1.1 200 OK\r\n"
                    b"Content-Type: text/html\r\n\r\n") + body
            f.write(b"WARC/1.0\r\n")
            f.write(b"WARC-Type: response\r\n")
            f.write(_HDR_URI.encode() + row["url"].encode() + b"\r\n")
            f.write(_HDR_DATE.encode()
                    + row["warc_ts"].isoformat().encode() + b"\r\n")
            f.write(_HDR_CLEN.encode()
                    + str(len(http)).encode() + b"\r\n")
            f.write(b"\r\n")
            f.write(http)
            f.write(b"\r\n\r\n")


def _parse_warc_bytes(blob: bytes) -> pa.Table:
    """Length-delimited scan: headers decode as UTF-8 (ISO 28500 §4 —
    same policy as ``_parse_wet_bytes``, so a non-ASCII target URI
    joins bit-identically against the CSV reader's form of the same
    URL), bodies stay raw bytes — html is NOT assumed valid UTF-8."""
    urls, tss, bodies = [], [], []
    pos = 0
    n = len(blob)
    while True:
        m = _WARC_MAGIC_BYTES_RE.search(blob, pos)
        if m is None:
            break
        start = m.start()
        head_end = blob.find(b"\r\n\r\n", start)
        if head_end < 0:
            break
        head = blob[m.end():head_end].decode("utf-8", "replace")
        url = ts = None
        clen = -1
        rtype = ""
        for line in head.split("\r\n"):
            if line.startswith(_HDR_URI):
                url = line[len(_HDR_URI):]
            elif line.startswith(_HDR_DATE):
                ts = line[len(_HDR_DATE):]
            elif line.startswith(_HDR_CLEN):
                clen = int(line[len(_HDR_CLEN):])
            elif line.startswith(_WARC_TYPE):
                rtype = line[len(_WARC_TYPE):]
        content_start = head_end + 4
        pos = (content_start + clen) if clen >= 0 else content_start
        pos = min(pos, n)
        if url is None or clen < 0 or rtype != "response":
            continue
        content = blob[content_start:content_start + clen]
        # body = HTTP payload after the response headers
        sep = content.find(b"\r\n\r\n")
        body = content[sep + 4:] if sep >= 0 else content
        urls.append(url)
        tss.append(ts)
        bodies.append(body)
    t = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": _ts_array(tss),
        "html": pa.array(bodies, pa.large_binary()),
    })
    return _normalize(t)


def read_webpages_warc(paths) -> "ray.data.Dataset":  # noqa: F821
    """WARC-style response files → canonical webpage Dataset (html
    populated, text/lang null until an extraction stage fills them)."""
    return _read_record_files(paths, _parse_warc_bytes)
