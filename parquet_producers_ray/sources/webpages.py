"""Deterministic synthetic Common-Crawl-style web-page table.

Schema per ``BASELINE.json`` ``input_hint`` / FIXTURES.md F-1:
``url:string (unique, Zipf-skewed hosts), warc_ts:timestamp[us] (narrow
range), html:large_binary (templated markup wrapping text, repeated tag
runs), text:string (seeded token soup), lang:string (~20 skewed
values)``.

Generation is seeded and shard-pure: ``generate_shard(shard, rows,
seed)`` depends only on its arguments, so Ray tasks can build any
slice independently and two runs produce byte-identical tables.
The correctness invariant carried from the reference's golden-equality
discipline (SURVEY.md §5): ``extract_text(html)`` is byte-identical to
``text`` for every ``url``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SCHEMA = pa.schema([
    pa.field("url", pa.string(), nullable=False),
    pa.field("warc_ts", pa.timestamp("us")),
    pa.field("html", pa.large_binary()),
    pa.field("text", pa.string()),
    pa.field("lang", pa.string()),
])

N_HOSTS = 100
HOST_ZIPF = 1.2
LANGS = ["en", "zh", "es", "de", "fr", "ru", "ja", "pt", "it", "nl",
         "pl", "tr", "ar", "ko", "sv", "cs", "fi", "el", "he", "da"]
_VOCAB_RNG = np.random.default_rng(1234)
VOCAB = np.array(
    ["".join(_VOCAB_RNG.choice(list("abcdefghijklmnopqrstuvwxyz"),
                               size=int(_VOCAB_RNG.integers(3, 10))))
     for _ in range(512)])

_VOCAB_PA = pa.array(list(VOCAB), type=pa.string())

_PRE = b'<html><head><title>page</title></head><body>'
_MAIN_OPEN = b"<main>"
_MAIN_CLOSE = b"</main>"
_PAD_UNIT = b'<div class="pad"></div>'
_POST = b"</body></html>"
BASE_TS_US = 1_700_000_000_000_000  # narrow range: ~7 days of microseconds


def _zipf_probs(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


_HOSTS = np.array([f"www.site{i:03d}.example" for i in range(N_HOSTS)])
_HOST_P = _zipf_probs(N_HOSTS, HOST_ZIPF)
_LANG_P = _zipf_probs(len(LANGS), 1.1)


def generate_shard(shard: int, rows: int, seed: int = 42) -> pa.Table:
    """Pure function of (shard, rows, seed) → one Arrow table shard."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, shard]))
    base = shard * rows

    host_idx = rng.choice(N_HOSTS, size=rows, p=_HOST_P)
    urls = pa.array([f"https://{_HOSTS[h]}/p/{base + i:010x}"
                     for i, h in enumerate(host_idx)], type=pa.string())

    ts = BASE_TS_US + rng.integers(0, 7 * 86_400_000_000, size=rows)
    warc_ts = pa.array(ts, type=pa.int64()).cast(pa.timestamp("us"))

    # token-soup text from a small vocabulary (FSST/dict friendly)
    ntok = rng.integers(20, 200, size=rows)
    total_tok = int(ntok.sum())
    if total_tok >= 2 ** 31:
        raise ValueError(
            f"shard too large for 32-bit list offsets ({total_tok} "
            "tokens); generate more, smaller shards instead")
    flat = rng.integers(0, len(VOCAB), size=total_tok)
    offsets = np.zeros(rows + 1, dtype=np.int32)
    offsets[1:] = np.cumsum(ntok)
    words = _VOCAB_PA.take(pa.array(flat))
    lists = pa.ListArray.from_arrays(pa.array(offsets), words)
    text = pc.binary_join(lists, " ")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()

    # html = template wrapping text, with long repeated tag runs
    pad_counts = pa.array(rng.integers(1, 40, size=rows), type=pa.int64())
    pad = pc.binary_repeat(pa.scalar(_PAD_UNIT, type=pa.binary()), pad_counts)
    html = pc.binary_join_element_wise(
        pa.scalar(_PRE, type=pa.binary()),
        pad.cast(pa.binary()),
        pa.scalar(_MAIN_OPEN, type=pa.binary()),
        text.cast(pa.binary()),
        pa.scalar(_MAIN_CLOSE, type=pa.binary()),
        pa.scalar(_POST, type=pa.binary()),
        pa.scalar(b"", type=pa.binary()),  # null_handling placeholder sep
    )

    lang = pa.array(np.array(LANGS)[rng.choice(len(LANGS), size=rows,
                                               p=_LANG_P)])
    return pa.table({
        "url": urls,
        "warc_ts": warc_ts,
        "html": html.cast(pa.large_binary()),
        "text": text,
        "lang": lang,
    }).cast(SCHEMA)


def generate_table(rows: int, seed: int = 42,
                   shard_rows: int = 65536) -> pa.Table:
    shards = []
    s = 0
    while s * shard_rows < rows:
        take = min(shard_rows, rows - s * shard_rows)
        t = generate_shard(s, shard_rows, seed)
        shards.append(t.slice(0, take) if take < shard_rows else t)
        s += 1
    return pa.concat_tables(shards) if shards else SCHEMA.empty_table()


def extract_text(html: pa.Array) -> pa.Array:
    """Vectorized extraction of the <main>…</main> payload from html.

    Byte-identical to the generator's ``text`` column — the per-row
    invariant from ``BASELINE.json`` ``input_hint``.
    """
    html = html.cast(pa.large_binary())
    n = len(html)
    if n == 0:
        return pa.array([], type=pa.string())
    offs = np.frombuffer(html.buffers()[1], dtype=np.int64)[
        html.offset: html.offset + n + 1]
    start_rel = pc.find_substring(html, _MAIN_OPEN).to_numpy(
        zero_copy_only=False).astype(np.int64)
    end_rel = pc.find_substring(html, _MAIN_CLOSE).to_numpy(
        zero_copy_only=False).astype(np.int64)
    if (start_rel < 0).any() or (end_rel < start_rel).any():
        raise ValueError("html rows without <main> markers")
    data = np.frombuffer(html.buffers()[2], dtype=np.uint8)
    src_start = offs[:-1] + start_rel + len(_MAIN_OPEN)
    out_len = end_rel - start_rel - len(_MAIN_OPEN)
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    out_offsets[1:] = np.cumsum(out_len)
    total = int(out_offsets[-1])
    rep_src = np.repeat(src_start, out_len)
    rep_out = np.repeat(out_offsets[:-1], out_len)
    idx = rep_src + (np.arange(total) - rep_out)
    out = data[idx]
    arr = pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(out_offsets.tobytes()), pa.py_buffer(out.tobytes())])
    return arr.cast(pa.string())


def webpages_parquet(rows: int, seed: int = 42,
                     cache_dir: str = "/tmp/ppray_webpages") -> str:
    """Write (or reuse) a cached parquet file of the synthetic table."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"webpages_r{rows}_s{seed}.parquet")
    if not os.path.exists(path):
        # pid-suffixed temp: concurrent cold-cache callers must not
        # interleave writes into one file before the atomic rename
        tmp = f"{path}.{os.getpid()}.tmp"
        pq.write_table(generate_table(rows, seed), tmp,
                       row_group_size=65536)
        os.replace(tmp, path)
    return path
