"""Text-analysis kernels for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, and document
fingerprinting.  All vectorized pyarrow.compute / NumPy over Arrow
batches — no per-row Python in the hot path.

These extend the reference's user-space scalar-function pattern (U14,
SURVEY.md §2.2 — arbitrary expressions inside ``Produce``) to the
operations a web-scale corpus pipeline needs; the reference itself has
none of them (SURVEY.md §2 "not present" list).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Tiny per-language marker vocabularies for the n-gram/stopword
# language-ID heuristic.  Deliberately small and deterministic.
LANG_MARKERS = {
    "en": ["the", "a", "is", "and", "of", "to", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein", "nicht"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "les", "des"],
}

FNV_OFFSET = np.uint64(14695981039346656037)
FNV_PRIME = np.uint64(1099511628211)


def split_tokens(text: pa.Array):
    """Whitespace tokenization → list<string> (vectorized)."""
    return pc.split_pattern(text, " ")


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    toks = split_tokens(batch.column(text_col))
    n_tokens = pc.list_value_length(toks).cast(pa.int64())
    # BPE-ish subword estimate: ceil(chars/4) per token is the common
    # rule-of-thumb; vectorized as ceil((len(text)-spaces)/4)
    n_chars = pc.utf8_length(batch.column(text_col)).cast(pa.int64())
    n_spaces = pc.subtract(n_tokens, 1)
    payload = pc.subtract(n_chars, n_spaces)
    n_subwords = pc.cast(pc.ceil(pc.divide(
        pc.cast(payload, pa.float64()), 4.0)), pa.int64())
    return pa.table({
        "n_tokens": n_tokens,
        "n_subwords": n_subwords,
    })


# GPT-2-style pre-tokenizer shape: contractions, letter runs, digit
# runs, punctuation runs, whitespace — RE2 syntax so the Arrow kernel
# and the DuckDB oracle count identically.
BPE_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
               r"| ?[^\sA-Za-z0-9]+|\s+")


def bpe_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Exact BPE-ish pre-token count per doc via one vectorized RE2
    scan (``pc.count_substring_regex``) — the regex-family counterpart
    of the whitespace count in :func:`token_counts`."""
    n = pc.count_substring_regex(batch.column(text_col),
                                 BPE_PATTERN).cast(pa.int64())
    return pa.table({"n_bpe_tokens": n})


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / mean-word-length / stopword-ratio quality signals."""
    text = batch.column(text_col)
    toks = split_tokens(text)
    n_tokens = pc.list_value_length(toks).cast(pa.int64())
    n_chars = pc.utf8_length(text).cast(pa.float64())
    mean_word_len = pc.divide(
        pc.subtract(n_chars, pc.cast(pc.subtract(n_tokens, 1),
                                     pa.float64())),
        pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64()))
    flat = pc.list_flatten(toks)
    is_stop = pc.is_in(flat, value_set=pa.array(LANG_MARKERS["en"]))
    stop_by_doc = _sum_by_list_parent(toks, is_stop)
    stop_ratio = pc.divide(
        pc.cast(stop_by_doc, pa.float64()),
        pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64()))
    return pa.table({
        "n_tokens": n_tokens,
        "mean_word_len": mean_word_len,
        "stopword_ratio": stop_ratio,
    })


def _sum_by_list_parent(lists, flat_bool) -> pa.Array:
    """Sum a flat boolean array back into per-list totals."""
    lengths = pc.list_value_length(lists).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = flat_bool.to_numpy(zero_copy_only=False).astype(np.int64)
    parents = np.repeat(np.arange(len(lengths)), lengths)
    sums = np.bincount(parents, weights=flat, minlength=len(lengths))
    return pa.array(sums.astype(np.int64))


def langid_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-marker language-ID: argmax language by marker-token
    ratio; 'und' (undetermined) when the best ratio is < 0.05."""
    text = batch.column(text_col)
    toks = split_tokens(pc.utf8_lower(text))
    n_tokens = pc.max_element_wise(
        pc.list_value_length(toks).cast(pa.int64()), 1)
    flat = pc.list_flatten(toks)
    best_ratio = np.zeros(len(batch))
    best_lang = np.full(len(batch), "und", dtype=object)
    for lang in sorted(LANG_MARKERS):
        hits = pc.is_in(flat, value_set=pa.array(LANG_MARKERS[lang]))
        per_doc = _sum_by_list_parent(toks, hits).to_numpy(
            zero_copy_only=False).astype(np.float64)
        ratio = per_doc / n_tokens.to_numpy(zero_copy_only=False)
        better = ratio > best_ratio
        best_ratio = np.where(better, ratio, best_ratio)
        best_lang = np.where(better, lang, best_lang)
    best_lang = np.where(best_ratio >= 0.05, best_lang, "und")
    return pa.table({
        "lang_pred": pa.array(list(best_lang), type=pa.string()),
        "lang_score": pa.array(best_ratio, type=pa.float64()),
    })


def fnv1a_hash(arr: pa.Array) -> np.ndarray:
    """Vectorized 64-bit FNV-1a over a string/binary column — the
    deterministic document fingerprint (and the dedup grouping digest).
    Pure function of the bytes, identical across processes/platforms."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    binvals = arr.cast(pa.large_binary())
    if isinstance(binvals, pa.ChunkedArray):
        binvals = binvals.combine_chunks()
    n = len(binvals)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    offs = np.frombuffer(binvals.buffers()[1], dtype=np.int64)[
        binvals.offset: binvals.offset + n + 1]
    base = int(offs[0])
    dbuf = binvals.buffers()[2]
    data = (np.frombuffer(dbuf, dtype=np.uint8)[base: base + int(offs[-1])
                                                - base]
            if dbuf is not None else np.zeros(0, dtype=np.uint8))
    offs = offs - base
    out = np.full(n, FNV_OFFSET, dtype=np.uint64)
    lens = np.diff(offs)
    max_len = int(lens.max()) if n else 0
    # column-parallel FNV: process byte position k of every live string
    with np.errstate(over="ignore"):
        for k in range(max_len):
            live = lens > k
            idx = offs[:-1][live] + k
            out[live] = (out[live] ^ data[idx].astype(np.uint64)) \
                * FNV_PRIME
    return out


def fingerprints(batch: pa.Table, text_col: str = "text") -> pa.Table:
    return pa.table({
        "fingerprint": pa.array(fnv1a_hash(batch.column(text_col))
                                .astype(np.int64)),  # two's complement
    })


WINNOW_BASE = np.uint64(1099511628211)


def winnow_fingerprints(batch: pa.Table, id_col: str = "doc_id",
                        text_col: str = "text", kgram: int = 8,
                        window: int = 4) -> pa.Table:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003): polynomial rolling hash of every ``kgram``-byte
    shingle, then keep each ``window``'s minimum hash (rightmost on
    ties) — a position-robust selection whose density is 2/(window+1),
    the standard local fingerprinting scheme for near-dup detection.

    Fully vectorized over the batch's flat byte buffer: the rolling
    hashes are ``kgram`` shifted multiply-adds over all docs at once and
    the window minimum is one ``sliding_window_view`` reduction; doc
    boundaries are masked, never crossed.  Output exploded rows
    ``(doc_id, pos, fp)`` with ``pos`` the shingle offset inside the
    doc."""
    col = batch.column(text_col).combine_chunks().cast(pa.large_binary())
    n = len(col)
    out_empty = pa.table({id_col: batch.column(id_col).slice(0, 0),
                          "pos": pa.array([], pa.int64()),
                          "fp": pa.array([], pa.int64())})
    if n == 0:
        return out_empty
    offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset: col.offset + n + 1]
    base = int(offs[0])
    dbuf = col.buffers()[2]
    data = (np.frombuffer(dbuf, dtype=np.uint8)[base: base + int(offs[-1])
                                                - base]
            if dbuf is not None else np.zeros(0, dtype=np.uint8))
    offs = offs - base
    total = len(data)
    if total < kgram:
        return out_empty
    # rolling k-gram hashes over the FLAT buffer (boundary-crossing
    # positions masked below): h[i] = sum data[i+j] * B^(k-1-j)
    nh = total - kgram + 1
    with np.errstate(over="ignore"):
        h = np.zeros(nh, dtype=np.uint64)
        for j in range(kgram):
            h = h * WINNOW_BASE + data[j: j + nh].astype(np.uint64)
    # per-position doc id; a shingle at flat pos i belongs to doc d iff
    # i + kgram <= offs[d+1]
    doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))[:nh]
    valid_h = h.copy()
    doc_end = offs[1:][doc_of]
    valid = (np.arange(nh) + kgram) <= doc_end
    valid_h[~valid] = np.uint64(0xFFFFFFFFFFFFFFFF)
    if nh < window:
        return out_empty
    from numpy.lib.stride_tricks import sliding_window_view
    wins = sliding_window_view(valid_h, window)          # (nh-w+1, w)
    # rightmost minimum per window (winnowing tie rule)
    rev_arg = np.argmin(wins[:, ::-1], axis=1)
    sel = np.arange(len(wins)) + (window - 1 - rev_arg)  # global position
    # a window is usable iff it lies entirely within one doc's shingles
    wstart = np.arange(len(wins))
    same_doc = doc_of[wstart] == doc_of[wstart + window - 1]
    w_ok = same_doc & valid[wstart] & valid[wstart + window - 1]
    sel = sel[w_ok]
    # overlapping windows re-select the same position — dedupe
    sel = np.unique(sel)
    ids = batch.column(id_col).combine_chunks()
    return pa.table({
        id_col: ids.take(pa.array(doc_of[sel])),
        "pos": pa.array(sel - offs[:-1][doc_of[sel]], type=pa.int64()),
        "fp": pa.array(h[sel].view(np.int64)),
    })


def window_hash_rows(batch: pa.Table, id_col: str = "doc_id",
                     text_col: str = "text",
                     kgram: int = 32) -> pa.Table:
    """Per-doc DISTINCT rolling hashes of every ``kgram``-byte window —
    the candidate key of exact-substring (sequence-level) dedup: two
    docs share a window hash iff they share that exact byte window
    (modulo 64-bit collisions, which an oracle replaying the identical
    hash sees identically).  Same flat-buffer vectorization as
    winnow_fingerprints, minus the winnow selection: every valid
    position's hash, deduplicated per doc before the exchange (the
    shuffle ships one row per DISTINCT (doc, window) pair)."""
    col = batch.column(text_col).combine_chunks().cast(pa.large_binary())
    n = len(col)
    empty = pa.table({id_col: batch.column(id_col).slice(0, 0),
                      "h": pa.array([], pa.int64())})
    if n == 0:
        return empty
    offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset: col.offset + n + 1]
    base = int(offs[0])
    dbuf = col.buffers()[2]
    data = (np.frombuffer(dbuf, dtype=np.uint8)[base: base + int(offs[-1])
                                                - base]
            if dbuf is not None else np.zeros(0, dtype=np.uint8))
    offs = offs - base
    total = len(data)
    if total < kgram:
        return empty
    nh = total - kgram + 1
    with np.errstate(over="ignore"):
        h = np.zeros(nh, dtype=np.uint64)
        for j in range(kgram):
            h = h * WINNOW_BASE + data[j: j + nh].astype(np.uint64)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))[:nh]
    valid = (np.arange(nh) + kgram) <= offs[1:][doc_of]
    idx = np.flatnonzero(valid)
    d, hv = doc_of[idx], h[idx]
    order = np.lexsort((hv, d))
    d, hv = d[order], hv[order]
    first = np.ones(len(d), dtype=bool)
    first[1:] = (d[1:] != d[:-1]) | (hv[1:] != hv[:-1])
    d, hv = d[first], hv[first]
    ids = batch.column(id_col).combine_chunks()
    return pa.table({id_col: ids.take(pa.array(d)),
                     "h": pa.array(hv.view(np.int64))})


def extract_text_from_html(html: pa.Array) -> pa.Array:
    """Html → visible text, fully vectorized (three RE2 passes + a
    whitespace collapse — the WARC-body → `text` extraction stage; a
    production pipeline swaps in a DOM-aware extractor behind the same
    column-in/column-out signature).  RE2 has no backreferences, so
    script and style blocks are removed in separate passes.  Bytes
    decode as UTF-8; invalid sequences fall back to a per-batch lossy
    decode (crawl bodies are not guaranteed valid UTF-8)."""
    if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
        try:
            html = html.cast(pa.string())
        except pa.ArrowInvalid:
            html = pa.array(
                [None if v is None else v.decode("utf-8", "replace")
                 for v in html.to_pylist()], pa.string())
    s = pc.replace_substring_regex(
        html, r"(?is)<script[^>]*>.*?</script>", " ")
    s = pc.replace_substring_regex(
        s, r"(?is)<style[^>]*>.*?</style>", " ")
    s = pc.replace_substring_regex(s, r"<[^>]*>", " ")
    s = pc.replace_substring_regex(s, r"\s+", " ")
    return pc.utf8_trim_whitespace(s)


def repetition_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1: repetitious documents are low-quality): per document, the
    fraction of word-2-gram instances taken by the single most frequent
    2-gram (``top2gram_frac``) and the fraction of 2-gram instances
    whose 2-gram occurs more than once (``dup2gram_frac``).  Documents
    with fewer than two tokens score 0.0 on both.

    Fully vectorized: 2-grams are built from the split offsets like
    ngram_counts, per-(doc, gram) counts come from one block-local
    Arrow group_by, and the per-doc max / duplicate-sum are numpy
    scatter reductions — zero exchanges, zero per-row Python."""
    import pyarrow.compute as pc

    words = pc.split_pattern(batch.column(text_col), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    ndocs = len(words)
    offs = words.offsets.to_numpy().astype(np.int64)
    base = offs[0]
    n_per_doc = np.diff(offs)
    grams_n = np.maximum(n_per_doc - 1, 0)
    zero = pa.table({
        "top2gram_frac": pa.array(np.zeros(ndocs), pa.float64()),
        "dup2gram_frac": pa.array(np.zeros(ndocs), pa.float64())})
    if int(grams_n.sum()) == 0:
        return zero
    mask = np.ones(int(offs[-1] - base), dtype=bool)
    last = offs[1:] - 1                        # last token per doc
    mask[last[last >= base] - base] = False
    lefts = np.flatnonzero(mask) + base
    vals = words.values
    grams = pc.binary_join_element_wise(
        vals.take(pa.array(lefts)), vals.take(pa.array(lefts + 1)), " ")
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), grams_n)
    cnt = (pa.table({"d": pa.array(doc_idx), "g": grams})
           .group_by(["d", "g"]).aggregate([("g", "count")]))
    d_arr = cnt.column("d").to_numpy(zero_copy_only=False)
    c_arr = cnt.column("g_count").to_numpy(zero_copy_only=False)
    mx = np.zeros(ndocs, dtype=np.int64)
    np.maximum.at(mx, d_arr, c_arr)
    dup = np.zeros(ndocs, dtype=np.int64)
    np.add.at(dup, d_arr, np.where(c_arr > 1, c_arr, 0))
    denom = np.maximum(grams_n, 1).astype(np.float64)
    return pa.table({
        "top2gram_frac": pa.array(
            np.where(grams_n > 0, mx / denom, 0.0)),
        "dup2gram_frac": pa.array(
            np.where(grams_n > 0, dup / denom, 0.0))})
