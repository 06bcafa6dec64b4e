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


# --------------------------------------------------------------------------
# REAL byte-pair encoding (Sennrich, Haddow & Birch, ACL 2016 — "Neural
# Machine Translation of Rare Words with Subword Units", Algorithm 1),
# character-level over lowercase alpha pre-tokens.  Training is
# deterministic (tie-break: higher count first, then lexicographically
# smaller pair), so the merge table below is PINNED and replayable —
# the SQL oracle embeds the identical table as a map literal and
# re-derives every token count with a recursive CTE.

BPE_WORD_RE = r"[a-z]+"      # pre-tokens: maximal lowercase-alpha runs


def _bpe_merge_word(syms: tuple, pair: tuple) -> tuple:
    """Merge all non-overlapping occurrences of ``pair``, leftmost
    first (the Sennrich replacement step)."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if (i + 1 < n and syms[i] == pair[0] and syms[i + 1] == pair[1]):
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(word_counts: dict, num_merges: int = 48) -> list:
    """Learn ``num_merges`` BPE merges from a {word: count} sample.
    Stops early when the best pair occurs only once (no statistical
    signal).  Deterministic: ties break to the lexicographically
    smallest pair, so retraining on the same sample reproduces the
    pinned table bit-for-bit (pinned by
    tests/test_functions.py::test_bpe_pinned_merges_reproduce)."""
    vocab = {}
    for w, c in word_counts.items():
        syms = tuple(w)
        vocab[syms] = vocab.get(syms, 0) + int(c)
    merges = []
    for _ in range(num_merges):
        pairs: dict = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        vocab = {_bpe_merge_word(syms, best): c
                 for syms, c in vocab.items()}
    return merges


# Trained on the sf0.001 documents corpus (lowercase [a-z]+ pre-token
# frequencies), num_merges=48 — regenerate with
# tools/train_bpe_merges.py; test_bpe_pinned_merges_reproduce asserts
# training still yields exactly this table.
PINNED_BPE_MERGES: list = [
    ('e', 'r'), ('o', 'r'), ('i', 'n'), ('o', 'w'),
    ('s', 't'), ('l', 'u'), ('a', 'r'), ('p', 'ar'),
    ('m', 'er'), ('a', 't'), ('a', 'n'), ('c', 'an'),
    ('s', 'can'), ('c', 'o'), ('co', 'lu'), ('colu', 'm'),
    ('colum', 'n'), ('d', 'ow'), ('in', 'dow'), ('w', 'indow'),
    ('d', 'er'), ('or', 'der'), ('or', 't'), ('s', 'ort'),
    ('par', 't'), ('u', 'p'), ('a', 'g'), ('ag', 'g'),
    ('a', 'lu'), ('alu', 'e'), ('v', 'alue'), ('in', 'e'),
    ('l', 'ine'), ('e', 'y'), ('k', 'ey'), ('j', 'o'),
    ('jo', 'in'), ('g', 'e'), ('mer', 'ge'), ('er', 'y'),
    ('g', 'r'), ('gr', 'o'), ('gro', 'up'), ('q', 'u'),
    ('qu', 'ery'), ('c', 't'), ('ct', 'or'), ('e', 'ctor'),
]


def bpe_segment(word: str, ranks: dict) -> tuple:
    """Apply BPE merges to one word: repeatedly merge ALL occurrences
    of the present pair with the lowest rank (GPT-2's bpe() order —
    equivalent to one-at-a-time leftmost-lowest because a merge's
    output token only appears in LATER-ranked rules)."""
    syms = tuple(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = _bpe_merge_word(syms, best_pair)
    return syms


class BpeCounter:
    """Cached BPE token counter (merges + cache live for the worker's
    lifetime — the model-in-__init__ actor-pool discipline; the cache
    is vocabulary-sized, not corpus-sized)."""

    def __init__(self, merges=None):
        self.ranks = {p: i for i, p in enumerate(
            PINNED_BPE_MERGES if merges is None else merges)}
        self.cache: dict = {}

    def count(self, word: str) -> int:
        n = self.cache.get(word)
        if n is None:
            n = len(bpe_segment(word, self.ranks))
            self.cache[word] = n
        return n


_BPE_COUNTER = None


def bpe_real_token_counts(batch: pa.Table,
                          text_col: str = "text") -> pa.Table:
    """True-BPE token count per doc: RE2 pre-tokenize (lowercase
    [a-z]+ runs), count subword tokens per DISTINCT word through the
    cached merge table, then one vectorized lookup + segment-sum back
    to docs.  Corpus-scale work is all Arrow/NumPy; Python runs only
    once per distinct pre-token per worker (vocabulary-sized)."""
    global _BPE_COUNTER
    if _BPE_COUNTER is None:
        _BPE_COUNTER = BpeCounter()
    lowered = pc.utf8_lower(batch.column(text_col))
    toks = pc.split_pattern_regex(lowered, "[^a-z]+")
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    lengths = pc.list_value_length(toks).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    uniq, inv = np.unique(flat, return_inverse=True)
    cnt = _BPE_COUNTER.count
    per_word = np.array([0 if w == "" else cnt(w) for w in uniq],
                        np.int64)
    flat_counts = per_word[inv]
    parents = np.repeat(np.arange(len(lengths)), lengths)
    sums = np.bincount(parents, weights=flat_counts,
                       minlength=len(lengths))
    return pa.table({"n_bpe_tokens": pa.array(sums.astype(np.int64))})


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
