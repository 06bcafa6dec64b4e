"""FSST-style string compression: ≤255 symbols of 1–8 bytes + escape.

Fast Static Symbol Table compression after Boncz, Neumann & Leis,
"FSST: Fast Random Access String Compression" (VLDB 2020) — public
literature; the reference repo has no such codec (it defers to Parquet
defaults, SURVEY.md §2.3).

Layout: codes 0..254 index a trained symbol table (each symbol 1–8
bytes); code 255 is an escape followed by one literal byte.  The table
is trained on a sample (per partition by default; an actor pool may
share a table across batches — see stages/encode.py).

Encode is regex-driven (one pass, longest-symbol-first alternation —
C-speed matching, per-match Python dispatch); decode is fully
vectorized NumPy over the concatenated encoded buffer.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa

from . import _native
from .base import (Encoded, apply_validity, field_from_bytes,
                   field_to_bytes, ipc_array, ipc_bytes)

NAME = "fsst"
ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYM_LEN = 8


def applicable(typ: pa.DataType) -> bool:
    return (pa.types.is_string(typ) or pa.types.is_large_string(typ)
            or pa.types.is_binary(typ) or pa.types.is_large_binary(typ))


# ---------------------------------------------------------------------------
# training

def train(sample: bytes, max_symbols: int = MAX_SYMBOLS) -> list:
    """Pick ≤255 symbols (bytes, len 1..8) from a sample buffer.

    Strategy: reserve a slot for every distinct single byte observed
    (keeps escapes rare), then spend the rest on the highest-gain
    multi-byte substrings, gain = count × (len−1).
    """
    sample = sample[: 1 << 17]
    a = np.frombuffer(sample, dtype=np.uint8)
    if len(a) == 0:
        return []
    singles_vals, singles_cnt = np.unique(a, return_counts=True)
    order = np.argsort(singles_cnt)[::-1]
    singles = [bytes([int(singles_vals[i])]) for i in order][:max_symbols]

    multi_budget = max(0, max_symbols - len(singles))
    cnt: Counter = Counter()
    for L in (2, 3, 4, 6, 8):
        if len(a) < L:
            continue
        # windows as big-endian uint64 (integer unique beats void sorts)
        m = len(a) - L + 1
        v = np.zeros(m, dtype=np.uint64)
        for i in range(L):
            v = (v << np.uint64(8)) | a[i: m + i]
        uniq, c = np.unique(v, return_counts=True)
        keep = c >= 4
        uniq, c = uniq[keep], c[keep]
        top = np.argsort(c)[::-1][:1024]
        for u, k in zip(uniq[top], c[top]):
            cnt[int(u).to_bytes(8, "big")[8 - L:]] += int(k)

    multis = []
    for s, c in sorted(cnt.items(), key=lambda kv: kv[1] * (len(kv[0]) - 1),
                       reverse=True):
        if len(multis) >= multi_budget:
            break
        multis.append(s)
    return multis + singles


class SymbolTable:
    """Compiled encode/decode machinery for one trained table."""

    def __init__(self, symbols: list):
        self.symbols = symbols
        self.lookup = {s: bytes([i]) for i, s in enumerate(symbols)}
        # the regex tokenizer only serves the pure-Python fallback
        # (encode_one); compiling it costs ~10 ms per table, so defer
        # until actually needed (the cc kernel path never does)
        self._pat_c = None
        self._repl_c = None
        # decode tables
        nsym = len(symbols)
        self.sym_len = np.zeros(max(nsym, 1), dtype=np.int64)
        self.sym_mat = np.zeros((max(nsym, 1), MAX_SYM_LEN), dtype=np.uint8)
        for i, s in enumerate(symbols):
            self.sym_len[i] = len(s)
            self.sym_mat[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        # vectorized-encode tables: single-byte code LUT + multi-byte
        # symbols as sorted zero-padded big-endian uint64 "range starts"
        # with prefix-parent links (one searchsorted + ≤8 fix-up rounds)
        self.single_code = np.full(256, -1, dtype=np.int16)
        multis = []
        for i, s in enumerate(symbols):
            if len(s) == 1:
                self.single_code[s[0]] = i
            else:
                start = int.from_bytes(s + b"\x00" * (8 - len(s)), "big")
                multis.append((start, len(s), i, s))
        multis.sort(key=lambda t: (t[0], t[1]))
        self.m_start = np.array([m[0] for m in multis], dtype=np.uint64)
        self.m_len = np.array([m[1] for m in multis], dtype=np.int64)
        self.m_code = np.array([m[2] for m in multis], dtype=np.int16)
        self.m_shift = ((8 - self.m_len) * 8).astype(np.uint64)
        by_sym = {m[3]: j for j, m in enumerate(multis)}
        parent = np.full(len(multis), -1, dtype=np.int32)
        for j, (_, _, _, s) in enumerate(multis):
            for plen in range(len(s) - 1, 1, -1):
                p = by_sym.get(s[:plen])
                if p is not None:
                    parent[j] = p
                    break
        self.m_parent = parent

    @property
    def _pat(self):
        if self._pat_c is None:
            ordered = sorted(self.symbols, key=len, reverse=True)
            pat = (b"|".join(re.escape(s) for s in ordered)
                   if ordered else b"")
            pat = (pat + b"|" if pat else b"") + b"[\\s\\S]"
            self._pat_c = re.compile(pat)
        return self._pat_c

    @property
    def _repl(self):
        if self._repl_c is None:
            lut, esc = self.lookup, bytes([ESCAPE])

            def repl(m, _lut=lut, _esc=esc):
                s = m.group(0)
                c = _lut.get(s)
                return c if c is not None else _esc + s

            self._repl_c = repl
        return self._repl_c

    def encode_one(self, b: bytes) -> bytes:
        return self._pat.sub(self._repl, b)

    def to_blob(self) -> bytes:
        parts = [bytes([len(self.symbols)])]
        for s in self.symbols:
            parts.append(bytes([len(s)]))
            parts.append(s)
        return b"".join(parts)

    @staticmethod
    def from_blob(blob: bytes) -> "SymbolTable":
        n = blob[0]
        syms, pos = [], 1
        for _ in range(n):
            ln = blob[pos]
            syms.append(blob[pos + 1: pos + 1 + ln])
            pos += 1 + ln
        return SymbolTable(syms)


def train_from_array(arr: pa.Array, sample_rows: int = 512) -> SymbolTable:
    n = len(arr)
    if n == 0:
        return SymbolTable([])
    step = max(1, n // sample_rows)
    idx = np.arange(0, n, step)[:sample_rows]
    sample_vals = arr.take(pa.array(idx)).cast(pa.large_binary())
    buf = b"".join(v.as_py() or b"" for v in sample_vals)
    return SymbolTable(train(buf))


# ---------------------------------------------------------------------------
# vectorized encode

_CHUNK_BYTES = 8 * 1024 * 1024  # caps the uint64 window temporaries


def _encode_buffer(data: np.ndarray, offs: np.ndarray,
                   table: SymbolTable) -> tuple[np.ndarray, np.ndarray]:
    """Greedy longest-match tokenization of every string at once.

    1. Per position: longest matching symbol (one ``searchsorted``
       against the sorted zero-padded symbol starts, then ≤8
       prefix-parent fix-up rounds), boundary-masked so matches never
       cross strings.
    2. Token starts = positions reachable from each string start by
       repeatedly jumping ``step`` bytes — found by pointer doubling
       (``jump = jump[jump]``), O(N log max_string_len) with no
       per-token Python work.
    3. One scatter emits all symbol codes and escape pairs.
    """
    n_strings = len(offs) - 1
    N = len(data)
    if N == 0:
        return np.zeros(0, np.uint8), np.zeros(n_strings + 1, np.int64)
    str_lens = np.diff(offs)

    best_len = np.ones(N, dtype=np.int64)
    best_code = table.single_code[data].astype(np.int64)
    if len(table.m_start):
        # big-endian uint64 of the 8-byte window at every position
        pad = np.zeros(N + 8, dtype=np.uint8)
        pad[:N] = data
        win = np.lib.stride_tricks.sliding_window_view(pad, 8)[:N]
        v8 = np.ascontiguousarray(win).view(">u8").ravel().astype(np.uint64)
        # bytes remaining in the string at each position
        rem = np.repeat(offs[1:], str_lens) - np.arange(N, dtype=np.int64)
        # deepest candidate range, then walk prefix-parents until valid
        cand = np.searchsorted(table.m_start, v8,
                               side="right").astype(np.int64) - 1
        live = np.flatnonzero(cand >= 0)
        cand = cand[live]
        for _ in range(MAX_SYM_LEN):
            if not len(live):
                break
            sh = table.m_shift[cand]
            ok = ((v8[live] >> sh) == (table.m_start[cand] >> sh)) \
                & (table.m_len[cand] <= rem[live])
            hit = live[ok]
            best_len[hit] = table.m_len[cand[ok]]
            best_code[hit] = table.m_code[cand[ok]]
            live = live[~ok]
            cand = table.m_parent[cand[~ok]]
            keep = cand >= 0
            live = live[keep]
            cand = cand[keep]

    # token-start discovery by pointer doubling
    step = np.where(best_code >= 0, best_len, 1)
    jump = np.empty(N + 1, dtype=np.int64)
    jump[N] = N
    jump[:N] = np.minimum(np.arange(N, dtype=np.int64) + step, N)
    mark = np.zeros(N + 1, dtype=bool)
    mark[offs[:-1]] = True          # every string start is a token start
    max_tok = int(str_lens.max()) if n_strings else 1
    n_marked = int(mark.sum())
    for _ in range(max(1, int(np.ceil(np.log2(max(max_tok, 1) + 1))))):
        mark[jump[np.flatnonzero(mark)]] = True
        m = int(mark.sum())
        if m == n_marked:
            break
        n_marked = m
        jump = jump[jump]

    # single-scatter emit
    tok_pos = np.flatnonzero(mark[:N])
    codes = best_code[tok_pos]
    is_sym = codes >= 0
    outlen = np.where(is_sym, 1, 2)
    w = np.zeros(len(tok_pos), dtype=np.int64)
    np.cumsum(outlen[:-1], out=w[1:])
    out = np.empty(int(w[-1] + outlen[-1]) if len(w) else 0, dtype=np.uint8)
    out[w[is_sym]] = codes[is_sym]
    we = w[~is_sym]
    out[we] = ESCAPE
    out[we + 1] = data[tok_pos[~is_sym]]

    tok_str = np.searchsorted(offs, tok_pos, side="right") - 1
    out_str_len = np.bincount(tok_str, weights=outlen,
                              minlength=n_strings).astype(np.int64)
    out_offsets = np.zeros(n_strings + 1, dtype=np.int64)
    out_offsets[1:] = np.cumsum(out_str_len)
    return out, out_offsets


# ---------------------------------------------------------------------------
# column encode / decode

def encode(arr: pa.Array, table: SymbolTable | None = None) -> Encoded:
    if table is None:
        table = train_from_array(arr)
    binvals = arr.cast(pa.large_binary())
    n = len(binvals)
    if n == 0:
        enc_arr = pa.array([], type=pa.large_binary())
        return Encoded(NAME, 0, field_to_bytes(arr.type), {},
                       [table.to_blob(), ipc_bytes(enc_arr)])

    offs = np.frombuffer(binvals.buffers()[1], dtype=np.int64)[
        binvals.offset: binvals.offset + n + 1]
    base = int(offs[0])
    offs = (offs - base).astype(np.int64)
    dbuf = binvals.buffers()[2]
    data = (np.frombuffer(dbuf, dtype=np.uint8)[base: base + int(offs[-1])]
            if dbuf is not None else np.zeros(0, dtype=np.uint8))

    if _native.available():
        out_data, out_offsets = _native.fsst_encode(
            data, offs, table.sym_mat, table.sym_len)
    else:
        # string-aligned chunks bound the uint64 window temporaries
        out_parts, off_parts = [], [np.zeros(1, dtype=np.int64)]
        s = 0
        while s < n:
            e = int(np.searchsorted(offs, offs[s] + _CHUNK_BYTES,
                                    side="left"))
            e = max(e, s + 1)
            chunk = data[offs[s]: offs[e if e <= n else n]]
            sub_offs = offs[s: min(e, n) + 1] - offs[s]
            ob, oo = _encode_buffer(chunk, sub_offs, table)
            out_parts.append(ob)
            off_parts.append(oo[1:] + off_parts[-1][-1])
            s = min(e, n)
        out_data = (np.concatenate(out_parts) if out_parts
                    else np.zeros(0, np.uint8))
        out_offsets = np.concatenate(off_parts)

    enc_arr = pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(out_offsets.tobytes()),
         pa.py_buffer(out_data.tobytes())])
    if binvals.null_count:
        import pyarrow.compute as pc
        enc_arr = pc.if_else(pa.array(~np.asarray(binvals.is_valid())),
                             pa.nulls(n, pa.large_binary()), enc_arr)
    return Encoded(NAME, len(arr), field_to_bytes(arr.type), {},
                   [table.to_blob(), ipc_bytes(enc_arr)])


def decode(enc: Encoded) -> pa.Array:
    typ = field_from_bytes(enc.field_bytes)
    table = SymbolTable.from_blob(enc.buffers[0])
    enc_arr = ipc_array(enc.buffers[1])
    n = len(enc_arr)
    if n == 0:
        return pa.array([], type=typ)

    offs = np.frombuffer(enc_arr.buffers()[1], dtype=np.int64)[
        enc_arr.offset: enc_arr.offset + n + 1]
    base = offs[0]
    offs = offs - base
    dbuf = enc_arr.buffers()[2]
    data = (np.frombuffer(dbuf, dtype=np.uint8)[base: base + offs[-1]]
            if dbuf is not None else np.zeros(0, dtype=np.uint8))

    valid = np.asarray(enc_arr.is_valid()) if enc_arr.null_count else None

    if len(data) == 0:
        out_offsets = np.zeros(n + 1, dtype=np.int64)
        out_bytes = np.zeros(0, dtype=np.uint8)
    elif _native.available():
        out_bytes, out_offsets = _native.fsst_decode(
            data, offs, table.sym_mat, table.sym_len)
    else:
        out_bytes, out_offsets = _decode_buffer(data, offs, table, n)

    result = pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(out_offsets.tobytes()),
         pa.py_buffer(out_bytes.tobytes())])
    result = result.cast(typ)
    return apply_validity(result, valid)


def _decode_buffer(data: np.ndarray, offs: np.ndarray, table: SymbolTable,
                   n: int):
    """Vectorized token scan of the concatenated encoded buffer.

    Escape runs never cross string boundaries; a maximal run of 0xFF
    bytes (broken at string starts) alternates escape/literal starting
    with an escape.
    """
    is_esc_byte = data == ESCAPE
    nbytes = len(data)
    prev = np.zeros(nbytes, dtype=bool)
    prev[1:] = is_esc_byte[:-1]
    # force run break at string starts
    starts = offs[:-1]
    starts = starts[starts < nbytes]
    brk = np.zeros(nbytes, dtype=bool)
    brk[starts] = True
    # brk (string starts) is already inside the mask, so a run
    # spanning a string boundary breaks there too
    run_start_mask = is_esc_byte & (brk | ~prev)

    run_starts = np.flatnonzero(run_start_mask)
    if len(run_starts):
        rid = np.cumsum(run_start_mask)
        run_lens = np.bincount(rid[is_esc_byte],
                               minlength=len(run_starts) + 1)[1:]
        k = (run_lens + 1) // 2
        tot = int(k.sum())
        csum = np.concatenate(([0], np.cumsum(k)[:-1]))
        esc_pos = (np.repeat(run_starts, k)
                   + 2 * (np.arange(tot) - np.repeat(csum, k)))
        lit_pos = esc_pos + 1
    else:
        esc_pos = np.zeros(0, dtype=np.int64)
        lit_pos = esc_pos

    tok_mask = np.ones(nbytes, dtype=bool)
    tok_mask[lit_pos] = False
    tok_pos = np.flatnonzero(tok_mask)
    tok_codes = data[tok_pos].astype(np.int64)
    tok_is_esc = tok_codes == ESCAPE

    out_len = np.where(tok_is_esc, 1,
                       table.sym_len[np.where(tok_is_esc, 0, tok_codes)])
    ntok = len(tok_pos)
    tok_mat = np.zeros((ntok, MAX_SYM_LEN), dtype=np.uint8)
    if (~tok_is_esc).any():
        tok_mat[~tok_is_esc] = table.sym_mat[tok_codes[~tok_is_esc]]
    if tok_is_esc.any():
        tok_mat[tok_is_esc, 0] = data[tok_pos[tok_is_esc] + 1]

    total = int(out_len.sum())
    out_start = np.concatenate(([0], np.cumsum(out_len)[:-1]))
    rep = np.repeat(np.arange(ntok), out_len)
    within = np.arange(total) - np.repeat(out_start, out_len)
    out_bytes = tok_mat[rep, within]

    tok_str = np.searchsorted(offs, tok_pos, side="right") - 1
    out_str_len = np.bincount(tok_str, weights=out_len,
                              minlength=n).astype(np.int64)
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    out_offsets[1:] = np.cumsum(out_str_len)
    return out_bytes, out_offsets
