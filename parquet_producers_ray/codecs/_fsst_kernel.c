/* FSST greedy tokenizer kernels (encode/decode) — the C hot loops for
 * codecs/fsst.py.  Symbol table: <=255 symbols of 1..8 bytes, code 255
 * is an escape followed by one literal byte (Boncz, Neumann & Leis,
 * "FSST: Fast Random Access String Compression", VLDB 2020 — public
 * literature; the reference repo has no such codec).
 *
 * Built on demand by codecs/_native.py:  cc -O3 -shared -fPIC
 */
#include <stdint.h>
#include <string.h>

#define ESCAPE 255
#define MAX_SYMS 255

/* Greedy longest-match encode of n_strings concatenated strings.
 * sym_bytes: MAX_SYMS*8 zero-padded symbol bytes; sym_lens: per-symbol
 * length (0 for unused slots).  out must hold 2 * data length bytes.
 * out_offs[0] must be 0 on entry; returns total encoded bytes.
 */
int64_t fsst_encode(const uint8_t *data, const int64_t *offs,
                    int64_t n_strings, const uint8_t *sym_bytes,
                    const uint8_t *sym_lens, int32_t n_syms,
                    uint8_t *out, int64_t *out_offs) {
    /* per-first-TWO-byte candidate chains, longest symbol first (web
     * markup makes single-byte dispatch degenerate: every '<'-headed
     * symbol lands in one chain) */
    int16_t head2[65536];   /* 128 KiB stack: fine, keeps reentrancy */
    int16_t nxt[MAX_SYMS];
    int16_t single[256];
    int32_t i;
    int len_pass;
    memset(head2, 0xff, sizeof(head2));
    memset(nxt, 0xff, sizeof(nxt));
    memset(single, 0xff, sizeof(single));
    /* insert in ascending length so chains end up longest-first */
    for (len_pass = 2; len_pass <= 8; len_pass++) {
        for (i = 0; i < n_syms; i++) {
            if (sym_lens[i] == len_pass) {
                uint32_t b2 = ((uint32_t)sym_bytes[i * 8] << 8)
                    | sym_bytes[i * 8 + 1];
                nxt[i] = head2[b2];
                head2[b2] = (int16_t)i;
            }
        }
    }
    for (i = 0; i < n_syms; i++)
        if (sym_lens[i] == 1)
            single[sym_bytes[i * 8]] = (int16_t)i;

    uint8_t *o = out;
    int64_t s;
    for (s = 0; s < n_strings; s++) {
        int64_t pos = offs[s], end = offs[s + 1];
        while (pos < end) {
            uint8_t b = data[pos];
            int64_t rem = end - pos;
            int16_t best = -1;
            if (rem >= 2) {
                uint32_t b2 = ((uint32_t)b << 8) | data[pos + 1];
                int16_t k = head2[b2];
                while (k >= 0) {
                    uint8_t L = sym_lens[k];
                    if (L <= rem
                        && memcmp(data + pos, sym_bytes + k * 8, L) == 0) {
                        best = k;
                        break;
                    }
                    k = nxt[k];
                }
            }
            if (best >= 0) {
                *o++ = (uint8_t)best;
                pos += sym_lens[best];
            } else if (single[b] >= 0) {
                *o++ = (uint8_t)single[b];
                pos++;
            } else {
                *o++ = ESCAPE;
                *o++ = b;
                pos++;
            }
        }
        out_offs[s + 1] = o - out;
    }
    return o - out;
}

/* Total decoded byte count (sizing pass). */
int64_t fsst_decoded_size(const uint8_t *data, int64_t n,
                          const uint8_t *sym_lens) {
    int64_t total = 0, p = 0;
    while (p < n) {
        uint8_t c = data[p++];
        if (c == ESCAPE) {
            total += 1;
            p += 1;
        } else {
            total += sym_lens[c];
        }
    }
    return total;
}

/* Decode concatenated encoded strings; out must hold the size returned
 * by fsst_decoded_size.  out_offs[0] must be 0 on entry. */
int64_t fsst_decode(const uint8_t *data, const int64_t *offs,
                    int64_t n_strings, const uint8_t *sym_bytes,
                    const uint8_t *sym_lens, uint8_t *out,
                    int64_t *out_offs) {
    uint8_t *o = out;
    int64_t s;
    for (s = 0; s < n_strings; s++) {
        int64_t pos = offs[s], end = offs[s + 1];
        while (pos < end) {
            uint8_t c = data[pos++];
            if (c == ESCAPE) {
                *o++ = data[pos++];
            } else {
                memcpy(o, sym_bytes + c * 8, 8); /* over-copy, len<=8 */
                o += sym_lens[c];
            }
        }
        out_offs[s + 1] = o - out;
    }
    return o - out;
}

/* ------------------------------------------------------------------ */
/* Front-coding kernels for codecs/prefix.py (DELTA_BYTE_ARRAY-style). */

/* Split n concatenated strings into per-row shared-prefix lengths
 * (vs the previous row) and the concatenated suffix bytes.
 * p[0] = 0; suffix must hold offs[n]-offs[0] bytes (worst case);
 * suf_offs[0] must be 0 on entry.  Returns total suffix bytes. */
int64_t prefix_encode(const uint8_t *data, const int64_t *offs,
                      int64_t n, int64_t *p, uint8_t *suffix,
                      int64_t *suf_offs) {
    uint8_t *o = suffix;
    int64_t i;
    for (i = 0; i < n; i++) {
        const uint8_t *cur = data + offs[i];
        int64_t len = offs[i + 1] - offs[i];
        int64_t shared = 0;
        if (i > 0) {
            const uint8_t *prev = data + offs[i - 1];
            int64_t maxcmp = offs[i] - offs[i - 1];
            if (len < maxcmp) maxcmp = len;
            while (shared < maxcmp && cur[shared] == prev[shared])
                shared++;
        }
        p[i] = shared;
        memcpy(o, cur + shared, len - shared);
        o += len - shared;
        suf_offs[i + 1] = o - suffix;
    }
    return o - suffix;
}

/* Rebuild the concatenated strings from prefix lengths + suffixes.
 * out must hold sum(p[i] + suffix-len[i]) bytes; out_offs[0] must be 0
 * on entry.  Returns total output bytes. */
int64_t prefix_decode(const uint8_t *suffix, const int64_t *suf_offs,
                      const int64_t *p, int64_t n, uint8_t *out,
                      int64_t *out_offs) {
    uint8_t *o = out;
    int64_t i;
    for (i = 0; i < n; i++) {
        const uint8_t *prev_row = out + out_offs[i > 0 ? i - 1 : 0];
        int64_t slen = suf_offs[i + 1] - suf_offs[i];
        memcpy(o, prev_row, p[i]);       /* p[0] == 0: no-op on row 0 */
        o += p[i];
        memcpy(o, suffix + suf_offs[i], slen);
        o += slen;
        out_offs[i + 1] = o - out;
    }
    return o - out;
}

/* Big-endian uint64 of each string's first <=8 bytes (zero padded).
 * Comparing the resulting integers equals comparing the byte prefixes
 * lexicographically — the order-preserving coarsening the storage
 * sort's range router needs (stages/exchange.py). */
void sortkey8(const uint8_t *data, const int64_t *offs, int64_t n,
              uint64_t *out) {
    for (int64_t i = 0; i < n; i++) {
        int64_t s = offs[i];
        int64_t len = offs[i + 1] - s;
        if (len > 8) len = 8;
        uint64_t k = 0;
        for (int64_t j = 0; j < len; j++)
            k |= ((uint64_t)data[s + j]) << (56 - 8 * j);
        out[i] = k;
    }
}

/* Intersection sizes of adjacent sorted-unique uint64 runs: for each
 * pair p, rows rows0[p] and rows0[p]+1 of the ragged array (data,
 * element offsets offs) hold the two halves' hash sets, each sorted
 * ascending and internally unique (np.unique at pack time).  One
 * linear merge per pair — the minhash verify stage's hot kernel
 * (pipelines/queries.py::_minhash_verify_fn); the padded-matrix
 * NumPy path is the portable fallback and property-test oracle. */
void pair_intersect(const uint64_t *data, const int64_t *offs,
                    const int64_t *rows0, int64_t npair, int64_t *inter) {
    for (int64_t p = 0; p < npair; p++) {
        int64_t r = rows0[p];
        const uint64_t *a = data + offs[r];
        const uint64_t *ae = data + offs[r + 1];
        const uint64_t *b = ae;
        const uint64_t *be = data + offs[r + 2];
        int64_t c = 0;
        while (a < ae && b < be) {
            if (*a < *b) a++;
            else if (*b < *a) b++;
            else { c++; a++; b++; }
        }
        inter[p] = c;
    }
}

/* Baseline-JPEG entropy scan decode (stages/jpeg.py fast path): walk
 * the byte-stuffed Huffman bitstream once in C, filling zigzag
 * coefficient rows.  Python precomputes the MCU schedule (which
 * Huffman-table pair, which DC-predictor slot, which output row, and
 * whether an RSTn boundary precedes each data unit), so this kernel
 * is layout-agnostic — grayscale, 4:4:4, 4:2:2, 4:2:0 and restart
 * intervals all reduce to the same flat block walk.  Tables are
 * 16-bit-peek LUTs (sym, len per 64 KiB window), ntab pairs stacked.
 * Returns 0 on success, -(block+1) on an invalid code — the caller
 * falls back to the pure-Python decoder. */
typedef struct {
    const uint8_t *d;
    int64_t n, pos;
    uint64_t acc;
    int nbits, eof;
} JBits;

static void jb_fill(JBits *r, int want) {
    while (r->nbits < want) {
        if (r->eof || r->pos >= r->n) {
            r->eof = 1;
            r->acc <<= 8;
            r->nbits += 8;
            continue;
        }
        uint8_t b = r->d[r->pos];
        if (b == 0xFF) {
            if (r->pos + 1 < r->n && r->d[r->pos + 1] == 0x00)
                r->pos += 2;
            else {              /* a real marker: zero-pad from here */
                r->eof = 1;
                r->acc <<= 8;
                r->nbits += 8;
                continue;
            }
        } else {
            r->pos++;
        }
        r->acc = (r->acc << 8) | b;
        r->nbits += 8;
    }
}

static int jb_restart(JBits *r) {
    r->acc = 0;
    r->nbits = 0;
    r->eof = 0;
    int64_t p = r->pos;
    while (p + 1 < r->n && r->d[p] == 0xFF && r->d[p + 1] == 0xFF)
        p++;
    if (p + 1 >= r->n || r->d[p] != 0xFF
        || r->d[p + 1] < 0xD0 || r->d[p + 1] > 0xD7)
        return -1;
    r->pos = p + 2;
    return 0;
}

int64_t jpeg_decode_scan(const uint8_t *data, int64_t data_len,
                         int64_t pos,
                         const uint8_t *dc_sym, const uint8_t *dc_len,
                         const uint8_t *ac_sym, const uint8_t *ac_len,
                         const int32_t *tab_of_block,
                         const int32_t *pred_of_block,
                         const int64_t *row_of_block,
                         const uint8_t *restart_before,
                         int64_t nblk, int32_t *zz) {
    JBits r = {data, data_len, pos, 0, 0, 0};
    int64_t pred[8] = {0};
    for (int64_t b = 0; b < nblk; b++) {
        if (restart_before[b]) {
            if (jb_restart(&r) < 0)
                return -(b + 1);
            for (int i = 0; i < 8; i++)
                pred[i] = 0;
        }
        int64_t toff = (int64_t)tab_of_block[b] << 16;
        int32_t *row = zz + row_of_block[b] * 64;
        jb_fill(&r, 16);
        uint32_t p16 = (uint32_t)((r.acc >> (r.nbits - 16)) & 0xFFFF);
        int s = dc_sym[toff + p16];
        int ln = dc_len[toff + p16];
        if (!ln)
            return -(b + 1);
        r.nbits -= ln;
        r.acc &= (1ULL << r.nbits) - 1;
        if (s) {
            jb_fill(&r, s);
            int64_t v = (int64_t)((r.acc >> (r.nbits - s))
                                  & ((1ULL << s) - 1));
            r.nbits -= s;
            r.acc &= (1ULL << r.nbits) - 1;
            if (v < (1LL << (s - 1)))
                v -= (1LL << s) - 1;
            pred[pred_of_block[b]] += v;
        }
        row[0] = (int32_t)pred[pred_of_block[b]];
        int k = 1;
        while (k < 64) {
            jb_fill(&r, 16);
            p16 = (uint32_t)((r.acc >> (r.nbits - 16)) & 0xFFFF);
            int rs = ac_sym[toff + p16];
            ln = ac_len[toff + p16];
            if (!ln)
                return -(b + 1);
            r.nbits -= ln;
            r.acc &= (1ULL << r.nbits) - 1;
            if (rs == 0x00)
                break;                    /* EOB */
            if (rs == 0xF0) {             /* ZRL */
                k += 16;
                continue;
            }
            k += rs >> 4;
            s = rs & 0x0F;
            if (s == 0 || k > 63)
                return -(b + 1);
            jb_fill(&r, s);
            int64_t v = (int64_t)((r.acc >> (r.nbits - s))
                                  & ((1ULL << s) - 1));
            r.nbits -= s;
            r.acc &= (1ULL << r.nbits) - 1;
            if (v < (1LL << (s - 1)))
                v -= (1LL << s) - 1;
            row[k] = (int32_t)v;
            k++;
        }
    }
    return 0;
}

/* Baseline-JPEG entropy scan ENCODE (the mirror of jpeg_decode_scan):
 * one flat C walk over pre-quantized zigzag blocks in scan order,
 * with byte stuffing, restart markers and per-slot DC predictors.
 * Tables are (code,len) arrays indexed by symbol, ntab pairs stacked
 * (12 DC / 256 AC symbols per table).  Returns bytes written. */
typedef struct {
    uint8_t *out;
    int64_t n;
    uint64_t acc;
    int nbits;
} JWr;

static void jw_put(JWr *w, uint32_t code, int len) {
    w->acc = (w->acc << len) | (code & ((1u << len) - 1));
    w->nbits += len;
    while (w->nbits >= 8) {
        uint8_t b = (uint8_t)((w->acc >> (w->nbits - 8)) & 0xFF);
        w->out[w->n++] = b;
        if (b == 0xFF)
            w->out[w->n++] = 0x00;       /* T.81 B.1.1.5 stuffing */
        w->nbits -= 8;
    }
    w->acc &= (1ULL << w->nbits) - 1;
}

static void jw_flushpad(JWr *w) {
    if (w->nbits) {
        int pad = 8 - w->nbits;
        jw_put(w, (1u << pad) - 1, pad); /* 1-fill per spec */
    }
}

int64_t jpeg_encode_scan(const int32_t *zz, const int32_t *tab_of_block,
                         const int32_t *pred_of_block,
                         const uint8_t *restart_before, int64_t nblk,
                         const uint16_t *dc_code, const uint8_t *dc_len,
                         const uint16_t *ac_code, const uint8_t *ac_len,
                         uint8_t *out) {
    JWr w = {out, 0, 0, 0};
    int64_t pred[8] = {0};
    int rstno = 0;
    for (int64_t b = 0; b < nblk; b++) {
        if (restart_before[b]) {
            jw_flushpad(&w);
            w.out[w.n++] = 0xFF;
            w.out[w.n++] = (uint8_t)(0xD0 + (rstno & 7));
            rstno++;
            for (int i = 0; i < 8; i++)
                pred[i] = 0;
        }
        const int32_t *row = zz + b * 64;
        int64_t t12 = (int64_t)tab_of_block[b] * 12;
        int64_t t256 = (int64_t)tab_of_block[b] * 256;
        int64_t dc = row[0];
        int64_t diff = dc - pred[pred_of_block[b]];
        pred[pred_of_block[b]] = dc;
        int s = 0;
        {
            int64_t a = diff < 0 ? -diff : diff;
            while (a) { s++; a >>= 1; }
        }
        jw_put(&w, dc_code[t12 + s], dc_len[t12 + s]);
        if (s) {
            int64_t v = diff > 0 ? diff : diff + (1LL << s) - 1;
            jw_put(&w, (uint32_t)v, s);
        }
        int last = 0;
        for (int k = 63; k > 0; k--)
            if (row[k]) { last = k; break; }
        int run = 0;
        for (int k = 1; k <= last; k++) {
            int32_t v = row[k];
            if (!v) { run++; continue; }
            while (run > 15) {
                jw_put(&w, ac_code[t256 + 0xF0], ac_len[t256 + 0xF0]);
                run -= 16;
            }
            int ss = 0;
            {
                int32_t a = v < 0 ? -v : v;
                while (a) { ss++; a >>= 1; }
            }
            int sym = (run << 4) | ss;
            jw_put(&w, ac_code[t256 + sym], ac_len[t256 + sym]);
            int32_t vv = v > 0 ? v : v + (1 << ss) - 1;
            jw_put(&w, (uint32_t)vv, ss);
            run = 0;
        }
        if (last < 63)
            jw_put(&w, ac_code[t256 + 0x00], ac_len[t256 + 0x00]);
    }
    jw_flushpad(&w);
    return w.n;
}

/* GIF-variant LZW (GIF89a Appendix F), both directions — the fast
 * path behind stages/multimodal.py::_lzw_encode_gif/_lzw_decode_gif
 * (which stay as the differential-pinned Python fallbacks).  Decode
 * uses prefix-chain tables and writes each entry backwards; encode
 * uses a 8192-slot open-addressed (prev,sym) hash reset by
 * generation counters.  Returns bytes written, or -1 (malformed) /
 * -2 (output capacity exceeded — caller grows and retries). */
int64_t gif_lzw_decode(const uint8_t *data, int64_t n, int32_t min_code,
                       uint8_t *out, int64_t cap) {
    int clear = 1 << min_code, end = clear + 1;
    int16_t prefix[4096];
    uint8_t suffix[4096], first[4096];
    int32_t length[4096];
    for (int i = 0; i < clear; i++) {
        prefix[i] = -1;
        suffix[i] = (uint8_t)i;
        first[i] = (uint8_t)i;
        length[i] = 1;
    }
    int next = end + 1, width = min_code + 1, prev = -1;
    uint32_t acc = 0;
    int nbits = 0;
    int64_t pos = 0, op = 0;
    for (;;) {
        while (nbits < width) {
            if (pos >= n)
                return -1;               /* ended without END code */
            acc |= (uint32_t)data[pos++] << nbits;
            nbits += 8;
        }
        int code = (int)(acc & ((1u << width) - 1));
        acc >>= width;
        nbits -= width;
        if (code == clear) {
            next = end + 1;
            width = min_code + 1;
            prev = -1;
            continue;
        }
        if (code == end)
            break;
        int entry;
        if (prev < 0) {
            if (code >= clear)
                return -1;
            entry = code;
        } else if (code < next) {
            entry = code;
        } else if (code == next && next < 4096) {
            /* cScSc: new entry = prev + first(prev), appended below */
            entry = -1;
        } else {
            return -1;
        }
        if (prev >= 0 && next < 4096) {
            prefix[next] = (int16_t)prev;
            suffix[next] = entry < 0 ? first[prev]
                                     : first[entry];
            first[next] = first[prev];
            length[next] = length[prev] + 1;
            if (entry < 0)
                entry = next;
            next++;
            if (next == (1 << width) && width < 12)
                width++;
        } else if (entry < 0) {
            return -1;
        }
        int32_t L = length[entry];
        if (op + L > cap)
            return -2;
        int c = entry;
        for (int32_t k = L - 1; k >= 0; k--) {
            out[op + k] = suffix[c];
            c = prefix[c];
        }
        op += L;
        prev = entry;
    }
    return op;
}

int64_t gif_lzw_encode(const uint8_t *px, int64_t n, int32_t min_code,
                       uint8_t *out) {
    int clear = 1 << min_code, end = clear + 1;
    enum { HB = 13, HS = 1 << 13 };
    uint32_t hkey[HS];
    uint16_t hval[HS], hgen[HS];
    for (int i = 0; i < HS; i++)
        hgen[i] = 0;
    uint16_t gen = 1;
    int width = min_code + 1, next = end + 1;
    uint32_t acc = 0;
    int nbits = 0;
    int64_t op = 0;
#define EMIT(codev)                                            \
    do {                                                       \
        acc |= (uint32_t)(codev) << nbits;                     \
        nbits += width;                                        \
        while (nbits >= 8) {                                   \
            out[op++] = (uint8_t)(acc & 0xFF);                 \
            acc >>= 8;                                         \
            nbits -= 8;                                        \
        }                                                      \
    } while (0)
    EMIT(clear);
    int prev = -1;
    for (int64_t i = 0; i < n; i++) {
        int s = px[i];
        if (prev < 0) {
            prev = s;
            continue;
        }
        uint32_t key = ((uint32_t)prev << 8) | (uint32_t)s;
        uint32_t h = (key * 2654435761u) >> (32 - HB);
        int found = -1;
        for (;;) {
            if (hgen[h] != gen) {
                break;                    /* free slot */
            }
            if (hkey[h] == key) {
                found = hval[h];
                break;
            }
            h = (h + 1) & (HS - 1);
        }
        if (found >= 0) {
            prev = found;
            continue;
        }
        EMIT(prev);
        hgen[h] = gen;
        hkey[h] = key;
        hval[h] = (uint16_t)next;
        next++;
        if (next == (1 << width) + 1 && width < 12)
            width++;
        if (next > 4095) {
            EMIT(clear);
            width = min_code + 1;
            next = end + 1;
            gen++;
            if (gen == 0) {              /* wrapped: hard reset */
                for (int i2 = 0; i2 < HS; i2++)
                    hgen[i2] = 0;
                gen = 1;
            }
        }
        prev = s;
    }
    if (prev >= 0)
        EMIT(prev);
    EMIT(end);
#undef EMIT
    if (nbits)
        out[op++] = (uint8_t)(acc & 0xFF);
    return op;
}
