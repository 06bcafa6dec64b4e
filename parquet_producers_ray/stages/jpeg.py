"""REAL baseline JPEG (ITU-T T.81 / JFIF), pure stdlib+numpy:
8-bit sequential DCT with the spec's Annex K quantization + Huffman
tables.  Grayscale (1 component) AND color (3-component YCbCr per
JFIF/T.871), interleaved baseline scan with 4:2:0 chroma subsampling
(the dominant real-crawl layout) or 4:4:4, DRI/RSTn restart intervals
on both encode and decode (common in real crawl images — cameras emit
them for error resilience), and PROGRESSIVE (SOF2) streams: decode
handles the full huffman-progressive subset libjpeg emits (spectral
selection + successive approximation, all four scan types, general
EOB runs), encode emits a 1-bit refinement ladder over the same
quantized coefficients as the sequential path.

Why it exists: JPEG is the dominant image payload of a Common-Crawl-
style corpus, and the reference's media path left compressed formats
at a lib-backed stub.  This module closes that for baseline JPEG with
public knowledge only — the encoder writes standard JFIF that opens in
any viewer, the decoder walks the real marker/entropy stream.

Design notes for the actor-pool stages that use it
(`stages/multimodal.py` conventions):

- The 2-D DCT is the orthonormal matrix form ``C @ X @ C.T`` (exactly
  T.81's normalization), vectorized over ALL 8x8 blocks of an image
  with one einsum — no per-block Python in the transform.
- Entropy coding/decoding runs in cc kernels (codecs/_fsst_kernel.c
  ``jpeg_encode_scan`` / ``jpeg_decode_scan`` — one flat C walk of the
  bitstream over a Python-precomputed, vectorized MCU schedule, so
  gray/444/422/420/restart all reduce to the same kernel; ~4-6× over
  the per-symbol Python paths, which remain as differential-pinned
  fallbacks).
- JPEG is LOSSY: round-trips are verified by bounded max-pixel-error
  against the source (quality 95 ⇒ small quant steps), plus exact
  cases (constant blocks and smooth gradients reconstruct bit-exactly
  at quality 100, where every quant step is 1).
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 — luminance quantization table, natural (row-major) order.
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.int32)

# Annex K.2 — chrominance quantization table, natural order.
QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.int32)

# Annex K.3 / K.5 — standard luminance Huffman tables: BITS (number of
# codes per length 1..16) and HUFFVAL (symbol values in code order).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# Annex K.4 / K.6 — standard chrominance Huffman tables.
DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = list(range(12))
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

assert sum(AC_BITS_C) == len(AC_VALS_C) == 162
assert sum(DC_BITS_C) == len(DC_VALS_C) == 12


def _zigzag_order() -> np.ndarray:
    """Zigzag position i -> natural (row-major) index, generated from
    the diagonal walk (T.81 Figure A.6) rather than typed by hand."""
    out = np.empty(64, np.int64)
    i = 0
    for s in range(15):
        rs = range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0 \
            else range(max(0, s - 7), min(s, 7) + 1)
        for r in rs:
            out[i] = r * 8 + (s - r)
            i += 1
    return out


ZIGZAG = _zigzag_order()

_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.sqrt(1 / 8) if _u == 0 else 0.5) \
            * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _scaled_quant(quality: int, base: np.ndarray = QUANT_LUMA) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (base * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int32)


# JFIF (ITU-T T.871 §7) RGB <-> YCbCr, full range.
def rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB → (h, w, 3) float64 YCbCr (unclipped)."""
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray,
                 cr: np.ndarray) -> np.ndarray:
    """float64 planes → (h, w, 3) uint8 RGB (rounded + clipped)."""
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _build_huffman(bits, vals):
    """Canonical Huffman per T.81 Annex C: symbol -> (code, length)."""
    enc = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            enc[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return enc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:               # T.81 B.1.1.5 byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # 1-fill per spec

    def marker(self, m: int) -> None:
        """Byte-align and emit a bare marker (RSTn) into the entropy
        stream — markers are never byte-stuffed."""
        self.flush()
        self.out += bytes([0xFF, m])


class _BitReader:
    """MSB-first windowed reader over the entropy segment with 0xFF00
    unstuffing; a real marker ends the stream (reads past it pad with
    zeros, the spec's defined behavior for the final partial byte)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.eof = False

    def _fill(self, want: int) -> None:
        d = self.data
        n = len(d)
        while self.nbits < want:
            if self.eof or self.pos >= n:
                self.eof = True
                self.acc <<= 8
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                if self.pos + 1 < n and d[self.pos + 1] == 0x00:
                    self.pos += 2
                else:
                    self.eof = True          # a real marker: pad zeros
                    self.acc <<= 8
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def bits(self, n: int) -> int:
        if self.nbits < n:
            self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        """Consume an RSTn marker at a restart boundary (T.81 B.2.1.2
        / E.2.4): discard the partial byte's pad bits, skip 0xFF fill
        bytes, verify the marker, byte-align after it."""
        self.acc = 0
        self.nbits = 0
        self.eof = False
        d = self.data
        n = len(d)
        p = self.pos
        while p + 1 < n and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1                       # optional 0xFF fill bytes
        if p + 1 >= n or d[p] != 0xFF or not (0xD0 <= d[p + 1] <= 0xD7):
            raise ValueError("expected RSTn at restart boundary")
        self.pos = p + 2


_LUT_CACHE: dict = {}
_LUT_CACHE_MAX = 8       # ~1 MB per entry; real corpora carry
                         # per-image optimized tables, so bound it


def _huff_lut(bits, vals):
    """16-bit-peek Huffman LUT (the classic libjpeg acceleration):
    entry i = (symbol, code length) for the code prefixing the 16-bit
    window i.  Length 0 marks an invalid prefix.  Cached by table
    content with FIFO eviction — the stages decode many images with
    the same Annex K tables (one build per process), while a corpus of
    per-image optimized tables can't grow the actor's heap unboundedly."""
    key = (tuple(bits), tuple(vals))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    if len(_LUT_CACHE) >= _LUT_CACHE_MAX:
        _LUT_CACHE.pop(next(iter(_LUT_CACHE)))
    sym = np.zeros(1 << 16, np.uint8)
    ln = np.zeros(1 << 16, np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            base = code << (16 - length)
            span = 1 << (16 - length)
            sym[base:base + span] = vals[k]
            ln[base:base + span] = length
            code += 1
            k += 1
        code <<= 1
    # lists for the Python fallback's scalar indexing, numpy for the
    # cc scan kernel — one cache entry carries both views
    pair = (sym.tolist(), ln.tolist(), sym, ln)
    _LUT_CACHE[key] = pair
    return pair


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _fdct_zz(plane: np.ndarray, quant: np.ndarray) -> tuple:
    """Centered float plane (already padded to 8-multiples) → zigzag
    quantized coefficients (nblocks, 64) + block-grid dims."""
    ph, pw = plane.shape
    bh, bw = ph // 8, pw // 8
    blocks = (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8) - 128.0)
    coef = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    qc = np.round(coef / quant).astype(np.int32)
    return qc.reshape(-1, 64)[:, ZIGZAG], bh, bw


def _enc_arrays(enc: dict, nsym: int):
    """(code, len) arrays indexed by symbol for the cc encode kernel."""
    code = np.zeros(nsym, np.uint16)
    ln = np.zeros(nsym, np.uint8)
    for sym, (c, l) in enc.items():
        code[sym] = c
        ln[sym] = l
    return code, ln


def _encode_block(bw_: "_BitWriter", blk: np.ndarray, prev_dc: int,
                  dc_enc: dict, ac_enc: dict) -> int:
    """Huffman-encode ONE zigzag block; returns the new DC predictor."""
    diff = int(blk[0]) - prev_dc
    prev_dc = int(blk[0])
    s = _category(diff)
    bw_.write(*dc_enc[s])
    if s:
        v = diff if diff > 0 else diff + (1 << s) - 1
        bw_.write(v, s)
    run = 0
    last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw_.write(*ac_enc[0xF0])
            run -= 16
        s = _category(v)
        bw_.write(*ac_enc[(run << 4) | s])
        bw_.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        bw_.write(*ac_enc[0x00])                  # EOB
    return prev_dc


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


class JpegCodec:
    """Baseline sequential JFIF: SOI / APP0 / DQT / SOF0 / DHT / SOS /
    entropy data / EOI.  ``encode`` emits standard files — grayscale
    from an (h, w) array, or YCbCr color from an (h, w, 3) RGB array
    with 4:2:0 (default) or 4:4:4 chroma, Annex K luma+chroma tables.
    ``decode_pixels`` parses real marker streams (multi-table DQT,
    APPn/COM skipping, interleaved multi-component scans with
    sampling factors up to 2×2 — 4:4:4 / 4:2:2 / 4:2:0, DRI/RSTn
    restart intervals, and PROGRESSIVE/SOF2 multi-scan streams) and
    raises ``NotImplementedError`` only for arithmetic-coded,
    lossless and hierarchical JPEG (the lib-backed integration
    point)."""

    @staticmethod
    def encode(pixels: np.ndarray, quality: int = 95,
               subsampling: str = "420",
               restart_interval: int = 0) -> bytes:
        px = np.asarray(pixels, np.uint8)
        if px.ndim == 3 and px.shape[2] == 3:
            return JpegCodec._encode_color(px, quality, subsampling,
                                           restart_interval)
        h, w = px.shape
        if not h or not w:
            raise ValueError("empty image")
        quant = _scaled_quant(quality)
        bh, bw = -(-h // 8), -(-w // 8)
        pad = np.pad(px, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        zz, _, _ = _fdct_zz(pad.astype(np.float64), quant)

        dc_enc = _build_huffman(DC_BITS, DC_VALS)
        ac_enc = _build_huffman(AC_BITS, AC_VALS)
        ri = int(restart_interval)
        from ..codecs import _native
        if _native.available():
            nblk = len(zz)
            tabb = np.zeros(nblk, np.int32)
            rstb = np.zeros(nblk, np.uint8)
            if ri:
                bidx = np.arange(nblk)
                rstb[(bidx > 0) & (bidx % ri == 0)] = 1
            dcc, dcl = _enc_arrays(dc_enc, 12)
            acc_, acl = _enc_arrays(ac_enc, 256)
            entropy = _native.jpeg_encode_scan(
                zz.astype(np.int32), tabb, tabb, rstb,
                dcc, dcl, acc_, acl)
        else:
            bw_ = _BitWriter()
            prev_dc = 0
            for bi, blk in enumerate(zz):
                if ri and bi and bi % ri == 0:  # T.81 E.2.4
                    bw_.marker(0xD0 + ((bi // ri - 1) % 8))
                    prev_dc = 0
                prev_dc = _encode_block(bw_, blk, prev_dc, dc_enc,
                                        ac_enc)
            bw_.flush()
            entropy = bytes(bw_.out)

        out = bytearray(b"\xFF\xD8")              # SOI
        out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        out += _seg(0xFFDB, b"\x00"
                    + quant.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes())
        out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1)
                    + b"\x01\x11\x00")            # SOF0: 1 comp, 1x1, q0
        out += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
        out += _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
        if ri:
            out += _seg(0xFFDD, struct.pack(">H", ri))
        out += _seg(0xFFDA, b"\x01\x01\x00\x00\x3F\x00")
        out += entropy
        out += b"\xFF\xD9"                        # EOI
        return bytes(out)

    @staticmethod
    def encode_progressive(pixels: np.ndarray, quality: int = 95,
                           subsampling: str = "420") -> bytes:
        """REAL progressive JFIF (SOF2): spectral selection + a 1-bit
        successive-approximation ladder over the SAME quantized
        coefficients as ``encode`` — so ``decode_pixels`` of the two
        streams is bit-identical (pinned by
        tests/test_functions.py::test_jpeg_progressive_roundtrip)."""
        px = np.asarray(pixels, np.uint8)
        if px.ndim == 3 and px.shape[2] == 3:
            if subsampling not in ("420", "444"):
                raise ValueError(
                    f"unsupported subsampling {subsampling!r}")
            ssf = 2 if subsampling == "420" else 1
            h, w = px.shape[:2]
            if not h or not w:
                raise ValueError("empty image")
            mcuy, mcux = -(-h // (8 * ssf)), -(-w // (8 * ssf))
            ph, pw = mcuy * 8 * ssf, mcux * 8 * ssf
            pad = np.pad(px, ((0, ph - h), (0, pw - w), (0, 0)),
                         mode="edge")
            ycc = rgb_to_ycbcr(pad)
            yp = ycc[..., 0]
            if ssf == 2:
                cb = ycc[..., 1].reshape(ph // 2, 2,
                                         pw // 2, 2).mean((1, 3))
                cr = ycc[..., 2].reshape(ph // 2, 2,
                                         pw // 2, 2).mean((1, 3))
            else:
                cb, cr = ycc[..., 1], ycc[..., 2]
            qy = _scaled_quant(quality)
            qc = _scaled_quant(quality, QUANT_CHROMA)
            zzy, _, bwy = _fdct_zz(yp, qy)
            zzcb, _, bwc = _fdct_zz(cb, qc)
            zzcr, _, _ = _fdct_zz(cr, qc)
            return _encode_progressive_impl(
                [(zzy, bwy), (zzcb, bwc), (zzcr, bwc)], [0, 1, 1],
                [(ssf, ssf), (1, 1), (1, 1)],
                [(DC_BITS, DC_VALS), (DC_BITS_C, DC_VALS_C),
                 (DC_BITS_C, DC_VALS_C)],
                [(AC_BITS, AC_VALS), (AC_BITS_C, AC_VALS_C),
                 (AC_BITS_C, AC_VALS_C)],
                h, w, [(0, qy), (1, qc)])
        h, w = px.shape
        if not h or not w:
            raise ValueError("empty image")
        quant = _scaled_quant(quality)
        bh, bw = -(-h // 8), -(-w // 8)
        padp = np.pad(px, ((0, bh * 8 - h), (0, bw * 8 - w)),
                      mode="edge")
        zz, _, _ = _fdct_zz(padp.astype(np.float64), quant)
        return _encode_progressive_impl(
            [(zz, bw)], [0], [(1, 1)], [(DC_BITS, DC_VALS)],
            [(AC_BITS, AC_VALS)], h, w, [(0, quant)])

    @staticmethod
    def _encode_color(px: np.ndarray, quality: int,
                      subsampling: str,
                      restart_interval: int = 0) -> bytes:
        """Interleaved 3-component baseline scan (T.81 A.2.3): MCU =
        [4 Y, Cb, Cr] at 4:2:0 or [Y, Cb, Cr] at 4:4:4, each component
        with its own quant table, Huffman pair and DC predictor."""
        if subsampling not in ("420", "444"):
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        ss = 2 if subsampling == "420" else 1
        h, w = px.shape[:2]
        if not h or not w:
            raise ValueError("empty image")
        mcuy, mcux = -(-h // (8 * ss)), -(-w // (8 * ss))
        ph, pw = mcuy * 8 * ss, mcux * 8 * ss
        pad = np.pad(px, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
        ycc = rgb_to_ycbcr(pad)
        yp = ycc[..., 0]
        if ss == 2:                     # 2×2 box average (JFIF centered)
            cb = ycc[..., 1].reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
            cr = ycc[..., 2].reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
        else:
            cb, cr = ycc[..., 1], ycc[..., 2]
        qy = _scaled_quant(quality)
        qc = _scaled_quant(quality, QUANT_CHROMA)
        zzy, _, bwy = _fdct_zz(yp, qy)
        zzcb, _, bwc = _fdct_zz(cb, qc)
        zzcr, _, _ = _fdct_zz(cr, qc)

        dcy = _build_huffman(DC_BITS, DC_VALS)
        acy = _build_huffman(AC_BITS, AC_VALS)
        dcc = _build_huffman(DC_BITS_C, DC_VALS_C)
        acc = _build_huffman(AC_BITS_C, AC_VALS_C)
        ri = int(restart_interval)
        nmcu = mcuy * mcux
        from ..codecs import _native
        if _native.available():
            # scan-order gather (mirror of decode's schedule): per MCU
            # ss*ss Y blocks then Cb then Cr, all vectorized
            m = np.arange(nmcu, dtype=np.int64)
            mi_, mj_ = m // mcux, m % mcux
            B = ss * ss + 2
            order = np.empty(nmcu * B, np.int64)
            tabb = np.empty(nmcu * B, np.int32)
            predb = np.empty(nmcu * B, np.int32)
            si = 0
            ny = len(zzy)
            for by in range(ss):
                for bx in range(ss):
                    order[si::B] = (ss * mi_ + by) * bwy + ss * mj_ + bx
                    tabb[si::B] = 0
                    predb[si::B] = 0
                    si += 1
            order[si::B] = ny + mi_ * bwc + mj_
            tabb[si::B] = 1
            predb[si::B] = 1
            si += 1
            order[si::B] = ny + len(zzcb) + mi_ * bwc + mj_
            tabb[si::B] = 1
            predb[si::B] = 2
            rstb = np.zeros(nmcu * B, np.uint8)
            if ri:
                rstb[np.flatnonzero((m > 0) & (m % ri == 0)) * B] = 1
            zz_seq = np.concatenate([zzy, zzcb, zzcr])[order]
            dcy_c, dcy_l = _enc_arrays(dcy, 12)
            dcc_c, dcc_l = _enc_arrays(dcc, 12)
            acy_c, acy_l = _enc_arrays(acy, 256)
            acc_c, acc_l = _enc_arrays(acc, 256)
            entropy = _native.jpeg_encode_scan(
                zz_seq.astype(np.int32), tabb, predb, rstb,
                np.concatenate([dcy_c, dcc_c]),
                np.concatenate([dcy_l, dcc_l]),
                np.concatenate([acy_c, acc_c]),
                np.concatenate([acy_l, acc_l]))
        else:
            bw_ = _BitWriter()
            pdc = [0, 0, 0]
            for i in range(mcuy):
                for j in range(mcux):
                    mno = i * mcux + j
                    if ri and mno and mno % ri == 0:
                        bw_.marker(0xD0 + ((mno // ri - 1) % 8))
                        pdc = [0, 0, 0]
                    for by in range(ss):
                        for bx in range(ss):
                            blk = zzy[(ss * i + by) * bwy
                                      + (ss * j + bx)]
                            pdc[0] = _encode_block(bw_, blk, pdc[0],
                                                   dcy, acy)
                    pdc[1] = _encode_block(bw_, zzcb[i * bwc + j],
                                           pdc[1], dcc, acc)
                    pdc[2] = _encode_block(bw_, zzcr[i * bwc + j],
                                           pdc[2], dcc, acc)
            bw_.flush()
            entropy = bytes(bw_.out)

        samp = 0x22 if ss == 2 else 0x11
        out = bytearray(b"\xFF\xD8")
        out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        out += _seg(0xFFDB, b"\x00"
                    + qy.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
                    + b"\x01"
                    + qc.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes())
        out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
                    + bytes([1, samp, 0, 2, 0x11, 1, 3, 0x11, 1]))
        out += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
        out += _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
        out += _seg(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
        out += _seg(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C))
        if ri:
            out += _seg(0xFFDD, struct.pack(">H", ri))
        out += _seg(0xFFDA, b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11])
                    + b"\x00\x3F\x00")
        out += entropy
        out += b"\xFF\xD9"
        return bytes(out)

    @staticmethod
    def decode_pixels(blob: bytes) -> np.ndarray:
        """Grayscale streams → (h, w) uint8; 3-component YCbCr streams
        (interleaved baseline scan, sampling factors ≤ 2×2) →
        (h, w, 3) uint8 RGB with nearest-neighbor chroma upsampling."""
        data = bytes(blob)
        if data[:2] != b"\xFF\xD8":
            raise ValueError("not a JPEG (no SOI)")
        pos = 2
        quants: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], tuple] = {}
        w = h = None
        restart_ri = 0
        comps: list = []          # (id, hs, vs, tq) in SOF order
        scan: dict = {}           # comp id -> (dc table id, ac table id)
        progressive = False
        pzz = None                # progressive coefficient state
        while True:
            if data[pos] != 0xFF:
                raise ValueError("expected marker")
            marker = data[pos + 1]
            pos += 2
            if marker == 0xD9:
                if progressive and pzz is not None:  # normal end
                    return JpegCodec._finish_decode(
                        pzz, comps, pdims, quants, phmax, pvmax,
                        h, w, len(comps))
                raise ValueError("EOI before scan data")
            (ln,) = struct.unpack_from(">H", data, pos)
            body = data[pos + 2:pos + ln]
            pos += ln
            if marker == 0xDB:                    # DQT (maybe several)
                bp = 0
                while bp < len(body):
                    pq, tq = body[bp] >> 4, body[bp] & 0x0F
                    if pq:
                        raise NotImplementedError("16-bit quant tables")
                    tbl = np.frombuffer(body, np.uint8, 64, bp + 1)
                    nat = np.empty(64, np.int32)
                    nat[ZIGZAG] = tbl
                    quants[tq] = nat.reshape(8, 8)
                    bp += 65
            elif marker in (0xC0, 0xC1, 0xC2):    # SOF0/1/2
                progressive = marker == 0xC2
                prec, h, w, nc = struct.unpack_from(">BHHB", body)
                if h * w > (1 << 26):
                    # untrusted-corpus guard: a corrupted SOF can
                    # declare 65535x65535 and balloon the coefficient
                    # buffers; 64 MP is far past any thumbnail stage
                    raise ValueError(
                        f"image dimensions {w}x{h} exceed the "
                        "decoder's 64-megapixel sanity cap")
                if prec != 8 or nc not in (1, 3):
                    raise NotImplementedError(
                        f"JpegCodec decodes 8-bit 1/3-component "
                        f"baseline; got precision={prec} components="
                        f"{nc} — CMYK etc. go through the lib-backed "
                        "integration point")
                for c in range(nc):
                    cid = body[6 + 3 * c]
                    hs, vs = body[7 + 3 * c] >> 4, body[7 + 3 * c] & 0x0F
                    if not (1 <= hs <= 2 and 1 <= vs <= 2):
                        raise NotImplementedError(
                            f"sampling factor {hs}x{vs} > 2x2 goes "
                            "through the lib-backed integration point")
                    comps.append((cid, hs, vs, body[8 + 3 * c]))
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    "lossless/arithmetic/hierarchical JPEG goes "
                    "through the lib-backed integration point")
            elif marker == 0xC4:                  # DHT (maybe several)
                bp = 0
                while bp < len(body):
                    tc, th = body[bp] >> 4, body[bp] & 0x0F
                    bits = list(body[bp + 1:bp + 17])
                    n = sum(bits)
                    vals = list(body[bp + 17:bp + 17 + n])
                    huff[(tc, th)] = _huff_lut(bits, vals)
                    bp += 17 + n
            elif marker == 0xDD:                  # DRI (T.81 B.2.4.4)
                (restart_ri,) = struct.unpack_from(">H", body)
            elif marker == 0xDA:                  # SOS
                ns = body[0]
                if progressive:
                    if pzz is None:               # first scan: alloc
                        phmax = max(c[1] for c in comps)
                        pvmax = max(c[2] for c in comps)
                        pmcux = -(-w // (8 * phmax))
                        pmcuy = -(-h // (8 * pvmax))
                        pdims, pzz = [], []
                        for _cid, hs, vs, _tq in comps:
                            bw_c, bh_c = pmcux * hs, pmcuy * vs
                            pdims.append((bh_c, bw_c))
                            pzz.append(np.zeros((bh_c * bw_c, 64),
                                                np.int32))
                    cid_to_idx = {c[0]: i for i, c in enumerate(comps)}
                    scomps = []
                    for s_ in range(ns):
                        cid = body[1 + 2 * s_]
                        scomps.append((cid_to_idx[cid],
                                       body[2 + 2 * s_] >> 4,
                                       body[2 + 2 * s_] & 0x0F))
                    ss_, se_ = body[1 + 2 * ns], body[2 + 2 * ns]
                    ah_ = body[3 + 2 * ns] >> 4
                    al_ = body[3 + 2 * ns] & 0x0F
                    pos = _decode_prog_scan(
                        data, pos, scomps, ss_, se_, ah_, al_,
                        comps, pdims, pzz, huff, restart_ri,
                        w, h, pmcux, pmcuy)
                    continue
                if ns != len(comps):
                    raise NotImplementedError(
                        "non-interleaved multi-scan baseline")
                for s_ in range(ns):
                    cid = body[1 + 2 * s_]
                    scan[cid] = (body[2 + 2 * s_] >> 4,
                                 body[2 + 2 * s_] & 0x0F)
                break
            # APPn / COM / others: skipped via the length walk
        if w is None or not comps:
            raise ValueError("missing SOF before SOS")
        nc = len(comps)
        if nc == 1:
            # single-component scans are NON-interleaved (T.81 A.2.2):
            # data units in raster order, sampling factors irrelevant
            comps = [(comps[0][0], 1, 1, comps[0][3])]
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        zzs, dims, tabs = [], [], []
        for cid, hs, vs, tq in comps:
            if tq not in quants:
                raise ValueError("missing DQT before SOS")
            bw_c, bh_c = mcux * hs, mcuy * vs
            zzs.append(np.zeros((bh_c * bw_c, 64), np.int32))
            dims.append((bh_c, bw_c))
            if cid not in scan:
                raise ValueError("SOS lacks component")
            dc_id, ac_id = scan[cid]
            tabs.append((huff[(0, dc_id)], huff[(1, ac_id)]))
        # cc fast path (codecs/_fsst_kernel.c::jpeg_decode_scan): the
        # MCU schedule — table pair, predictor slot, output row and
        # restart flag per data unit — is precomputed VECTORIZED here,
        # so the kernel is one flat C walk of the bitstream for every
        # layout (gray / 444 / 422 / 420 / restart intervals).  Any
        # kernel error falls back to the Python loop below.
        from ..codecs import _native
        if _native.available():
            slots = [(ci, by, bx)
                     for ci, (cid, hs, vs, tq) in enumerate(comps)
                     for by in range(vs) for bx in range(hs)]
            B = len(slots)
            nmcu = mcux * mcuy
            m = np.arange(nmcu, dtype=np.int64)
            mi_, mj_ = m // mcux, m % mcux
            base = np.zeros(nc + 1, np.int64)
            for ci in range(nc):
                base[ci + 1] = base[ci] + dims[ci][0] * dims[ci][1]
            tab = np.empty(nmcu * B, np.int32)
            row = np.empty(nmcu * B, np.int64)
            for si, (ci, by, bx) in enumerate(slots):
                hs, vs = comps[ci][1], comps[ci][2]
                bw_c = dims[ci][1]
                tab[si::B] = ci
                row[si::B] = (base[ci] + (mi_ * vs + by) * bw_c
                              + mj_ * hs + bx)
            rst = np.zeros(nmcu * B, np.uint8)
            if restart_ri:
                bm = np.flatnonzero((m > 0) & (m % restart_ri == 0))
                rst[bm * B] = 1
            dcs = np.concatenate([tabs[ci][0][2] for ci in range(nc)])
            dcl = np.concatenate([tabs[ci][0][3] for ci in range(nc)])
            acs = np.concatenate([tabs[ci][1][2] for ci in range(nc)])
            acl = np.concatenate([tabs[ci][1][3] for ci in range(nc)])
            kzz = _native.jpeg_decode_scan(
                np.frombuffer(data, np.uint8), pos, dcs, dcl, acs, acl,
                tab, tab, row, rst, int(base[nc]))
            if kzz is not None:
                zzs = [kzz[base[ci]:base[ci + 1]] for ci in range(nc)]
                return JpegCodec._finish_decode(
                    zzs, comps, dims, quants, hmax, vmax, h, w, nc)

        r = _BitReader(data, pos)
        pdc = [0] * nc

        def read_block(zz_row, ci):
            (dc_sym, dc_len, _, _), (ac_sym, ac_len, _, _) = tabs[ci]
            p16 = r.peek16()
            s = dc_sym[p16]
            ln = dc_len[p16]
            if not ln:
                raise ValueError("invalid DC Huffman code")
            r.skip(ln)
            if s:
                v = r.bits(s)
                if v < (1 << (s - 1)):
                    v -= (1 << s) - 1
                pdc[ci] += v
            zz_row[0] = pdc[ci]
            k = 1
            while k < 64:
                p16 = r.peek16()
                rs = ac_sym[p16]
                ln = ac_len[p16]
                if not ln:
                    raise ValueError("invalid AC Huffman code")
                r.skip(ln)
                if rs == 0x00:                    # EOB
                    break
                if rs == 0xF0:                    # ZRL
                    k += 16
                    continue
                k += rs >> 4
                s = rs & 0x0F
                if s == 0:               # run>0,size=0: not baseline
                    raise ValueError(f"invalid AC symbol 0x{rs:02x}")
                v = r.bits(s)
                if v < (1 << (s - 1)):
                    v -= (1 << s) - 1
                if k > 63:
                    raise ValueError("AC index overrun")
                zz_row[k] = v
                k += 1

        for mi in range(mcuy):
            for mj in range(mcux):
                mno = mi * mcux + mj
                if restart_ri and mno and mno % restart_ri == 0:
                    r.restart()               # byte-align, eat RSTn
                    pdc = [0] * nc            # predictors reset
                for ci, (cid, hs, vs, tq) in enumerate(comps):
                    bw_c = dims[ci][1]
                    for by in range(vs):
                        for bx in range(hs):
                            bidx = ((mi * vs + by) * bw_c
                                    + mj * hs + bx)
                            read_block(zzs[ci][bidx], ci)

        return JpegCodec._finish_decode(zzs, comps, dims, quants,
                                        hmax, vmax, h, w, nc)

    @staticmethod
    def _finish_decode(zzs, comps, dims, quants, hmax, vmax, h, w, nc):
        """Dequantize + IDCT + chroma upsample + color convert —
        shared by the cc-kernel and Python entropy decoders."""
        planes = []
        for ci, (cid, hs, vs, tq) in enumerate(comps):
            bh_c, bw_c = dims[ci]
            nat = np.zeros((bh_c * bw_c, 64), np.int32)
            nat[:, ZIGZAG] = zzs[ci]
            coef = nat.reshape(-1, 8, 8).astype(np.float64) * quants[tq]
            blocks = np.einsum("xu,nuv,yv->nxy", _C.T, coef, _C.T)
            plane = (blocks.reshape(bh_c, bw_c, 8, 8)
                     .transpose(0, 2, 1, 3)
                     .reshape(bh_c * 8, bw_c * 8) + 128.0)
            # nearest-neighbor upsample to full grid, crop to (h, w)
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                              hmax // hs, axis=1)[:h, :w]
            planes.append(plane)
        if nc == 1:
            return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return ycbcr_to_rgb(planes[0], planes[1], planes[2])


# ---------------------------------------------------------------------------
# PROGRESSIVE JPEG (T.81 Annex G, spectral selection + successive
# approximation).  Decode handles the four real-world scan types — DC
# first (interleaved or not), DC refinement (raw bits), AC first with
# general EOB runs, and AC refinement with correction-bit buffering —
# exactly the huffman-progressive subset libjpeg emits, so real crawl
# progressive baselines decode.  The encoder emits a 1-bit
# successive-approximation ladder (Al=1 → 0) restricted to symbols the
# Annex K tables can code (EOB runs of length 1), which is a legal
# stream any decoder accepts; its purpose is the closed differential
# loop: decode(encode_progressive(px)) must be BIT-IDENTICAL to
# decode(encode(px)) because both share the same quantized
# coefficients.  Scan loops are per-coefficient Python — progressive
# is a long-tail format; the sequential cc kernels carry the volume.

def _noninterleaved_grid(w: int, h: int, hs: int, vs: int,
                         hmax: int, vmax: int, bw_pad: int) -> list:
    """Raster block indices of a component's NON-interleaved scan
    (T.81 A.2.2: ceil dims of the scaled component, NOT the padded
    MCU grid), as rows of the padded coefficient array."""
    cw = -(-w * hs // hmax)
    ch = -(-h * vs // vmax)
    bx, by = -(-cw // 8), -(-ch // 8)
    return [r * bw_pad + c for r in range(by) for c in range(bx)]


def _shift_to_zero(v: int, al: int) -> int:
    """AC point transform: magnitude shift, sign preserved (G.1.2.2)."""
    return -((-v) >> al) if v < 0 else v >> al


class _ProgressiveEncoder:
    def __init__(self, bw_: _BitWriter, dc_encs, ac_encs):
        self.bw = bw_
        self.dc_encs = dc_encs
        self.ac_encs = ac_encs

    def dc_first(self, blocks_in_scan, al: int, ncomp: int) -> None:
        """blocks_in_scan: [(comp_idx, zz_row)] in scan order."""
        pred = [0] * ncomp
        for ci, row in blocks_in_scan:
            v = int(row[0]) >> al
            diff = v - pred[ci]
            pred[ci] = v
            s = _category(diff)
            self.bw.write(*self.dc_encs[ci][s])
            if s:
                self.bw.write(diff if diff > 0 else diff + (1 << s) - 1,
                              s)

    def dc_refine(self, blocks_in_scan, al: int) -> None:
        for _ci, row in blocks_in_scan:
            self.bw.write((int(row[0]) >> al) & 1, 1)

    def ac_first(self, zz, indices, ci: int, ss: int, se: int,
                 al: int) -> None:
        enc = self.ac_encs[ci]
        band = np.asarray(zz)[np.asarray(indices, np.int64), ss:se + 1]
        sign = np.sign(band)
        shifted = sign * (np.abs(band) >> al)     # trunc-toward-zero
        for bi in range(len(band)):
            row = shifted[bi]
            nz = np.flatnonzero(row)              # skip zeros wholesale
            prev_k = -1
            for k in nz:
                run = int(k) - prev_k - 1
                prev_k = int(k)
                while run > 15:
                    self.bw.write(*enc[0xF0])
                    run -= 16
                v = int(row[k])
                s = _category(v)
                self.bw.write(*enc[(run << 4) | s])
                self.bw.write(v if v > 0 else v + (1 << s) - 1, s)
            if len(nz) == 0 or int(nz[-1]) < se - ss:
                self.bw.write(*enc[0x00])         # EOB (run length 1)

    def ac_refine(self, zz, indices, ci: int, ss: int, se: int,
                  al: int) -> None:
        """libjpeg's correction-bit buffering, EOB runs capped at 1
        so the Annex K tables suffice."""
        enc = self.ac_encs[ci]
        for idx in indices:
            row = zz[idx]
            # last NEWLY-significant position: ZRLs are only emitted
            # while more newly-significant coefficients lie ahead —
            # past it, runs and corrections fold into the EOB
            # (libjpeg jcphuff.c discipline, which is what the
            # decoder's advance loop expects)
            band = np.asarray(row[ss:se + 1])
            absb = np.abs(band)
            newly = np.flatnonzero((band != 0) & ((absb >> (al + 1)) == 0))
            eob_pos = int(newly[-1]) + ss if len(newly) else 0
            nzk = np.flatnonzero(band) + ss       # skip zeros wholesale
            run = 0
            buffered: list = []
            prev_k = ss - 1
            for k in nzk:
                k = int(k)
                v = int(row[k])
                run += k - prev_k - 1
                prev_k = k
                while run > 15 and k <= eob_pos:
                    self.bw.write(*enc[0xF0])
                    run -= 16
                    for b in buffered:
                        self.bw.write(b, 1)
                    buffered = []
                if _shift_to_zero(v, al + 1) != 0:
                    buffered.append((abs(v) >> al) & 1)
                    continue
                self.bw.write(*enc[(run << 4) | 1])   # newly ±1<<al
                self.bw.write(1 if v > 0 else 0, 1)
                for b in buffered:
                    self.bw.write(b, 1)
                buffered = []
                run = 0
            run += se - prev_k                    # trailing zero run
            if run or buffered:
                self.bw.write(*enc[0x00])         # EOB, run length 1
                for b in buffered:
                    self.bw.write(b, 1)


def _read_sym(r: _BitReader, sym, ln) -> int:
    p16 = r.peek16()
    length = ln[p16]
    if not length:
        raise ValueError("invalid Huffman code in progressive scan")
    r.skip(length)
    return sym[p16]


def _receive_extend(r: _BitReader, s: int) -> int:
    v = r.bits(s)
    if v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v


def _decode_prog_scan(data: bytes, pos: int, scomps, ss, se, ah, al,
                      comps, dims, zzs, huff, restart_ri,
                      w, h, mcux, mcuy) -> int:
    """Decode ONE progressive scan (T.81 G.2), updating the
    coefficient arrays in place; returns the byte position of the
    next marker.  scomps: [(comp_index_in_frame, dc_id, ac_id)]."""
    r = _BitReader(data, pos)
    eobrun = 0
    ns = len(scomps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    if ss == 0:                                   # DC scan
        pred = [0] * len(comps)
        if ns > 1:                                # interleaved MCUs
            units = []
            for mi in range(mcuy):
                for mj in range(mcux):
                    blocks = []
                    for ci, dc_id, ac_id in scomps:
                        _, hs, vs, _tq = comps[ci]
                        bw_c = dims[ci][1]
                        for by in range(vs):
                            for bx in range(hs):
                                blocks.append(
                                    (ci, dc_id,
                                     (mi * vs + by) * bw_c
                                     + mj * hs + bx))
                    units.append(blocks)
        else:
            ci, dc_id, _ac = scomps[0]
            _cid, hs, vs, _tq = comps[ci]
            grid = _noninterleaved_grid(w, h, hs, vs, hmax, vmax,
                                        dims[ci][1])
            units = [[(ci, dc_id, idx)] for idx in grid]
        for u, blocks in enumerate(units):
            if restart_ri and u and u % restart_ri == 0:
                r.restart()
                pred = [0] * len(comps)
            for ci, dc_id, idx in blocks:
                row = zzs[ci][idx]
                if ah == 0:
                    sym, ln = huff[(0, dc_id)][0], huff[(0, dc_id)][1]
                    s = _read_sym(r, sym, ln)
                    diff = _receive_extend(r, s) if s else 0
                    pred[ci] += diff
                    row[0] = pred[ci] << al
                else:                             # DC refinement
                    if r.bits(1):
                        row[0] = int(row[0]) | (1 << al)
    else:                                         # AC scan: ns == 1
        if ns != 1:
            raise ValueError("progressive AC scan must be one component")
        ci, _dc, ac_id = scomps[0]
        sym, ln = huff[(1, ac_id)][0], huff[(1, ac_id)][1]
        _cid, hs, vs, _tq = comps[ci]
        grid = _noninterleaved_grid(w, h, hs, vs, hmax, vmax,
                                    dims[ci][1])
        p1, m1 = 1 << al, -1 << al
        for u, idx in enumerate(grid):
            if restart_ri and u and u % restart_ri == 0:
                r.restart()
                eobrun = 0
            row = zzs[ci][idx]
            if ah == 0:                           # AC first
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _read_sym(r, sym, ln)
                    rr, s = rs >> 4, rs & 0x0F
                    if s:
                        k += rr
                        if k > se:
                            raise ValueError("AC index overrun")
                        row[k] = _receive_extend(r, s) << al
                        k += 1
                    elif rr == 15:
                        k += 16
                    else:
                        eobrun = (1 << rr) - 1
                        if rr:
                            eobrun += r.bits(rr)
                        break
            else:                                 # AC refinement
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _read_sym(r, sym, ln)
                        rr, s = rs >> 4, rs & 0x0F
                        if s:
                            if s != 1:
                                raise ValueError(
                                    "bad refinement magnitude")
                            newval = p1 if r.bits(1) else m1
                        elif rr != 15:
                            # EOB run INCLUDES this block: its
                            # remaining correction bits are read in
                            # the tail below (libjpeg convention)
                            eobrun = 1 << rr
                            if rr:
                                eobrun += r.bits(rr)
                            break
                        else:
                            newval = 0            # ZRL
                        while k <= se:
                            v = int(row[k])
                            if v != 0:
                                if r.bits(1) and (v & p1) == 0:
                                    row[k] = v + (p1 if v > 0 else m1)
                            else:
                                if rr == 0:
                                    break
                                rr -= 1
                            k += 1
                        if newval and k <= se:
                            row[k] = newval
                        k += 1
                if eobrun:
                    while k <= se:
                        v = int(row[k])
                        if v != 0:
                            if r.bits(1) and (v & p1) == 0:
                                row[k] = v + (p1 if v > 0 else m1)
                        k += 1
                    eobrun -= 1

    # byte-align and walk to the next real marker
    p = r.pos
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:      # stray RSTn: skip
                p += 2
                continue
            return p
        p += 1
    return n


def _sos_header(scomps, ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(scomps)])
    for cid, dc_id, ac_id in scomps:
        body += bytes([cid, (dc_id << 4) | ac_id])
    return _seg(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))


def _encode_progressive_impl(planes, quant_ids, samps, dc_tabs, ac_tabs,
                             h, w, quants) -> bytes:
    """planes: per component (zz array, bw_pad); the scan script is
    [DC first Al=1 interleaved] [AC 1-63 first Al=1 per comp]
    [DC refine] [AC refine per comp] — a real 1-bit successive-
    approximation ladder exercising all four scan types."""
    nc = len(planes)
    hmax = max(hs for hs, vs in samps)
    vmax = max(vs for hs, vs in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    dc_encs = [_build_huffman(*t) for t in dc_tabs]
    ac_encs = [_build_huffman(*t) for t in ac_tabs]

    out = bytearray(b"\xFF\xD8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = b""
    for tq, q in quants:
        dqt += bytes([tq]) \
            + q.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    out += _seg(0xFFDB, dqt)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hs, vs = samps[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, quant_ids[ci]])
    out += _seg(0xFFC2, sof)                      # SOF2: progressive
    out += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    if nc > 1:
        out += _seg(0xFFC4, b"\x01" + bytes(DC_BITS_C)
                    + bytes(DC_VALS_C))
        out += _seg(0xFFC4, b"\x11" + bytes(AC_BITS_C)
                    + bytes(AC_VALS_C))
    dc_ids = [0] + [1] * (nc - 1)
    ac_ids = [0] + [1] * (nc - 1)

    def interleaved_blocks():
        if nc == 1:
            zz, bw_pad = planes[0]
            grid = _noninterleaved_grid(w, h, 1, 1, 1, 1, bw_pad)
            return [(0, zz[i]) for i in grid]
        blocks = []
        for mi in range(mcuy):
            for mj in range(mcux):
                for ci in range(nc):
                    hs, vs = samps[ci]
                    zz, bw_pad = planes[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            blocks.append(
                                (ci, zz[(mi * vs + by) * bw_pad
                                        + mj * hs + bx]))
        return blocks

    inter = interleaved_blocks()
    scomps_all = [(ci + 1, dc_ids[ci], ac_ids[ci]) for ci in range(nc)]

    bw_ = _BitWriter()
    pe = _ProgressiveEncoder(bw_, dc_encs, ac_encs)
    pe.dc_first(inter, 1, nc)
    bw_.flush()
    out += _sos_header(scomps_all, 0, 0, 0, 1) + bw_.out

    for ci in range(nc):
        zz, bw_pad = planes[ci]
        hs, vs = samps[ci]
        grid = _noninterleaved_grid(w, h, hs, vs, hmax, vmax, bw_pad)
        bw_ = _BitWriter()
        pe = _ProgressiveEncoder(bw_, dc_encs, ac_encs)
        pe.ac_first(zz, grid, ci, 1, 63, 1)
        bw_.flush()
        out += _sos_header([(ci + 1, 0, ac_ids[ci])], 1, 63, 0, 1)
        out += bw_.out

    bw_ = _BitWriter()
    pe = _ProgressiveEncoder(bw_, dc_encs, ac_encs)
    pe.dc_refine(inter, 0)
    bw_.flush()
    out += _sos_header(scomps_all, 0, 0, 1, 0) + bw_.out

    for ci in range(nc):
        zz, bw_pad = planes[ci]
        hs, vs = samps[ci]
        grid = _noninterleaved_grid(w, h, hs, vs, hmax, vmax, bw_pad)
        bw_ = _BitWriter()
        pe = _ProgressiveEncoder(bw_, dc_encs, ac_encs)
        pe.ac_refine(zz, grid, ci, 1, 63, 0)
        bw_.flush()
        out += _sos_header([(ci + 1, 0, ac_ids[ci])], 1, 63, 1, 0)
        out += bw_.out

    out += b"\xFF\xD9"
    return bytes(out)
