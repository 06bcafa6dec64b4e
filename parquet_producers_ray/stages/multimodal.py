"""Multimodal (image/audio/video) columns as opaque ``large_binary``
with typed metadata, processed by actor-pool ``map_batches`` stages.

Decoders, by depth of realism:

- ``PngCodec`` — a REAL image decoder in pure stdlib (zlib inflate +
  full five-filter scanline reconstruction per the public PNG spec,
  W3C/RFC 2083), 8-bit in all five color types (gray, truecolor,
  palette, gray+alpha, RGBA).  ``media_features`` runs on genuinely
  decoded pixels through it.
- ``WavCodec`` — REAL RIFF/WAVE in pure stdlib (proper chunk-list
  walk, word alignment, unknown chunks skipped): PCM 8/16/24/32-bit,
  float32 AND IMA/DVI ADPCM (format 0x11, bit-identical to stdlib
  audioop's reference), any channel count (downmixed to the int16
  mono contract).  ``audio_chunks`` decodes genuine WAV containers.
- ``GifCodec`` — REAL animated GIF89a (genuine variable-width LZW per
  the public spec's Appendix F — cc kernel fast path with the Python
  implementation as differential-pinned fallback — grayscale global
  color table, extension/sub-block walking).  ``video_frames_gif``
  decodes every frame of genuine multi-frame containers through it —
  the video-shaped media path.
- ``stages/jpeg.py::JpegCodec`` — REAL JFIF, grayscale and
  4:2:0/4:2:2/4:4:4 YCbCr color, restart intervals, PROGRESSIVE
  (SOF2) decode incl. AC successive-approximation refinement, cc
  entropy kernels for the sequential scans.
- ``FakeImageCodec`` / ``FakeAudioCodec`` — deterministic stand-in
  formats that keep the rest of the plumbing (resize grid math, audio
  chunking, frame sampling) exactly unit-testable without media libs.
- ``PillowImageDecoder`` — the documented integration point for the
  REMAINING lib-backed formats (arithmetic/lossless JPEG, WebP,
  mp3/opus, mp4); raises ``NotImplementedError``.

Usage:
    ds.map_batches(ImageFeatureStage, concurrency=(2, 8),
                   batch_size=64, batch_format="pyarrow")
Binary payloads are wide: keep ``batch_size`` small so
batch x concurrency fits worker heaps (SURVEY.md §4 memory row).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

MAGIC = b"FIMG"
HEADER = struct.Struct("<4sIII")  # magic, width, height, payload_len

FEATURE_SCHEMA = pa.schema([
    pa.field("width", pa.int64()),
    pa.field("height", pa.int64()),
    pa.field("n_bytes", pa.int64()),
    pa.field("checksum", pa.int64()),
])


class FakeImageCodec:
    """Deterministic stand-in image format: header + raw payload."""

    @staticmethod
    def encode(width: int, height: int, payload: bytes) -> bytes:
        return HEADER.pack(MAGIC, width, height, len(payload)) + payload

    @staticmethod
    def decode(blob: bytes) -> dict:
        magic, width, height, n = HEADER.unpack_from(blob)
        if magic != MAGIC:
            raise ValueError("not a FIMG blob")
        payload = blob[HEADER.size: HEADER.size + n]
        return {"width": width, "height": height,
                "n_bytes": len(payload),
                "checksum": zlib.crc32(payload)}


class PillowImageDecoder:
    """Integration point for the REMAINING lib-backed formats whose
    binary codecs this container doesn't ship: arithmetic-coded /
    lossless / hierarchical JPEG, WebP, and video containers
    (ffmpeg).  PNG (all five color types), GIF, and huffman JPEG —
    baseline AND progressive, grayscale AND interleaved 3-component
    YCbCr at 4:4:4 / 4:2:2 / 4:2:0, i.e. the dominant crawl-image
    layouts — are genuinely decoded by :class:`PngCodec` /
    :class:`GifCodec` / ``stages/jpeg.py::JpegCodec``; everything
    else would hold a PIL/libjpeg handle per actor here."""

    def decode(self, blob: bytes) -> dict:
        raise NotImplementedError(
            "arithmetic/lossless JPEG / WebP / video decode requires "
            "Pillow/libjpeg/ffmpeg; wire it here and construct "
            "ImageFeatureStage(decoder=PillowImageDecoder()); PNG, "
            "GIF and huffman JPEG (baseline + progressive, gray + "
            "4:2:0/4:2:2/4:4:4 color) are handled natively by "
            "PngCodec/GifCodec/JpegCodec")


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §6.6), vectorized over a scanline."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a,
                   np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


# color type -> bytes per pixel (8-bit depth)
_PNG_BPP = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngCodec:
    """REAL PNG, pure stdlib: zlib + the five scanline filters of the
    public spec (W3C PNG / RFC 2083), 8-bit depth.  Decode covers ALL
    five color types — grayscale (0), truecolor RGB (2), palette (3,
    PLTE-expanded to RGB), gray+alpha (4) and RGBA (6) — with the
    filter reconstruction generalized to the type's bytes-per-pixel;
    encode emits grayscale (from an (h, w) array) or truecolor (from
    (h, w, 3)).  ``encode`` cycles the filter type per row
    (None/Sub/Up/Average/Paeth) so a decode exercises the full
    reconstruction path, and the output round-trips through any
    standard PNG tool.  Per-actor construction cost is nil; decode is
    zlib-bound."""

    @staticmethod
    def encode(pixels: np.ndarray) -> bytes:
        px = np.asarray(pixels, dtype=np.uint8)
        if px.ndim == 3 and px.shape[2] == 3:
            ctype, bpp = 2, 3
            h, w = px.shape[:2]
            rows = px.reshape(h, w * 3)
        else:
            ctype, bpp = 0, 1
            h, w = px.shape
            rows = px
        stride = w * bpp
        raw = bytearray()
        prev = np.zeros(stride, np.uint8)
        for r in range(h):
            row = rows[r]
            ft = r % 5
            a = np.concatenate((np.zeros(bpp, np.uint8),
                                row[:-bpp])).astype(np.uint8)
            c = np.concatenate((np.zeros(bpp, np.uint8),
                                prev[:-bpp])).astype(np.uint8)
            if ft == 0:
                filt = row
            elif ft == 1:
                filt = (row.astype(np.int16) - a) % 256
            elif ft == 2:
                filt = (row.astype(np.int16) - prev) % 256
            elif ft == 3:
                filt = (row.astype(np.int16)
                        - (a.astype(np.int16) + prev) // 2) % 256
            else:
                filt = (row.astype(np.int16)
                        - _paeth(a, prev, c)) % 256
            raw.append(ft)
            raw.extend(filt.astype(np.uint8).tobytes())
            prev = row

        def chunk(tag: bytes, data: bytes) -> bytes:
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data)))

        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        return (PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    @staticmethod
    def decode_pixels(blob: bytes) -> np.ndarray:
        """(h, w) uint8 for grayscale, (h, w, 3) for truecolor AND
        palette (PLTE-expanded), (h, w, 2) gray+alpha, (h, w, 4)
        RGBA."""
        if bytes(blob[:8]) != PNG_SIG:
            raise ValueError("not a PNG")
        pos = 8
        w = h = None
        ctype = 0
        plte = None
        idat = bytearray()
        n = len(blob)
        while pos + 8 <= n:
            (length,) = struct.unpack_from(">I", blob, pos)
            tag = bytes(blob[pos + 4:pos + 8])
            data = bytes(blob[pos + 8:pos + 8 + length])
            pos += 12 + length          # len + tag + data + crc
            if tag == b"IHDR":
                w, h, depth, ctype, comp, filt, ilace = \
                    struct.unpack(">IIBBBBB", data)
                if depth != 8 or comp or filt or ilace \
                        or ctype not in _PNG_BPP:
                    raise NotImplementedError(
                        "PngCodec decodes 8-bit non-interlaced PNG "
                        "(color types 0/2/3/4/6); got "
                        f"depth={depth} colortype={ctype} "
                        f"interlace={ilace} — lib-backed formats go "
                        "through PillowImageDecoder")
            elif tag == b"PLTE":
                plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
            elif tag == b"IDAT":
                idat.extend(data)
            elif tag == b"IEND":
                break
        if w is None:
            raise ValueError("PNG without IHDR")
        bpp = _PNG_BPP[ctype]
        stride = w * bpp
        raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG scanline payload size mismatch")
        raw = raw.reshape(h, stride + 1)
        out = np.zeros((h, stride), np.uint8)
        prev = np.zeros(stride, np.uint8)
        for r in range(h):
            ft = int(raw[r, 0])
            line = raw[r, 1:].astype(np.int64)
            if ft == 0:
                row = line.astype(np.uint8)
            elif ft == 1:
                # Sub: out[i] = line[i] + out[i-bpp] — bpp independent
                # interleaved prefix sums, one cumsum per byte lane
                row = (np.cumsum(line.reshape(w, bpp), axis=0) % 256) \
                    .astype(np.uint8).reshape(stride)
            elif ft == 2:
                row = ((line + prev) % 256).astype(np.uint8)
            elif ft in (3, 4):
                # Average/Paeth reference the in-progress row —
                # inherently sequential in x; pure-int inner loop
                # (no per-pixel array allocation)
                pv = prev.tolist()
                ln = line.tolist()
                acc = []
                for x in range(stride):
                    left = acc[x - bpp] if x >= bpp else 0
                    up = pv[x]
                    if ft == 3:
                        pred = (left + up) >> 1
                    else:
                        ul = pv[x - bpp] if x >= bpp else 0
                        p = left + up - ul
                        pa_ = abs(p - left)
                        pb = abs(p - up)
                        pc_ = abs(p - ul)
                        pred = left if (pa_ <= pb and pa_ <= pc_) \
                            else (up if pb <= pc_ else ul)
                    acc.append((ln[x] + pred) & 0xFF)
                row = np.array(acc, np.uint8)
            else:
                raise ValueError(f"unknown PNG filter type {ft}")
            out[r] = row
            prev = row
        if ctype == 0:
            return out
        if ctype == 3:
            if plte is None:
                raise ValueError("palette PNG without PLTE")
            return plte[out.reshape(h, w)]
        return out.reshape(h, w, bpp)

    @staticmethod
    def decode(blob: bytes) -> dict:
        px = PngCodec.decode_pixels(blob)
        h, w = px.shape[:2]
        return {"width": w, "height": h, "n_bytes": int(px.size),
                "checksum": zlib.crc32(px.tobytes())}


def synthesize_png_column(batch: pa.Table, text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """Deterministic REAL-PNG binary column from the documents table:
    width/height derived from the doc id, pixels = the utf-8 text
    bytes zero-padded/truncated to the grid (the same deterministic
    rule the SQL oracle replays), encoded through the genuine PNG path
    with per-row filter cycling."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    blobs = []
    for i, t in zip(ids, texts):
        w = int(i) % 64 + 1
        h = int(i) % 48 + 1
        raw = np.frombuffer(t.encode("utf-8"), np.uint8)[:w * h]
        grid = np.zeros(w * h, np.uint8)
        grid[:len(raw)] = raw
        blobs.append(PngCodec.encode(grid.reshape(h, w)))
    return pa.table({
        id_col: batch.column(id_col),
        "image": pa.array(blobs, type=pa.large_binary()),
    })


class PngFeatureStage:
    """Actor-pool stage over GENUINELY DECODED pixels: inflate +
    unfilter each PNG (PngCodec), emit dimensions plus two
    closed-form pixel digests (plain and position-weighted byte sums)
    that the SQL oracle recomputes from the source rule — so the
    decode path itself is value-checked, not just the row count."""

    def __init__(self, binary_col: str = "image",
                 id_col: str = "doc_id"):
        self.binary_col = binary_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, sums, wsums = [], [], [], [], []
        for i, v in zip(batch.column(self.id_col).to_pylist(),
                        batch.column(self.binary_col).to_pylist()):
            ids.append(i)
            if v is None:
                ws.append(None), hs.append(None)
                sums.append(None), wsums.append(None)
                continue
            grid = PngCodec.decode_pixels(v)
            h, w = grid.shape
            px = grid.reshape(-1).astype(np.int64)
            ws.append(w)
            hs.append(h)
            sums.append(int(px.sum()))
            wsums.append(int((px * np.arange(1, px.size + 1)).sum()))
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "payload_sum": pa.array(sums, pa.int64()),
            "payload_wsum": pa.array(wsums, pa.int64()),
        })


class PngThumbnailStage:
    """Actor-pool stage over REAL PNGs end to end: inflate + unfilter
    (PngCodec.decode_pixels), nearest-neighbor resample to a fixed
    thumbnail grid, RE-ENCODE as genuine PNG (per-row filter cycling),
    then decode the thumbnail AGAIN and digest its pixels — decode,
    transform and encode are all genuinely exercised per image, and
    the emitted digests come from the re-decoded bytes so a bug in any
    of the three steps shows up in the value check."""

    def __init__(self, width: int = 16, height: int = 16,
                 binary_col: str = "image", id_col: str = "doc_id"):
        self.w = width
        self.h = height
        self.binary_col = binary_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, blobs, sums, wsums = [], [], [], []
        wgt = np.arange(1, self.w * self.h + 1, dtype=np.int64)
        for i, v in zip(batch.column(self.id_col).to_pylist(),
                        batch.column(self.binary_col).to_pylist()):
            ids.append(i)
            if v is None:
                blobs.append(None), sums.append(None)
                wsums.append(None)
                continue
            grid = PngCodec.decode_pixels(v)
            h, w = grid.shape
            ri = (np.arange(self.h) * h) // self.h
            ci = (np.arange(self.w) * w) // self.w
            thumb = grid[np.ix_(ri, ci)]
            tb = PngCodec.encode(thumb)
            blobs.append(tb)
            px = PngCodec.decode_pixels(tb).reshape(-1).astype(np.int64)
            sums.append(int(px.sum()))
            wsums.append(int((px * wgt).sum()))
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "thumb": pa.array(blobs, pa.large_binary()),
            "width": pa.array(np.full(len(ids), self.w, np.int64)),
            "height": pa.array(np.full(len(ids), self.h, np.int64)),
            "payload_sum": pa.array(sums, pa.int64()),
            "payload_wsum": pa.array(wsums, pa.int64()),
        })


class _SniffImageDecoder:
    """Container-sniffing image decoder: real PNG/JPEG/GIF blobs route
    to their genuine decoders, the FIMG stand-in to FakeImageCodec —
    a mixed crawl corpus needs no per-file format hint (the image
    counterpart of :class:`_SniffAudioDecoder`).  Emits the common
    feature dict (width/height/n_bytes/checksum of DECODED pixels;
    for animated GIF, n_bytes and checksum cover every frame)."""

    def decode(self, blob: bytes) -> dict:
        head = bytes(blob[:8])
        if head == PNG_SIG:
            return PngCodec.decode(blob)
        if head[:2] == b"\xFF\xD8":
            from .jpeg import JpegCodec
            px = JpegCodec.decode_pixels(blob)
            h, w = px.shape[:2]         # gray (h,w) or color (h,w,3)
            return {"width": w, "height": h, "n_bytes": int(px.size),
                    "checksum": zlib.crc32(px.tobytes())}
        if head[:6] in (b"GIF89a", b"GIF87a"):
            frames = GifCodec.decode_frames(blob)
            h, w = frames[0].shape
            crc = 0
            for f in frames:
                crc = zlib.crc32(f.tobytes(), crc)
            return {"width": w, "height": h,
                    "n_bytes": sum(int(f.size) for f in frames),
                    "checksum": crc}
        return FakeImageCodec.decode(blob)


class ImageFeatureStage:
    """Actor-pool stage: decode a binary image column into feature
    columns.  The codec is constructed ONCE per actor (``__init__``),
    batches stream through ``__call__``; the default decoder sniffs
    the container, so mixed PNG/JPEG/GIF/FIMG corpora stream through
    one stage."""

    def __init__(self, binary_col: str = "image",
                 id_col: str = "doc_id", decoder=None):
        self.binary_col = binary_col
        self.id_col = id_col
        self.decoder = decoder or _SniffImageDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.binary_col)
        feats = {name: [] for name in FEATURE_SCHEMA.names}
        for v in blobs.to_pylist():
            if v is None:   # missing media is normal in crawl data
                for name in FEATURE_SCHEMA.names:
                    feats[name].append(None)
                continue
            d = self.decoder.decode(v)
            for name in FEATURE_SCHEMA.names:
                feats[name].append(int(d[name]))
        out = {self.id_col: batch.column(self.id_col)}
        for name in FEATURE_SCHEMA.names:
            out[name] = pa.array(feats[name],
                                 type=FEATURE_SCHEMA.field(name).type)
        return pa.table(out)


def synthesize_image_column(batch: pa.Table, text_col: str = "text",
                            id_col: str = "doc_id") -> pa.Table:
    """Deterministic binary column from the documents table: width /
    height derived from the doc id, payload = the utf-8 text bytes.
    Lets the multimodal plumbing run (and be oracle-checked) without
    real media files."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    blobs = [FakeImageCodec.encode(int(i) % 640 + 1, int(i) % 480 + 1,
                                   t.encode("utf-8"))
             for i, t in zip(ids, texts)]
    return pa.table({
        id_col: batch.column(id_col),
        "image": pa.array(blobs, type=pa.large_binary()),
    })


class ImageResizeStage:
    """Actor-pool stage: binary image column in, RESIZED binary image
    column out (the thumbnail/normalize step every multimodal training
    pipeline runs before feature extraction).  The fake format's
    payload is treated as a row-major grayscale grid (zero-padded /
    truncated to width×height) and resampled NEAREST-NEIGHBOR — fully
    deterministic, so the plumbing is exactly unit-testable; a real
    deployment swaps ``decoder``/the resample kernel for
    PIL.Image.resize while keeping this actor/batch shape.  Emits the
    resized blob plus its feature row (dims / bytes / checksum)."""

    def __init__(self, width: int = 64, height: int = 64,
                 binary_col: str = "image", id_col: str = "doc_id",
                 decoder=None):
        self.w = width
        self.h = height
        self.binary_col = binary_col
        self.id_col = id_col
        self.decoder = decoder or FakeImageCodec()

    def _resize_one(self, blob: bytes) -> bytes:
        magic, w, h, n = HEADER.unpack_from(blob)
        if magic != MAGIC:
            raise ValueError("not a FIMG blob")
        raw = np.frombuffer(blob, np.uint8,
                            count=min(n, w * h), offset=HEADER.size)
        grid = np.zeros(w * h, np.uint8)
        grid[:len(raw)] = raw
        grid = grid.reshape(h, w)
        ri = (np.arange(self.h) * h) // self.h
        ci = (np.arange(self.w) * w) // self.w
        out = grid[np.ix_(ri, ci)]
        return FakeImageCodec.encode(self.w, self.h, out.tobytes())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, blobs, dims = [], [], {k: [] for k in FEATURE_SCHEMA.names}
        for i, v in zip(batch.column(self.id_col).to_pylist(),
                        batch.column(self.binary_col).to_pylist()):
            ids.append(i)
            if v is None:
                blobs.append(None)
                for k in FEATURE_SCHEMA.names:
                    dims[k].append(None)
                continue
            rb = self._resize_one(v)
            blobs.append(rb)
            d = FakeImageCodec.decode(rb)
            for k in FEATURE_SCHEMA.names:
                dims[k].append(int(d[k]))
        out = {self.id_col: pa.array(ids, batch.column(
            self.id_col).type),
            self.binary_col: pa.array(blobs, pa.large_binary())}
        for k in FEATURE_SCHEMA.names:
            out[k] = pa.array(dims[k], FEATURE_SCHEMA.field(k).type)
        return pa.table(out)


AUDIO_MAGIC = b"FAUD"
AUDIO_HEADER = struct.Struct("<4sII")  # magic, sample_rate, n_samples


# IMA/DVI ADPCM tables (IMA Digital Audio Focus Group, 1992 — the
# same public tables stdlib audioop uses; cross-checked in tests).
_IMA_STEP = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_adpcm_decode(data: bytes, channels: int,
                      block_align: int) -> np.ndarray:
    """WAV IMA-ADPCM (format tag 0x11) → interleaved int16.  Block
    layout per the public spec: a 4-byte (predictor, index, reserved)
    header per channel, then 4-byte nibble words round-robin across
    channels, low nibble first.  Inherently sequential (each nibble
    feeds the next predictor), so this is a Python loop — ADPCM is a
    long-tail format; PCM volume goes through the vectorized paths."""
    if block_align < 4 * channels + 4:
        raise ValueError("IMA-ADPCM block_align too small")
    out_ch: list = [[] for _ in range(channels)]
    nblocks = len(data) // block_align
    for b in range(nblocks):
        blk = data[b * block_align:(b + 1) * block_align]
        preds = []
        idxs = []
        for c in range(channels):
            pred = int.from_bytes(blk[4 * c:4 * c + 2], "little",
                                  signed=True)
            idx = min(max(blk[4 * c + 2], 0), 88)
            preds.append(pred)
            idxs.append(idx)
            out_ch[c].append(pred)      # header predictor IS sample 0
        body = blk[4 * channels:]
        pos = 0
        chan = 0
        while pos + 4 <= len(body):
            c = chan
            pred, idx = preds[c], idxs[c]
            buf = out_ch[c]
            for byte in body[pos:pos + 4]:
                for nib in (byte & 0x0F, byte >> 4):
                    step = _IMA_STEP[idx]
                    diff = step >> 3
                    if nib & 1:
                        diff += step >> 2
                    if nib & 2:
                        diff += step >> 1
                    if nib & 4:
                        diff += step
                    if nib & 8:
                        diff = -diff
                    pred = max(-32768, min(32767, pred + diff))
                    idx = max(0, min(88, idx + _IMA_INDEX[nib & 7]))
                    buf.append(pred)
            preds[c], idxs[c] = pred, idx
            pos += 4
            chan = (chan + 1) % channels
    m = min(len(x) for x in out_ch) if channels > 1 else len(out_ch[0])
    inter = np.empty(m * channels, np.int16)
    for c in range(channels):
        inter[c::channels] = np.array(out_ch[c][:m], np.int16)
    return inter


class WavCodec:
    """REAL RIFF/WAVE, pure stdlib, per the public RIFF/WAVE spec
    (Microsoft/IBM multimedia programming interface, 1991).
    ``encode`` writes canonical PCM 16-bit mono (44-byte header +
    little-endian int16) that plays in any standard audio tool.
    ``decode`` walks the chunk list properly (word-aligned, unknown
    chunks like LIST/fact skipped) and covers the real-corpus PCM
    variants: 8-bit unsigned, 16-bit, 24-bit and 32-bit integer
    (format tag 1), IEEE float32 (tag 3) plus IMA/DVI ADPCM (tag
    0x11, decode pinned bit-identical to stdlib audioop's DVI
    implementation), ANY channel count
    (multi-channel downmixes to mono by integer mean — the analysis
    stages' contract is one sample stream), everything normalized to
    the int16 range.  Same (rate, samples) contract as
    FakeAudioCodec — the two are drop-in interchangeable for every
    audio stage; compressed formats (mp3/opus) stay at the
    ffmpeg/soundfile integration point."""

    @staticmethod
    def encode(sample_rate: int, samples: np.ndarray) -> bytes:
        s = np.asarray(samples, dtype="<i2")
        data = s.tobytes()
        byte_rate = sample_rate * 2           # mono, 16-bit
        fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate,
                          2, 16)
        body = (b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        if len(data) % 2:                     # RIFF chunks word-align
            body += b"\x00"
        return b"RIFF" + struct.pack("<I", len(body)) + body

    @staticmethod
    def decode(blob: bytes) -> tuple[int, np.ndarray]:
        if bytes(blob[:4]) != b"RIFF" or bytes(blob[8:12]) != b"WAVE":
            raise ValueError("not a RIFF/WAVE blob")
        pos, n = 12, len(blob)
        rate = None
        data = None
        wformat, channels, bits = 1, 1, 16
        while pos + 8 <= n:
            tag = bytes(blob[pos:pos + 4])
            (length,) = struct.unpack_from("<I", blob, pos + 4)
            body = blob[pos + 8:pos + 8 + length]
            pos += 8 + length + (length & 1)  # chunks are word-aligned
            if tag == b"fmt ":
                wformat, channels, rate, _br, balign, bits = \
                    struct.unpack_from("<HHIIHH", body)
                ok = (wformat == 1 and bits in (8, 16, 24, 32)) \
                    or (wformat == 3 and bits == 32) \
                    or (wformat == 17 and bits == 4)
                if not ok or channels < 1:
                    raise NotImplementedError(
                        "WavCodec decodes PCM 8/16/24/32-bit, "
                        "float32 and IMA-ADPCM; got "
                        f"format={wformat} channels={channels} "
                        f"bits={bits} — other compressed formats go "
                        "through the ffmpeg/soundfile integration "
                        "point")
            elif tag == b"data":
                data = bytes(body)
        if rate is None or data is None:
            raise ValueError("WAVE without fmt/data chunk")
        if wformat == 17:                     # IMA/DVI ADPCM
            samples = _ima_adpcm_decode(data, channels, balign)
        elif wformat == 3:                    # IEEE float32 → int16
            f = np.frombuffer(data, dtype="<f4")
            samples = np.clip(np.round(f * 32767.0), -32768,
                              32767).astype(np.int16)
        elif bits == 8:                       # unsigned, 128-centered
            samples = ((np.frombuffer(data, np.uint8).astype(np.int16)
                        - 128) << 8)
        elif bits == 16:
            samples = np.frombuffer(data, dtype="<i2")
        elif bits == 24:                      # 3-byte LE → high 16
            b3 = np.frombuffer(data, np.uint8)
            b3 = b3[:len(b3) - len(b3) % 3].reshape(-1, 3)
            v = (b3[:, 0].astype(np.int32)
                 | (b3[:, 1].astype(np.int32) << 8)
                 | (b3[:, 2].astype(np.int32) << 16))
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            samples = (v >> 8).astype(np.int16)
        else:                                 # 32-bit int → high 16
            samples = (np.frombuffer(data, dtype="<i4")
                       >> 16).astype(np.int16)
        if channels > 1:                      # integer-mean downmix
            m = len(samples) - len(samples) % channels
            samples = (samples[:m].reshape(-1, channels)
                       .astype(np.int32).sum(axis=1)
                       // channels).astype(np.int16)
        return int(rate), samples


class FakeAudioCodec:
    """Deterministic stand-in audio format: header + little-endian
    int16 samples.  Real WAV goes through :class:`WavCodec`; a real
    deployment of compressed formats (mp3/opus) would hold an
    ffmpeg/soundfile handle per actor (same integration point as
    PillowImageDecoder)."""

    @staticmethod
    def encode(sample_rate: int, samples: np.ndarray) -> bytes:
        s = np.asarray(samples, dtype="<i2")
        return AUDIO_HEADER.pack(AUDIO_MAGIC, sample_rate, len(s)) \
            + s.tobytes()

    @staticmethod
    def decode(blob: bytes) -> tuple[int, np.ndarray]:
        magic, rate, n = AUDIO_HEADER.unpack_from(blob)
        if magic != AUDIO_MAGIC:
            raise ValueError("not a FAUD blob")
        samples = np.frombuffer(blob, dtype="<i2",
                                offset=AUDIO_HEADER.size, count=n)
        return rate, samples


def synthesize_audio_column(batch: pa.Table, text_col: str = "text",
                            id_col: str = "doc_id",
                            sample_rate: int = 16_000,
                            codec=None) -> pa.Table:
    """Deterministic audio column: the utf-8 text bytes become int16
    samples (zero-copy widen), containerized as REAL RIFF/WAVE PCM16
    by default (``codec=WavCodec``) — the blobs play in any standard
    audio tool; pass ``codec=FakeAudioCodec`` for the header-only
    stand-in.  Same sample values either way, so downstream features
    (and the SQL oracle replaying them from the text) are
    container-independent."""
    codec = codec or WavCodec
    blobs = []
    for t in batch.column(text_col).to_pylist():
        raw = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        # (byte - 128) * 128 stays within int16 for every byte value
        samples = (raw.astype(np.int16) - 128) * 128
        blobs.append(codec.encode(sample_rate, samples))
    return pa.table({
        id_col: batch.column(id_col),
        "audio": pa.array(blobs, type=pa.large_binary()),
    })


class _SniffAudioDecoder:
    """Container-sniffing decoder: real RIFF/WAVE blobs go through
    :class:`WavCodec`, the FAUD stand-in through
    :class:`FakeAudioCodec` — so a mixed corpus (or a stage default)
    needs no per-file format hint."""

    @staticmethod
    def decode(blob: bytes) -> tuple[int, np.ndarray]:
        if bytes(blob[:4]) == b"RIFF":
            return WavCodec.decode(blob)
        return FakeAudioCodec.decode(blob)


class AudioChunkStage:
    """Actor-pool stage: decode a binary audio column (REAL RIFF/WAVE
    via WavCodec, or the FAUD stand-in — sniffed per blob) and explode
    each clip into fixed-duration chunks with per-chunk features (RMS
    and peak) — the 1→n shape of VAD / segment-level feature
    extraction.  Codec per actor; numpy-vectorized per clip."""

    def __init__(self, binary_col: str = "audio", id_col: str = "doc_id",
                 chunk_ms: int = 25, decoder=None):
        self.binary_col = binary_col
        self.id_col = id_col
        self.chunk_ms = chunk_ms
        self.decoder = decoder or _SniffAudioDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, chunk_idx, n_samp, rms, peak = [], [], [], [], []
        for i, blob in zip(batch.column(self.id_col).to_pylist(),
                           batch.column(self.binary_col).to_pylist()):
            rate, samples = self.decoder.decode(blob)
            k = max(1, rate * self.chunk_ms // 1000)
            n = (len(samples) + k - 1) // k
            if n == 0:
                continue
            pad = np.zeros(n * k, dtype=np.float64)
            pad[: len(samples)] = samples
            chunks = pad.reshape(n, k)
            ids.extend([i] * n)
            chunk_idx.extend(range(n))
            counts = np.full(n, k, dtype=np.int64)
            counts[-1] = len(samples) - (n - 1) * k
            n_samp.extend(counts.tolist())
            rms.extend(np.sqrt((chunks ** 2).sum(axis=1)
                               / np.maximum(counts, 1)).tolist())
            peak.extend(np.abs(chunks).max(axis=1).tolist())
        return pa.table({
            self.id_col: pa.array(ids, type=pa.int64()),
            "chunk": pa.array(chunk_idx, type=pa.int64()),
            "n_samples": pa.array(n_samp, type=pa.int64()),
            "rms": pa.array(rms, type=pa.float64()),
            "peak": pa.array(peak, type=pa.float64()),
        })


GIF_HEADER = b"GIF89a"


def _lzw_encode_gif(indices: np.ndarray, min_code: int = 8) -> bytes:
    """GIF-variant LZW (spec Appendix F): variable code width starting
    at ``min_code + 1``, LSB-first bit packing, CLEAR emitted up front
    and again whenever the table fills (4096 codes).  The width grows
    the emission AFTER the entry ``1 << width`` is assigned, which is
    exactly one table-append earlier on the decoder side (it lags one
    entry) — see ``_lzw_decode_gif``.  The cc kernel
    (codecs/_fsst_kernel.c::gif_lzw_encode) is the fast path; this
    Python body is the differential-pinned fallback."""
    from ..codecs import _native
    if _native.available():
        return _native.gif_lzw_encode(
            np.ascontiguousarray(indices, np.uint8), min_code)
    clear = 1 << min_code
    end = clear + 1
    width = min_code + 1
    next_code = end + 1
    table: dict = {}
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev = -1
    for s in map(int, indices):
        if prev < 0:
            prev = s
            continue
        key = (prev, s)
        nxt = table.get(key)
        if nxt is not None:
            prev = nxt
            continue
        emit(prev)
        table[key] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear)
            width = min_code + 1
            next_code = end + 1
            table.clear()
        prev = s
    if prev >= 0:
        emit(prev)
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode_gif(data: bytes, min_code: int = 8) -> np.ndarray:
    """Inverse of :func:`_lzw_encode_gif`; also tolerates encoders that
    defer the clear code past a full table (appends stop at 4096).
    The cc kernel is the fast path; a kernel -1 (malformed) falls
    through to this body so error messages stay exact."""
    from ..codecs import _native
    if _native.available():
        got = _native.gif_lzw_decode(
            np.frombuffer(data, np.uint8), min_code)
        if got is not None:
            return got
    clear = 1 << min_code
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    out = bytearray()
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("LZW stream ended without END code")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("LZW: first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]          # the cScSc case
        else:
            raise ValueError(f"LZW: code {code} beyond table")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        out.extend(entry)
        prev = entry
    return np.frombuffer(bytes(out), np.uint8)


def _sub_blocks(data: bytes) -> bytes:
    """Split ``data`` into GIF ≤255-byte length-prefixed sub-blocks,
    terminated."""
    out = bytearray()
    for i in range(0, len(data), 255):
        part = data[i:i + 255]
        out.append(len(part))
        out.extend(part)
    out.append(0)
    return bytes(out)


class GifCodec:
    """REAL animated GIF89a, pure stdlib+numpy, per the public GIF89a
    specification (CompuServe, 1990): logical screen descriptor, a
    256-entry grayscale global color table, NETSCAPE2.0 loop extension,
    per-frame graphic-control extension + image descriptor, and genuine
    variable-width LZW entropy coding (Appendix F) with CLEAR-code
    table resets.  ``encode_frames`` output opens and animates in any
    standard image viewer/browser; ``decode_frames`` walks the full
    block structure (unknown extensions skipped via sub-block framing,
    local color tables honored) and LZW-decodes every frame.  This is
    the video-shaped multi-frame container of the media family — only
    lib-backed codecs (JPEG/WebP/mp4) remain at the integration
    point."""

    @staticmethod
    def encode_frames(frames: list, delay_cs: int = 10) -> bytes:
        if not frames:
            raise ValueError("GIF needs at least one frame")
        f0 = np.asarray(frames[0], np.uint8)
        h, w = f0.shape
        out = bytearray(GIF_HEADER)
        # logical screen descriptor: GCT present, 8 bits/channel, 256
        out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
        gct = np.repeat(np.arange(256, dtype=np.uint8), 3)
        out += gct.tobytes()                  # grayscale identity GCT
        out += (b"\x21\xFF\x0BNETSCAPE2.0"    # loop forever
                + b"\x03\x01\x00\x00\x00")
        for fr in frames:
            px = np.asarray(fr, np.uint8)
            fh, fw = px.shape
            if (fh, fw) != (h, w):
                raise ValueError("all frames must share the logical size")
            out += b"\x21\xF9\x04\x04" + struct.pack("<H", delay_cs) \
                + b"\x00\x00"                 # GCE: disposal=1
            out += b"\x2C" + struct.pack("<HHHH", 0, 0, fw, fh) + b"\x00"
            out.append(8)                     # LZW min code size
            out += _sub_blocks(_lzw_encode_gif(px.reshape(-1)))
        out.append(0x3B)                      # trailer
        return bytes(out)

    @staticmethod
    def decode_frames(blob: bytes) -> list:
        if bytes(blob[:6]) not in (b"GIF89a", b"GIF87a"):
            raise ValueError("not a GIF")
        w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = np.frombuffer(blob, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        frames = []
        n_total = len(blob)
        while pos < n_total:
            b0 = blob[pos]
            pos += 1
            if b0 == 0x3B:                    # trailer
                break
            if b0 == 0x21:                    # extension: skip sub-blocks
                pos += 1                      # label
                while blob[pos]:
                    pos += 1 + blob[pos]
                pos += 1
            elif b0 == 0x2C:                  # image descriptor
                fx, fy, fw, fh, ipacked = struct.unpack_from(
                    "<HHHHB", blob, pos)
                pos += 9
                pal = gct
                if ipacked & 0x80:            # local color table
                    n = 2 << (ipacked & 0x07)
                    pal = np.frombuffer(
                        blob, np.uint8, 3 * n, pos).reshape(n, 3)
                    pos += 3 * n
                if ipacked & 0x40:
                    raise NotImplementedError(
                        "interlaced GIF frames go through the lib-backed "
                        "integration point")
                min_code = blob[pos]
                pos += 1
                lzw = bytearray()
                while blob[pos]:
                    ln = blob[pos]
                    lzw += blob[pos + 1:pos + 1 + ln]
                    pos += 1 + ln
                pos += 1
                idx = _lzw_decode_gif(bytes(lzw), min_code)
                if len(idx) != fw * fh:
                    raise ValueError("GIF frame pixel count mismatch")
                if pal is None:
                    raise ValueError("GIF frame without a color table")
                # grayscale value = red channel of the palette entry
                frames.append(pal[idx, 0].reshape(fh, fw))
            else:
                raise ValueError(f"unknown GIF block 0x{b0:02x}")
        return frames


def synthesize_gif_column(batch: pa.Table, text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """Deterministic REAL animated-GIF column from the documents table:
    w = id%16+4, h = id%12+4, n_frames = id%4+2; pixel p (row-major)
    of frame k = text byte ((p + 11·k) mod n) (0 if the text is empty)
    — the same closed-form rule the SQL oracle replays.  Encoded
    through the genuine GIF89a/LZW path, so the blobs animate in any
    standard viewer."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    blobs = []
    for i, t in zip(ids, texts):
        i = int(i)
        w = i % 16 + 4
        h = i % 12 + 4
        nf = i % 4 + 2
        raw = np.frombuffer(t.encode("utf-8"), np.uint8)
        frames = []
        for k in range(nf):
            if len(raw):
                p = (np.arange(w * h, dtype=np.int64) + 11 * k) % len(raw)
                frames.append(raw[p].reshape(h, w))
            else:
                frames.append(np.zeros((h, w), np.uint8))
        blobs.append(GifCodec.encode_frames(frames))
    return pa.table({
        id_col: batch.column(id_col),
        "video": pa.array(blobs, type=pa.large_binary()),
    })


class GifFrameStage:
    """Actor-pool stage over GENUINELY DECODED video frames: parse the
    GIF89a container, LZW-decode every frame (GifCodec), sample every
    ``every``-th frame and digest its pixels (plain and
    position-weighted sums) — the decode+sample shape of a real video
    pipeline, value-checked because the SQL oracle recomputes the
    digests from the synthesis rule."""

    def __init__(self, binary_col: str = "video",
                 id_col: str = "doc_id", every: int = 2):
        self.binary_col = binary_col
        self.id_col = id_col
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, sums, wsums = [], [], [], []
        for i, v in zip(batch.column(self.id_col).to_pylist(),
                        batch.column(self.binary_col).to_pylist()):
            if v is None:
                continue
            frames = GifCodec.decode_frames(v)
            for k in range(0, len(frames), self.every):
                px = frames[k].reshape(-1).astype(np.int64)
                ids.append(i)
                fidx.append(k)
                sums.append(int(px.sum()))
                wsums.append(int((px * np.arange(1, px.size + 1)).sum()))
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "frame": pa.array(fidx, pa.int64()),
            "f_sum": pa.array(sums, pa.int64()),
            "f_wsum": pa.array(wsums, pa.int64()),
        })


def synthesize_jpeg_column(batch: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id",
                           quality: int = 95,
                           progressive: bool = False) -> pa.Table:
    """Deterministic REAL baseline-JPEG column from the documents
    table: w = id%48+8, h = id%32+8, source pixel p = text byte
    (p mod n) (0 if empty) — the closed-form rule the verify stage and
    the SQL oracle replay.  Encoded through the genuine JFIF path
    (stages/jpeg.py), so the blobs open in any viewer."""
    from .jpeg import JpegCodec

    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    blobs = []
    for i, t in zip(ids, texts):
        i = int(i)
        w = i % 48 + 8
        h = i % 32 + 8
        raw = np.frombuffer(t.encode("utf-8"), np.uint8)
        if len(raw):
            px = raw[np.arange(w * h) % len(raw)].reshape(h, w)
        else:
            px = np.zeros((h, w), np.uint8)
        blobs.append(JpegCodec.encode_progressive(px, quality)
                     if progressive else JpegCodec.encode(px, quality))
    return pa.table({
        id_col: batch.column(id_col),
        "image": pa.array(blobs, type=pa.large_binary()),
    })


class JpegReconStage:
    """Actor-pool stage over GENUINELY DECODED baseline JPEG: parse the
    JFIF marker stream, Huffman-decode + dequantize + IDCT every 8x8
    block (stages/jpeg.py), then verify the lossy reconstruction
    IN-PIPELINE against the closed-form source rule (the
    encode_embeddings pattern: the pipeline itself carries the
    bit/tolerance compare, the oracle replays the closed-form outputs).
    Emits dims, MCU-block count and the bounded-error verdict; the
    verdict is deterministic (same codec, same corpus ⇒ same errors),
    and tests pin the measured error well under the bound."""

    def __init__(self, binary_col: str = "image", id_col: str = "doc_id",
                 text_col: str = "text", tol: int = 12):
        from .jpeg import JpegCodec
        self.codec = JpegCodec
        self.binary_col = binary_col
        self.id_col = id_col
        self.text_col = text_col
        self.tol = tol

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, nblk, ok = [], [], [], [], []
        for i, v, t in zip(batch.column(self.id_col).to_pylist(),
                           batch.column(self.binary_col).to_pylist(),
                           batch.column(self.text_col).to_pylist()):
            ids.append(i)
            if v is None:
                ws.append(None), hs.append(None)
                nblk.append(None), ok.append(None)
                continue
            px = self.codec.decode_pixels(v)
            h, w = px.shape
            raw = np.frombuffer(t.encode("utf-8"), np.uint8)
            if len(raw):
                want = raw[np.arange(w * h) % len(raw)].reshape(h, w)
            else:
                want = np.zeros((h, w), np.uint8)
            err = int(np.abs(px.astype(np.int64)
                             - want.astype(np.int64)).max())
            ws.append(w)
            hs.append(h)
            nblk.append(-(-w // 8) * -(-h // 8))
            ok.append(err <= self.tol)
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "mcu_blocks": pa.array(nblk, pa.int64()),
            "recon_ok": pa.array(ok, pa.bool_()),
        })


def _color_jpeg_source(i: int, text: str) -> "np.ndarray":
    """Closed-form COLOR source rule shared by synthesis and verify
    (and whose derived outputs the SQL oracle replays): w = id%40+8,
    h = id%24+8; luma = text bytes (full-resolution noise), chroma =
    16×16-tile-constant ramps ALIGNED to the 4:2:0 MCU grid, so every
    subsampled chroma block is constant and the reconstruction error
    stays luma-dominated (chroma DC quant only)."""
    from .jpeg import ycbcr_to_rgb

    w = i % 40 + 8
    h = i % 24 + 8
    raw = np.frombuffer(text.encode("utf-8"), np.uint8)
    if len(raw):
        y = raw[np.arange(w * h) % len(raw)].reshape(h, w).astype(
            np.float64)
    else:
        y = np.zeros((h, w), np.float64)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    cb = 96.0 + 8.0 * (xx // 16 % 8)
    cr = 96.0 + 4.0 * (yy // 16 % 8)
    return ycbcr_to_rgb(y, cb, cr)


def _color_png_source(i: int, text: str) -> "np.ndarray":
    """Closed-form truecolor source rule shared by synthesis and
    verify (and replayed exactly by the SQL oracle — PNG is LOSSLESS,
    so the decoded channel sums equal the rule's sums bit-for-bit):
    w = id%32+8, h = id%20+8; R = text bytes cycled, G = (p*7+id)%256,
    B = (p+3*id)%256."""
    w = i % 32 + 8
    h = i % 20 + 8
    n = w * h
    raw = np.frombuffer(text.encode("utf-8"), np.uint8)
    r = (raw[np.arange(n) % len(raw)] if len(raw)
         else np.zeros(n, np.uint8))
    p = np.arange(n, dtype=np.int64)
    g = ((p * 7 + i) % 256).astype(np.uint8)
    b = ((p + 3 * i) % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=-1).reshape(h, w, 3)


class PngColorReconStage:
    """Actor-pool stage over GENUINE truecolor PNG: zlib inflate +
    five-filter reconstruction at 3 bytes/pixel, then an EXACT
    (lossless) compare against the closed-form source rule and
    channel sums the SQL oracle replays closed-form."""

    def __init__(self, binary_col: str = "image", id_col: str = "doc_id",
                 text_col: str = "text"):
        self.binary_col = binary_col
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, rs, gs, bs, ok = [], [], [], [], [], [], []
        for i, v, t in zip(batch.column(self.id_col).to_pylist(),
                           batch.column(self.binary_col).to_pylist(),
                           batch.column(self.text_col).to_pylist()):
            ids.append(i)
            if v is None:
                for lst in (ws, hs, rs, gs, bs, ok):
                    lst.append(None)
                continue
            px = PngCodec.decode_pixels(v)
            h, w = px.shape[:2]
            want = _color_png_source(int(i), t)
            s = px.astype(np.int64).sum(axis=(0, 1))
            ws.append(w)
            hs.append(h)
            rs.append(int(s[0]))
            gs.append(int(s[1]))
            bs.append(int(s[2]))
            ok.append(bool(np.array_equal(px, want)))   # LOSSLESS
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "r_sum": pa.array(rs, pa.int64()),
            "g_sum": pa.array(gs, pa.int64()),
            "b_sum": pa.array(bs, pa.int64()),
            "exact": pa.array(ok, pa.bool_()),
        })


def synthesize_png_color_column(batch: pa.Table, text_col: str = "text",
                                id_col: str = "doc_id") -> pa.Table:
    """Deterministic REAL truecolor-PNG column from the documents
    table via `_color_png_source` (PngCodec color type 2, all five
    filters cycled)."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    blobs = [PngCodec.encode(_color_png_source(int(i), t))
             for i, t in zip(ids, texts)]
    return pa.table({
        id_col: batch.column(id_col),
        "image": pa.array(blobs, type=pa.large_binary()),
    })


def synthesize_jpeg_color_column(batch: pa.Table, text_col: str = "text",
                                 id_col: str = "doc_id",
                                 quality: int = 95) -> pa.Table:
    """Deterministic REAL 4:2:0 color-JPEG column from the documents
    table via the `_color_jpeg_source` rule, encoded through the
    genuine 3-component interleaved JFIF path (stages/jpeg.py), so the
    blobs open in any viewer."""
    from .jpeg import JpegCodec

    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    blobs = [JpegCodec.encode(_color_jpeg_source(int(i), t), quality,
                              subsampling="420")
             for i, t in zip(ids, texts)]
    return pa.table({
        id_col: batch.column(id_col),
        "image": pa.array(blobs, type=pa.large_binary()),
    })


class JpegColorReconStage:
    """Actor-pool stage over GENUINELY DECODED 4:2:0 color JPEG:
    parse the marker stream, Huffman-decode the interleaved MCU scan
    (4 Y + Cb + Cr per MCU), dequantize + IDCT all three components,
    upsample chroma and color-convert (stages/jpeg.py), then verify
    the lossy RGB reconstruction IN-PIPELINE against the closed-form
    `_color_jpeg_source` rule with a fixed error bound — the
    `JpegReconStage` contract extended to color.  Emits dims, MCU
    count (16×16 at 4:2:0) and the bounded-error verdict."""

    def __init__(self, binary_col: str = "image", id_col: str = "doc_id",
                 text_col: str = "text", tol: int = 32):
        from .jpeg import JpegCodec
        self.codec = JpegCodec
        self.binary_col = binary_col
        self.id_col = id_col
        self.text_col = text_col
        self.tol = tol

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, nmcu, ok = [], [], [], [], []
        for i, v, t in zip(batch.column(self.id_col).to_pylist(),
                           batch.column(self.binary_col).to_pylist(),
                           batch.column(self.text_col).to_pylist()):
            ids.append(i)
            if v is None:
                ws.append(None), hs.append(None)
                nmcu.append(None), ok.append(None)
                continue
            px = self.codec.decode_pixels(v)
            h, w = px.shape[:2]
            want = _color_jpeg_source(int(i), t)
            err = int(np.abs(px.astype(np.int64)
                             - want.astype(np.int64)).max())
            ws.append(w)
            hs.append(h)
            nmcu.append(-(-w // 16) * -(-h // 16))
            ok.append(err <= self.tol and px.ndim == 3)
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "mcus": pa.array(nmcu, pa.int64()),
            "recon_ok": pa.array(ok, pa.bool_()),
        })


def frame_sample(batch: pa.Table, binary_col: str = "video",
                 id_col: str = "doc_id", every: int = 4,
                 size: int = 64) -> pa.Table:
    """Frame-sampling plumbing for video-like payloads: emit every
    Nth fixed-size 'frame' slice of the payload as its own row
    (1→n explode, the flat-map shape a real sampler would use).

    Fully vectorized: frame starts/lengths are computed from the
    Arrow offsets buffer and the frame bytes are gathered with one
    numpy fancy-index — no per-row Python in the explode."""
    col = batch.column(binary_col).combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks else pa.array(
            [], type=pa.large_binary())
    arr = col.cast(pa.large_binary())
    n_rows = len(arr)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                            count=n_rows + 1, offset=8 * arr.offset)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) \
        if arr.buffers()[2] is not None else np.zeros(0, np.uint8)
    starts = offsets[:-1] + HEADER.size
    body_len = np.maximum(offsets[1:] - starts, 0)
    n_frames = np.maximum(body_len // size, 1)
    cnt = (n_frames + every - 1) // every      # sampled frames per row
    total = int(cnt.sum())
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), cnt)
    first = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(cnt, out=first[1:])
    frame_idx = (np.arange(total, dtype=np.int64)
                 - first[:-1][row_of]) * every
    f_start = starts[row_of] + frame_idx * size
    f_len = np.minimum(size, np.maximum(
        offsets[1:][row_of] - f_start, 0))
    out_off = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(f_len, out=out_off[1:])
    gather = np.repeat(f_start - out_off[:-1], f_len) \
        + np.arange(out_off[-1], dtype=np.int64)
    frames = pa.Array.from_buffers(
        pa.large_binary(), total,
        [None, pa.py_buffer(out_off.tobytes()),
         pa.py_buffer(data[gather].tobytes())])
    return pa.table({
        id_col: batch.column(id_col).take(pa.array(row_of)),
        "frame": pa.array(frame_idx, type=pa.int64()),
        "frame_bytes": frames,
    })
