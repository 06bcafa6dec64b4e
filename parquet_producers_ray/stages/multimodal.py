"""Multimodal (image/audio/video) columns as opaque ``large_binary``
with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode step itself is STUBBED (no image/audio libraries in this
environment): ``FakeImageCodec`` implements a deterministic 16-byte
header format so the Ray-side plumbing — schema, batch sizing, actor
lifecycle, output layout — is real and fully tested, while
``PillowImageDecoder.decode`` raises ``NotImplementedError`` with the
integration point documented.

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
    """Integration point for a real decoder.  In production this would
    hold a PIL/libjpeg (or ffmpeg for video) handle per actor; the
    library is not present in this container."""

    def decode(self, blob: bytes) -> dict:
        raise NotImplementedError(
            "real image decode requires Pillow/libjpeg; wire it here "
            "and construct ImageFeatureStage(decoder=PillowImageDecoder())")


class ImageFeatureStage:
    """Actor-pool stage: decode a binary image column into feature
    columns.  The codec is constructed ONCE per actor (``__init__``),
    batches stream through ``__call__``."""

    def __init__(self, binary_col: str = "image",
                 id_col: str = "doc_id", decoder=None):
        self.binary_col = binary_col
        self.id_col = id_col
        self.decoder = decoder or FakeImageCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.binary_col)
        feats = {name: [] for name in FEATURE_SCHEMA.names}
        for v in blobs.to_pylist():
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


def frame_sample(batch: pa.Table, binary_col: str = "video",
                 id_col: str = "doc_id", every: int = 4) -> pa.Table:
    """Frame-sampling plumbing for video-like payloads: emit every
    Nth fixed-size 'frame' slice of the payload as its own row
    (1→n explode, the flat-map shape a real sampler would use)."""
    ids, frame_idx, frames = [], [], []
    for i, blob in zip(batch.column(id_col).to_pylist(),
                       batch.column(binary_col).to_pylist()):
        body = blob[HEADER.size:]
        size = 64
        n = max(1, len(body) // size)
        for f in range(0, n, every):
            ids.append(i)
            frame_idx.append(f)
            frames.append(body[f * size:(f + 1) * size])
    return pa.table({
        id_col: pa.array(ids, type=pa.int64()),
        "frame": pa.array(frame_idx, type=pa.int64()),
        "frame_bytes": pa.array(frames, type=pa.large_binary()),
    })
