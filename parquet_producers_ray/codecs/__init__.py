"""Per-column lightweight compression codecs (pure Arrow/NumPy, no Ray).

Codecs: ``plain`` (IPC passthrough), ``dict``, ``rle``, ``bitpack``,
``for`` (frame-of-reference), ``delta`` (zigzag deltas of
sorted/near-sorted ints), ``fsst``; plus the sampling-based
auto-selector in :mod:`.auto`.
"""

from .auto import CODECS, candidates, decode, encode_auto, select_codec
from .base import Encoded

__all__ = ["CODECS", "Encoded", "candidates", "decode", "encode_auto",
           "select_codec"]
