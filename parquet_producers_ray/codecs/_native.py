"""Lazy cc-compiled kernels (ctypes).  Falls back gracefully: callers
check ``available()`` and keep the pure-NumPy path as the portable
implementation (and the property-test oracle).

The shared object is built once per node into a version-keyed path
under /tmp with an atomic rename, so concurrent Ray workers race
benignly.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "_fsst_kernel.c")
_LIB = None
_TRIED = False


def _build() -> str | None:
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None
    so_path = os.path.join(tempfile.gettempdir(),
                           f"ppray_fsst_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    tmp = f"{so_path}.{os.getpid()}.tmp"
    try:
        subprocess.run(["cc", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp],
                       check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.fsst_encode.restype = ctypes.c_int64
    lib.fsst_encode.argtypes = [u8p, i64p, ctypes.c_int64, u8p, u8p,
                                ctypes.c_int32, u8p, i64p]
    lib.fsst_decoded_size.restype = ctypes.c_int64
    lib.fsst_decoded_size.argtypes = [u8p, ctypes.c_int64, u8p]
    lib.fsst_decode.restype = ctypes.c_int64
    lib.fsst_decode.argtypes = [u8p, i64p, ctypes.c_int64, u8p, u8p,
                                u8p, i64p]
    lib.prefix_encode.restype = ctypes.c_int64
    lib.prefix_encode.argtypes = [u8p, i64p, ctypes.c_int64, i64p, u8p,
                                  i64p]
    lib.prefix_decode.restype = ctypes.c_int64
    lib.prefix_decode.argtypes = [u8p, i64p, i64p, ctypes.c_int64, u8p,
                                  i64p]
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    lib.sortkey8.restype = None
    lib.sortkey8.argtypes = [u8p, i64p, ctypes.c_int64, u64p]
    lib.pair_intersect.restype = None
    lib.pair_intersect.argtypes = [u64p, i64p, i64p, ctypes.c_int64, i64p]
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.jpeg_decode_scan.restype = ctypes.c_int64
    lib.jpeg_decode_scan.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64,
        u8p, u8p, u8p, u8p,
        i32p, i32p, i64p, u8p, ctypes.c_int64, i32p]
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    lib.jpeg_encode_scan.restype = ctypes.c_int64
    lib.jpeg_encode_scan.argtypes = [
        i32p, i32p, i32p, u8p, ctypes.c_int64,
        u16p, u8p, u16p, u8p, u8p]
    lib.gif_lzw_decode.restype = ctypes.c_int64
    lib.gif_lzw_decode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int32,
                                   u8p, ctypes.c_int64]
    lib.gif_lzw_encode.restype = ctypes.c_int64
    lib.gif_lzw_encode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int32,
                                   u8p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def fsst_encode(data: np.ndarray, offs: np.ndarray, sym_mat: np.ndarray,
                sym_lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lib = _load()
    n_strings = len(offs) - 1
    out = np.empty(2 * len(data), dtype=np.uint8)
    out_offs = np.zeros(n_strings + 1, dtype=np.int64)
    total = lib.fsst_encode(
        np.ascontiguousarray(data), np.ascontiguousarray(offs),
        n_strings, np.ascontiguousarray(sym_mat.reshape(-1)),
        np.ascontiguousarray(sym_lens.astype(np.uint8)),
        len(sym_lens), out, out_offs)
    return out[:total], out_offs


def prefix_encode(data: np.ndarray,
                  offs: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                             np.ndarray]:
    """Front-coding split: returns (prefix_lens, suffix_bytes, suf_offs)."""
    lib = _load()
    n = len(offs) - 1
    p = np.zeros(n, dtype=np.int64)
    suffix = np.empty(int(offs[-1] - offs[0]), dtype=np.uint8)
    suf_offs = np.zeros(n + 1, dtype=np.int64)
    total = lib.prefix_encode(np.ascontiguousarray(data),
                              np.ascontiguousarray(offs), n, p, suffix,
                              suf_offs)
    return p, suffix[:total], suf_offs


def prefix_decode(suffix: np.ndarray, suf_offs: np.ndarray,
                  p: np.ndarray, total: int) -> tuple[np.ndarray,
                                                      np.ndarray]:
    """Front-coding rebuild: returns (out_bytes, out_offs)."""
    lib = _load()
    n = len(suf_offs) - 1
    out = np.empty(int(total), dtype=np.uint8)
    out_offs = np.zeros(n + 1, dtype=np.int64)
    lib.prefix_decode(np.ascontiguousarray(suffix),
                      np.ascontiguousarray(suf_offs),
                      np.ascontiguousarray(p), n, out, out_offs)
    return out, out_offs


def fsst_decode(data: np.ndarray, offs: np.ndarray, sym_mat: np.ndarray,
                sym_lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lib = _load()
    n_strings = len(offs) - 1
    data = np.ascontiguousarray(data)
    lens8 = np.ascontiguousarray(sym_lens.astype(np.uint8))
    total = lib.fsst_decoded_size(data, len(data), lens8)
    out = np.empty(total + 8, dtype=np.uint8)  # +8: decode over-copies
    out_offs = np.zeros(n_strings + 1, dtype=np.int64)
    lib.fsst_decode(data, np.ascontiguousarray(offs), n_strings,
                    np.ascontiguousarray(sym_mat.reshape(-1)), lens8,
                    out, out_offs)
    return out[:total], out_offs


def sortkey8(data: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Big-endian uint64 of each string's first <=8 bytes — an
    order-preserving coarsening used by the storage sort's range
    router (stages/exchange.py)."""
    lib = _load()
    n = len(offs) - 1
    out = np.empty(n, dtype=np.uint64)
    lib.sortkey8(np.ascontiguousarray(data), np.ascontiguousarray(offs),
                 n, out)
    return out


def pair_intersect(data: np.ndarray, offs_e: np.ndarray,
                   rows0: np.ndarray) -> np.ndarray:
    """Per-pair |A∩B| of adjacent sorted-unique uint64 runs (rows
    rows0[p] and rows0[p]+1 of the ragged (data, offs_e) array) — the
    minhash verify hot kernel.  Callers must check ``available()``."""
    lib = _load()
    npair = len(rows0)
    out = np.empty(npair, dtype=np.int64)
    lib.pair_intersect(np.ascontiguousarray(data),
                       np.ascontiguousarray(offs_e),
                       np.ascontiguousarray(rows0), npair, out)
    return out


def jpeg_decode_scan(data: np.ndarray, pos: int,
                     dc_sym: np.ndarray, dc_len: np.ndarray,
                     ac_sym: np.ndarray, ac_len: np.ndarray,
                     tab_of_block: np.ndarray, pred_of_block: np.ndarray,
                     row_of_block: np.ndarray, restart_before: np.ndarray,
                     n_rows: int) -> np.ndarray | None:
    """Baseline-JPEG entropy scan in C (stages/jpeg.py fast path):
    returns the (n_rows, 64) zigzag coefficient matrix, or None on an
    invalid code (caller falls back to the Python decoder).  Callers
    must check ``available()``."""
    lib = _load()
    zz = np.zeros((int(n_rows), 64), np.int32)
    rc = lib.jpeg_decode_scan(
        np.ascontiguousarray(data), len(data), int(pos),
        np.ascontiguousarray(dc_sym), np.ascontiguousarray(dc_len),
        np.ascontiguousarray(ac_sym), np.ascontiguousarray(ac_len),
        np.ascontiguousarray(tab_of_block),
        np.ascontiguousarray(pred_of_block),
        np.ascontiguousarray(row_of_block),
        np.ascontiguousarray(restart_before),
        len(tab_of_block), zz)
    return zz if rc == 0 else None


def jpeg_encode_scan(zz: np.ndarray, tab_of_block: np.ndarray,
                     pred_of_block: np.ndarray,
                     restart_before: np.ndarray,
                     dc_code: np.ndarray, dc_len: np.ndarray,
                     ac_code: np.ndarray, ac_len: np.ndarray) -> bytes:
    """Baseline-JPEG entropy encode in C (stages/jpeg.py fast path):
    blocks already in scan order; returns the stuffed entropy bytes
    incl. restart markers.  Callers must check ``available()``."""
    lib = _load()
    nblk = len(tab_of_block)
    out = np.empty(nblk * 512 + 4096, np.uint8)
    n = lib.jpeg_encode_scan(
        np.ascontiguousarray(zz.reshape(-1)),
        np.ascontiguousarray(tab_of_block),
        np.ascontiguousarray(pred_of_block),
        np.ascontiguousarray(restart_before), nblk,
        np.ascontiguousarray(dc_code), np.ascontiguousarray(dc_len),
        np.ascontiguousarray(ac_code), np.ascontiguousarray(ac_len),
        out)
    return out[:n].tobytes()


def gif_lzw_decode(data: np.ndarray, min_code: int) -> np.ndarray | None:
    """GIF LZW decode in C; grows the output buffer on -2 (capacity),
    returns None on -1 (malformed — caller falls back to Python for
    the error message).  Callers must check ``available()``."""
    lib = _load()
    data = np.ascontiguousarray(data)
    cap = max(int(len(data)) * 4, 1 << 16)
    while True:
        out = np.empty(cap, np.uint8)
        rc = lib.gif_lzw_decode(data, len(data), int(min_code), out, cap)
        if rc == -2:
            cap *= 4
            continue
        return out[:rc].copy() if rc >= 0 else None


def gif_lzw_encode(px: np.ndarray, min_code: int) -> bytes:
    """GIF LZW encode in C.  Callers must check ``available()``."""
    lib = _load()
    px = np.ascontiguousarray(px, np.uint8)
    # worst case: one code (<=12 bits) per pixel + clears every 3837
    # pixels + header/end + slack
    cap = (len(px) * 12) // 8 + (len(px) // 3800 + 4) * 2 + 64
    out = np.empty(cap, np.uint8)
    n = lib.gif_lzw_encode(px, len(px), int(min_code), out)
    return out[:n].tobytes()
