"""ctypes bridge to the C++ native acceleration library (libsamtpu).

The native library accelerates the sequential/hot host paths: BGZF block
scan+inflate, BAM record-offset scanning, and SAM text formatting.  All
functionality has pure-numpy fallbacks; this module only reports
availability and wraps the calls.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_lib = None
_tried = False


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (
        os.path.join(here, "native", "libsamtpu.so"),
        os.path.join(os.path.dirname(here), "build", "libsamtpu.so"),
    ):
        if os.path.exists(cand):
            return cand
    return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.samtpu_bam_scan_offsets.restype = ctypes.c_int64
        lib.samtpu_bam_scan_offsets.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.samtpu_bgzf_inflate.restype = ctypes.c_int64
        lib.samtpu_bgzf_inflate.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def bam_record_offsets(data: np.ndarray, start: int) -> np.ndarray:
    """Scan BAM record offsets using the native library."""
    lib = _load()
    n = data.size
    # worst case: one record every 36+4 bytes
    cap = max(16, (n - start) // 38 + 2)
    out = np.empty(cap, np.int64)
    data = np.ascontiguousarray(data)
    got = lib.samtpu_bam_scan_offsets(
        data.ctypes.data, n, start, out.ctypes.data, cap)
    if got < 0:
        raise RuntimeError(f"native BAM scan failed (code {got})")
    return out[:got].copy()


def bgzf_inflate(data: bytes, coffs: np.ndarray, bsizes: np.ndarray,
                 out_size: int, threads: int) -> bytes:
    lib = _load()
    src = np.frombuffer(data, np.uint8)
    out = np.empty(out_size, np.uint8)
    nblk = coffs.size
    coffs = np.ascontiguousarray(coffs, np.int64)
    bsizes = np.ascontiguousarray(bsizes, np.int64)
    got = lib.samtpu_bgzf_inflate(
        src.ctypes.data, src.size,
        coffs.ctypes.data, nblk,
        bsizes.ctypes.data, out_size,
        out.ctypes.data, threads)
    if got < 0:
        raise RuntimeError(f"native BGZF inflate failed (code {got})")
    return out[:got].tobytes()
