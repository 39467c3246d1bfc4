"""ctypes bridge to the C++ native acceleration library (libsamtpu).

The native library accelerates the sequential/hot host paths around the
JAX/XLA device compute: BGZF block scan + parallel inflate/deflate
(htslib bgzf.c + hts_tpool analog, cf. /root/reference/bam_sort.c:3479)
and BAM record-offset scanning (sam_read1 framing analog).  All
functionality has pure-numpy fallbacks; this module reports availability
and wraps the calls.  If the shared library is absent but a compiler is
present, it is built once on first use (source lives in
samtools_tpu/native/samtpu.cc).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_lib = None
_tried = False


def _native_dir() -> str:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(here, "native")


def _find_lib():
    cand = os.path.join(_native_dir(), "libsamtpu.so")
    if os.path.exists(cand):
        src = os.path.join(_native_dir(), "samtpu.cc")
        try:
            if os.path.getmtime(src) <= os.path.getmtime(cand):
                return cand
        except OSError:
            return cand
    return None


def _build_lib():
    """One-shot silent build attempt (make in samtools_tpu/native).

    Serialized with an flock lock file so concurrent processes (pytest
    spawning CLI subprocesses) never interleave builds; the Makefile
    itself compiles to a temp name and atomically renames into place.
    """
    if os.environ.get("SAMTPU_NO_NATIVE"):
        return None
    lock_path = os.path.join(_native_dir(), ".build.lock")
    try:
        import fcntl
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            # another process may have finished the build while we waited
            cand = _find_lib()
            if cand:
                return cand
            r = subprocess.run(
                ["make", "-s"], cwd=_native_dir(),
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                timeout=120)
            if r.returncode == 0:
                cand = os.path.join(_native_dir(), "libsamtpu.so")
                if os.path.exists(cand):
                    return cand
    except Exception:
        pass
    return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SAMTPU_NO_NATIVE"):
        return None
    path = _find_lib() or _build_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.samtpu_bam_scan_offsets.restype = ctypes.c_int64
        lib.samtpu_bam_scan_offsets.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.samtpu_bgzf_scan.restype = ctypes.c_int64
        lib.samtpu_bgzf_scan.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.samtpu_bgzf_inflate.restype = ctypes.c_int64
        lib.samtpu_bgzf_inflate.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.samtpu_bgzf_deflate.restype = ctypes.c_int64
        lib.samtpu_bgzf_deflate.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.samtpu_crc32.restype = ctypes.c_uint32
        lib.samtpu_crc32.argtypes = [
            ctypes.c_uint32, ctypes.c_void_p, ctypes.c_int64,
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
    if got == -1:
        raise ValueError("corrupt BAM record size")
    if got == -2:
        raise ValueError("truncated BAM record at end of stream")
    if got < 0:
        raise RuntimeError(f"native BAM scan failed (code {got})")
    return out[:got].copy()


def bgzf_scan(data) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Scan BGZF block boundaries: (coffsets, bsizes, isizes)."""
    lib = _load()
    src = np.frombuffer(data, np.uint8)
    cap = max(16, src.size // 18 + 2)
    coffs = np.empty(cap, np.int64)
    bsizes = np.empty(cap, np.int64)
    isizes = np.empty(cap, np.int64)
    got = lib.samtpu_bgzf_scan(
        src.ctypes.data, src.size,
        coffs.ctypes.data, bsizes.ctypes.data, isizes.ctypes.data, cap)
    if got < 0:
        from .bgzf import BgzfError
        # the scan stops at the first bad block: the offending offset is
        # the end of the last good block (0 if none parsed)
        raise BgzfError("malformed BGZF block (native scan, code %d)" % got)
    return coffs[:got].copy(), bsizes[:got].copy(), isizes[:got].copy()


def bgzf_inflate(data, coffs: np.ndarray, bsizes: np.ndarray,
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
        from .bgzf import BgzfError
        reasons = {-1: "malformed block", -2: "inflate failure",
                   -3: "uncompressed size mismatch"}
        raise BgzfError("native BGZF inflate failed: %s (code %d, %d blocks)"
                        % (reasons.get(int(got), "error"), got, nblk))
    return out[:got].tobytes()


def bgzf_deflate(data, level: int, block_size: int, threads: int) -> bytes:
    """Compress a whole buffer into BGZF members (no EOF block)."""
    lib = _load()
    src = np.frombuffer(data, np.uint8)
    if block_size <= 0 or block_size > 0xFF00:
        block_size = 0xFF00
    nblk = max(1, (src.size + block_size - 1) // block_size)
    stride = block_size + 64
    out = np.empty(nblk * stride, np.uint8)
    got = lib.samtpu_bgzf_deflate(
        src.ctypes.data, src.size, level, block_size,
        out.ctypes.data, out.size, threads)
    if got < 0:
        from .bgzf import BgzfError
        raise BgzfError(f"native BGZF deflate failed (code {got})")
    return out[:got].tobytes()


def crc32(data, seed: int = 0) -> int:
    lib = _load()
    src = np.frombuffer(data, np.uint8)
    return int(lib.samtpu_crc32(seed & 0xFFFFFFFF, src.ctypes.data, src.size))
