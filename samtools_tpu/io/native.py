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
        lib.samtpu_bam_scan_partial.restype = ctypes.c_int64
        lib.samtpu_bam_scan_partial.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
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
        lib.samtpu_bam_decode_sizes.restype = ctypes.c_int64
        lib.samtpu_bam_decode_sizes.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64] + [ctypes.c_void_p] * 4
        lib.samtpu_bam_decode_fill.restype = ctypes.c_int64
        lib.samtpu_bam_decode_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64] + [ctypes.c_void_p] * 16 + [ctypes.c_int] * 2
        lib.samtpu_bench_depth.restype = ctypes.c_int64
        lib.samtpu_bench_depth.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.samtpu_baq_batch.restype = ctypes.c_int64
        lib.samtpu_baq_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.samtpu_bench_baq_census.restype = ctypes.c_int64
        lib.samtpu_bench_baq_census.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ]
        try:
            lib.samtpu_mpileup_text.restype = ctypes.c_int64
            lib.samtpu_mpileup_text.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.samtpu_buf_free.restype = None
            lib.samtpu_buf_free.argtypes = [ctypes.c_void_p]
        except AttributeError:  # stale .so without the text writer
            pass
        try:
            lib.samtpu_ragged_gather.restype = ctypes.c_int64
            lib.samtpu_ragged_gather.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int,
            ]
        except AttributeError:
            pass
        try:
            lib.samtpu_nm_init_batch.restype = ctypes.c_int64
            lib.samtpu_nm_init_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_double,
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ]
        except AttributeError:
            pass
        try:
            lib.samtpu_stats_crc32_batch.restype = ctypes.c_int64
            lib.samtpu_stats_crc32_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p,
            ]
            lib.samtpu_aux_find_batch.restype = ctypes.c_int64
            lib.samtpu_aux_find_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_uint8, ctypes.c_uint8,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.samtpu_sam_format.restype = ctypes.c_int64
            lib.samtpu_sam_format.argtypes = (
                [ctypes.c_int64] + [ctypes.c_void_p] * 8
                + [ctypes.c_void_p] * 9 + [ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int64)])
            lib.samtpu_stats_orig_hists.restype = ctypes.c_int64
            lib.samtpu_stats_orig_hists.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ]
            lib.samtpu_stats_cov_gcd.restype = ctypes.c_int64
            lib.samtpu_stats_cov_gcd.argtypes = [
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64,
            ]
        except AttributeError:
            pass
        try:
            lib.samtpu_classify_reads.restype = ctypes.c_int64
            lib.samtpu_classify_reads.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int,
            ]
            lib.samtpu_census_checksum.restype = None
            lib.samtpu_census_checksum.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p,
            ]
        except AttributeError:
            pass
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def has_classify() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "samtpu_classify_reads")


def classify_reads(pos: np.ndarray, cigar: np.ndarray,
                   cigar_off: np.ndarray, seq_off: np.ndarray,
                   qual: np.ndarray, sel: np.ndarray, l_query: int,
                   ref_len: int, bw: int, maxops: int, threads: int = 2
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                              np.ndarray]:
    """Native device-eligibility walk (ops/mpileup_device.classify_reads
    semantics).  Returns (elig bool[n], lead i64[n], lref i64[n],
    cig8 u32[n, maxops])."""
    lib = _load()
    n = int(sel.size)
    pos = np.ascontiguousarray(pos, np.int64)
    cigar = np.ascontiguousarray(cigar, np.uint32)
    cigar_off = np.ascontiguousarray(cigar_off, np.int64)
    seq_off = np.ascontiguousarray(seq_off, np.int64)
    qual = np.ascontiguousarray(qual, np.uint8)
    sel = np.ascontiguousarray(sel, np.int64)
    elig = np.empty(n, np.uint8)
    lead = np.empty(n, np.int64)
    lref = np.empty(n, np.int64)
    cig8 = np.empty((n, maxops), np.uint32)
    lib.samtpu_classify_reads(
        pos.ctypes.data, cigar.ctypes.data, cigar_off.ctypes.data,
        seq_off.ctypes.data, qual.ctypes.data, int(qual.size),
        sel.ctypes.data, n, l_query, ref_len, bw, maxops,
        elig.ctypes.data, lead.ctypes.data, lref.ctypes.data,
        cig8.ctypes.data, max(1, threads))
    return elig.astype(bool), lead, lref, cig8


def census_checksum(census: np.ndarray, qsum: np.ndarray
                    ) -> tuple[int, int]:
    """Native two-lane weighted checksum over (census[wlen,5], qsum)."""
    lib = _load()
    census = np.ascontiguousarray(census, np.int64)
    qsum = np.ascontiguousarray(qsum, np.int64)
    out2 = np.empty(2, np.uint32)
    lib.samtpu_census_checksum(census.ctypes.data, qsum.ctypes.data,
                               int(qsum.size), out2.ctypes.data)
    return int(out2[0]), int(out2[1])


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


def bam_scan_partial(data: np.ndarray, start: int):
    """(offsets, consumed): record offsets of every COMPLETE record at
    data[start:]; a truncated tail record is left for the next chunk."""
    lib = _load()
    data = np.ascontiguousarray(data)
    n = data.size
    cap = max(16, (n - start) // 38 + 2)
    out = np.empty(cap, np.int64)
    consumed = ctypes.c_int64(start)
    got = lib.samtpu_bam_scan_partial(data.ctypes.data, n, start,
                                      out.ctypes.data, cap,
                                      ctypes.byref(consumed))
    if got < 0:
        raise ValueError(f"corrupt BAM record (partial scan, code {got})")
    return out[:got].copy(), int(consumed.value)


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
                 out_size: int, threads: int,
                 out: np.ndarray | None = None) -> bytes:
    """Inflate BGZF blocks.  ``out``: optional reusable output buffer —
    freshly mmapped numpy buffers pay one page fault per 4 KiB on first
    touch (5x wall on multi-hundred-MB windows, worse with threads
    contending on the mm lock), so hot loops pass a persistent buffer.
    The returned array is a view of ``out`` in that case: consume or
    copy before the next call."""
    lib = _load()
    src = np.frombuffer(data, np.uint8)
    if out is None or out.size < out_size:
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
    return out[:got]


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


FIELD_QNAME, FIELD_CIGAR, FIELD_SEQ, FIELD_QUAL, FIELD_AUX = 1, 2, 4, 8, 16
FIELD_ALL = 31


def bam_decode_columns(data: np.ndarray, offs: np.ndarray, threads: int,
                       fields: int = FIELD_ALL):
    """Decode BAM records into columnar arrays (C++ two-pass: sizes then
    record-parallel fill).  Returns a dict of ReadBatch field arrays.

    ``fields`` selects ragged columns (FIELD_* bitmask) — the htslib CRAM
    required-fields analog; skipped columns come back empty with zero
    offsets.  Raises ValueError on corrupt records (negative aux length /
    overrun), matching the numpy path's BamError semantics at the caller.
    """
    lib = _load()
    data = np.ascontiguousarray(data)
    offs = np.ascontiguousarray(offs, np.int64)
    n = int(offs.size)
    qname_off = np.empty(n + 1, np.int64)
    cigar_off = np.empty(n + 1, np.int64)
    seq_off = np.empty(n + 1, np.int64)
    aux_off = np.empty(n + 1, np.int64)
    rc = lib.samtpu_bam_decode_sizes(
        data.ctypes.data, data.size, offs.ctypes.data, n,
        qname_off.ctypes.data, cigar_off.ctypes.data,
        seq_off.ctypes.data, aux_off.ctypes.data)
    if rc < 0:
        raise ValueError("corrupt BAM record (native decode sizes)")
    cols = dict(
        tid=np.empty(n, np.int32), pos=np.empty(n, np.int64),
        mapq=np.empty(n, np.uint8), flag=np.empty(n, np.uint16),
        mtid=np.empty(n, np.int32), mpos=np.empty(n, np.int64),
        tlen=np.empty(n, np.int64),
        qname=np.empty(qname_off[-1] if fields & FIELD_QNAME else 0,
                       np.uint8),
        cigar=np.empty(cigar_off[-1] if fields & FIELD_CIGAR else 0,
                       np.uint32),
        seq=np.empty(seq_off[-1] if fields & FIELD_SEQ else 0, np.uint8),
        qual=np.empty(seq_off[-1] if fields & FIELD_QUAL else 0, np.uint8),
        aux=np.empty(aux_off[-1] if fields & FIELD_AUX else 0, np.uint8))
    rc = lib.samtpu_bam_decode_fill(
        data.ctypes.data, data.size, offs.ctypes.data, n,
        qname_off.ctypes.data, cigar_off.ctypes.data,
        seq_off.ctypes.data, aux_off.ctypes.data,
        cols["tid"].ctypes.data, cols["pos"].ctypes.data,
        cols["mapq"].ctypes.data, cols["flag"].ctypes.data,
        cols["mtid"].ctypes.data, cols["mpos"].ctypes.data,
        cols["tlen"].ctypes.data, cols["qname"].ctypes.data,
        cols["cigar"].ctypes.data, cols["seq"].ctypes.data,
        cols["qual"].ctypes.data, cols["aux"].ctypes.data,
        fields, max(1, threads))
    if rc < 0:
        raise ValueError("corrupt BAM record (native decode fill)")
    zero = np.zeros(n + 1, np.int64)
    cols["qname_off"] = qname_off if fields & FIELD_QNAME else zero
    cols["cigar_off"] = cigar_off if fields & FIELD_CIGAR else zero
    # seq and qual share offsets; keep them if either column was decoded
    cols["seq_off"] = (seq_off if fields & (FIELD_SEQ | FIELD_QUAL)
                       else zero)
    cols["aux_off"] = aux_off if fields & FIELD_AUX else zero
    return cols


def baq_batch(pos: np.ndarray, cigar: np.ndarray, cigar_off: np.ndarray,
              seq: np.ndarray, qual: np.ndarray, seq_off: np.ndarray,
              ref_int: np.ndarray, flag: int = 3, threads: int = 1
              ) -> tuple[np.ndarray, np.ndarray]:
    """Batched BAQ recompute (sam_prob_realn, no stored-tag handling).

    Returns (new_qual flat array, skipped bool per read).  Skipped reads
    keep their original quals in the output.  Bit-identical to
    ops.baq.sam_prob_realn_single's recompute path (f64 banded HMM).
    """
    lib = _load()
    n = int(pos.size)
    pos = np.ascontiguousarray(pos, np.int64)
    cigar = np.ascontiguousarray(cigar, np.uint32)
    cigar_off = np.ascontiguousarray(cigar_off, np.int64)
    seq = np.ascontiguousarray(seq, np.uint8)
    qual = np.ascontiguousarray(qual, np.uint8)
    seq_off = np.ascontiguousarray(seq_off, np.int64)
    ref_int = np.ascontiguousarray(ref_int, np.uint8)
    out = qual.copy()
    skipped = np.empty(n, np.uint8)
    rc = lib.samtpu_baq_batch(
        pos.ctypes.data, cigar.ctypes.data, cigar_off.ctypes.data,
        seq.ctypes.data, qual.ctypes.data, seq_off.ctypes.data, n,
        ref_int.ctypes.data, ref_int.size, flag, out.ctypes.data,
        skipped.ctypes.data, max(1, threads))
    if rc < 0:
        raise ValueError(f"native BAQ failed (code {rc})")
    return out, skipped.astype(bool)


def bench_baq_census(body: np.ndarray, tid: int, ref_int: np.ndarray,
                     excl_flags: int = 0x704, min_mapq: int = 0,
                     min_baseq: int = 13, baq_flag: int = 3
                     ) -> tuple[np.ndarray, np.ndarray, int]:
    """Single-core reference mpileup-with-BAQ pipeline (bam_plcmd.c:451
    sam_prob_realn + :607 column census) — the measured CPU baseline.
    Returns (census int32[ref_len,5], qsum int64[ref_len], nrec)."""
    lib = _load()
    body = np.ascontiguousarray(body)
    ref_int = np.ascontiguousarray(ref_int, np.uint8)
    ref_len = int(ref_int.size)
    census = np.zeros(ref_len * 5, np.int32)
    qsum = np.zeros(ref_len, np.int64)
    got = lib.samtpu_bench_baq_census(
        body.ctypes.data, body.size, tid, ref_int.ctypes.data, ref_len,
        excl_flags, min_mapq, min_baseq, baq_flag,
        census.ctypes.data, qsum.ctypes.data)
    if got < 0:
        raise ValueError("corrupt BAM record (bench baq census)")
    return census.reshape(ref_len, 5), qsum, int(got)


def bench_depth(body: np.ndarray, tid: int, ref_len: int,
                excl_flags: int = 0x704, min_mapq: int = 0,
                min_qual: int = 0) -> tuple[np.ndarray, int]:
    """Reference-style single-core depth loop (bam2depth.c:209 add_depth
    semantics) — the measured CPU baseline for bench.py."""
    lib = _load()
    body = np.ascontiguousarray(body)
    depth = np.zeros(ref_len, np.int32)
    got = lib.samtpu_bench_depth(body.ctypes.data, body.size, tid,
                                 depth.ctypes.data, ref_len, excl_flags,
                                 min_mapq, min_qual)
    if got < 0:
        raise ValueError("corrupt BAM record (bench depth)")
    return depth, int(got)


def has_mpileup_text() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "samtpu_mpileup_text") \
        and lib.samtpu_mpileup_text.argtypes is not None


def mpileup_text(sub, ref: bytes | None, name: str, emit_beg: int,
                 emit_end: int, all_mode: bool, bedmask, min_baseq: int,
                 rev_del: int, no_ends: int, no_ins: int,
                 no_del: int) -> bytes:
    """Native single-file pileup text for one window (columnar batch in,
    formatted rows out).  Counterpart of the numpy renderer in
    tools/mpileup_cmd.py; byte-identical by construction (shared
    grammar, cross-checked by the reg suites)."""
    lib = _load()
    pos = np.ascontiguousarray(sub.pos, np.int64)
    flag = np.ascontiguousarray(sub.flag, np.uint16)
    mapq = np.ascontiguousarray(sub.mapq, np.uint8)
    cigar = np.ascontiguousarray(sub.cigar, np.uint32)
    cigar_off = np.ascontiguousarray(sub.cigar_off, np.int64)
    seq = np.ascontiguousarray(sub.seq, np.uint8)
    qual = np.ascontiguousarray(sub.qual, np.uint8)
    seq_off = np.ascontiguousarray(sub.seq_off, np.int64)
    refarr = (np.frombuffer(ref, np.uint8) if ref is not None
              else None)
    nm = name.encode()
    bm = (np.ascontiguousarray(bedmask, np.uint8)
          if bedmask is not None else None)
    outp = ctypes.c_void_p()
    outn = ctypes.c_int64()
    got = lib.samtpu_mpileup_text(
        pos.ctypes.data, sub.n, flag.ctypes.data, mapq.ctypes.data,
        cigar.ctypes.data, cigar_off.ctypes.data, seq.ctypes.data,
        qual.ctypes.data, seq_off.ctypes.data,
        refarr.ctypes.data if refarr is not None else None,
        len(ref) if ref is not None else 0,
        nm, len(nm), emit_beg, emit_end, 1 if all_mode else 0,
        bm.ctypes.data if bm is not None else None,
        min_baseq, rev_del, no_ends, no_ins, no_del,
        ctypes.byref(outp), ctypes.byref(outn))
    if got < 0:
        raise ValueError("native mpileup text failed")
    try:
        if outn.value == 0:
            return b""
        return ctypes.string_at(outp.value, outn.value)
    finally:
        if outp.value:
            lib.samtpu_buf_free(outp)


def has_ragged_gather() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "samtpu_ragged_gather") \
        and lib.samtpu_ragged_gather.argtypes is not None


def ragged_gather(flat: np.ndarray, off: np.ndarray, rows: np.ndarray,
                  out_off: np.ndarray, total: int,
                  threads: int = 0) -> np.ndarray:
    """out[k] = flat[off[rows[k]] : off[rows[k]+1]], concatenated."""
    lib = _load()
    flat = np.ascontiguousarray(flat)
    off = np.ascontiguousarray(off, np.int64)
    rows = np.ascontiguousarray(rows, np.int64)
    out_off = np.ascontiguousarray(out_off, np.int64)
    out = np.empty(total, flat.dtype)
    lib.samtpu_ragged_gather(flat.ctypes.data, off.ctypes.data,
                             rows.ctypes.data, rows.size,
                             out_off.ctypes.data, out.ctypes.data,
                             flat.dtype.itemsize, threads)
    return out


def has_nm_init() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "samtpu_nm_init_batch") \
        and lib.samtpu_nm_init_batch.argtypes is not None


def nm_init_batch(qual: np.ndarray, seq: np.ndarray, seq_off: np.ndarray,
                  cigar: np.ndarray, cigar_off: np.ndarray,
                  md: np.ndarray, md_off: np.ndarray, use_mqual: int,
                  adj_qual: int, bayes116: int, homopoly_fix: float,
                  nm_halo: int, sc_cost: int):
    """Batched consensus nm_init (bam_consensus.c:1012).  Mutates qual
    in place when homopoly_fix is set; returns int32 local_nm flat."""
    lib = _load()
    n = seq_off.size - 1
    qual = np.ascontiguousarray(qual, np.uint8)
    seq = np.ascontiguousarray(seq, np.uint8)
    seq_off = np.ascontiguousarray(seq_off, np.int64)
    cigar = np.ascontiguousarray(cigar, np.uint32)
    cigar_off = np.ascontiguousarray(cigar_off, np.int64)
    md = np.ascontiguousarray(md, np.uint8)
    md_off = np.ascontiguousarray(md_off, np.int64)
    out = np.zeros(int(seq_off[-1]), np.int32)
    lib.samtpu_nm_init_batch(
        qual.ctypes.data, seq.ctypes.data, seq_off.ctypes.data,
        cigar.ctypes.data, cigar_off.ctypes.data, md.ctypes.data,
        md_off.ctypes.data, n, use_mqual, adj_qual, bayes116,
        homopoly_fix, nm_halo, sc_cost, out.ctypes.data)
    return out, qual


def has_stats_native() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "samtpu_stats_cov_gcd") \
        and lib.samtpu_stats_cov_gcd.argtypes is not None


def stats_crc32_batch(qname: np.ndarray, qname_off: np.ndarray,
                      seq: np.ndarray, qual: np.ndarray,
                      seq_off: np.ndarray, idx: np.ndarray):
    """(names, reads, quals) CRC32 sums over the selected records
    (update_checksum, stats.c:783)."""
    lib = _load()
    qname = np.ascontiguousarray(qname, np.uint8)
    qname_off = np.ascontiguousarray(qname_off, np.int64)
    seq = np.ascontiguousarray(seq, np.uint8)
    qual = np.ascontiguousarray(qual, np.uint8)
    seq_off = np.ascontiguousarray(seq_off, np.int64)
    idx = np.ascontiguousarray(idx, np.int64)
    out = np.zeros(3, np.uint32)
    lib.samtpu_stats_crc32_batch(
        qname.ctypes.data, qname_off.ctypes.data, seq.ctypes.data,
        qual.ctypes.data, seq_off.ctypes.data, idx.ctypes.data, idx.size,
        out.ctypes.data)
    return int(out[0]), int(out[1]), int(out[2])


def aux_find_batch(aux: np.ndarray, aux_off: np.ndarray, idx: np.ndarray,
                   tag: str):
    """Per selected record: (value offset into aux, type char byte) of the
    tag, offset -1 when absent."""
    lib = _load()
    aux = np.ascontiguousarray(aux, np.uint8)
    aux_off = np.ascontiguousarray(aux_off, np.int64)
    idx = np.ascontiguousarray(idx, np.int64)
    out_off = np.empty(idx.size, np.int64)
    out_type = np.empty(idx.size, np.uint8)
    lib.samtpu_aux_find_batch(
        aux.ctypes.data, aux_off.ctypes.data, idx.ctypes.data, idx.size,
        ord(tag[0]), ord(tag[1]), out_off.ctypes.data,
        out_type.ctypes.data)
    return out_off, out_type


def stats_cov_gcd(n: int, state: np.ndarray, tid: np.ndarray,
                  pos: np.ndarray, readlen: np.ndarray,
                  active: np.ndarray, gc_term: np.ndarray,
                  span_off: np.ndarray, span_beg: np.ndarray,
                  span_end: np.ndarray, fai_mode: int, gcd_bin_size: int,
                  rbuf: np.ndarray, cov: np.ndarray, cov_min: int,
                  cov_max: int, cov_step: int, gcd_gc: np.ndarray,
                  gcd_depth: np.ndarray) -> int:
    """Drive the native sorted-block residue; see samtpu.cc
    samtpu_stats_cov_gcd for the state/return contract.  All arrays are
    mutated in place and must be contiguous + correctly typed."""
    lib = _load()
    return int(lib.samtpu_stats_cov_gcd(
        n, state.ctypes.data, tid.ctypes.data, pos.ctypes.data,
        readlen.ctypes.data, active.ctypes.data, gc_term.ctypes.data,
        span_off.ctypes.data, span_beg.ctypes.data, span_end.ctypes.data,
        fai_mode, gcd_bin_size, rbuf.ctypes.data, rbuf.size,
        cov.ctypes.data, cov.size, cov_min, cov_max, cov_step,
        gcd_gc.ctypes.data, gcd_depth.ctypes.data, gcd_gc.size))


def stats_orig_hists(seq, qual, seq_off, oidx, order, rev, nbases, q1, q2,
                     a1, a2, ar, threads=2):
    """Native per-base original-read histograms; accumulates q1/q2/a1/a2/
    ar in place, returns (gc_count, qual_sum, max_qual) per selected
    read / overall."""
    lib = _load()
    no = oidx.size
    gc_out = np.zeros(no, np.int64)
    qsum_out = np.zeros(no, np.int64)
    maxq = np.zeros(1, np.int64)
    oidx = np.ascontiguousarray(oidx, np.int64)
    order = np.ascontiguousarray(order, np.uint8)
    rev = np.ascontiguousarray(rev, np.uint8)
    lib.samtpu_stats_orig_hists(
        seq.ctypes.data, qual.ctypes.data, seq_off.ctypes.data,
        oidx.ctypes.data, no, order.ctypes.data, rev.ctypes.data,
        nbases, q1.shape[0], q1.ctypes.data, q2.ctypes.data,
        a1.ctypes.data, a2.ctypes.data, ar.ctypes.data,
        gc_out.ctypes.data, qsum_out.ctypes.data, maxq.ctypes.data,
        threads)
    return gc_out, qsum_out, int(maxq[0])


def has_sam_format() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "samtpu_sam_format") \
        and getattr(lib.samtpu_sam_format, "argtypes", None) is not None


def sam_format(b, idx: np.ndarray, names_blob: np.ndarray,
               names_off: np.ndarray) -> str | None:
    """Format records b[idx] as SAM text (with newlines); None on any
    malformed aux (caller uses the Python path, keeping its errors)."""
    lib = _load()
    idx = np.ascontiguousarray(idx, np.int64)
    out = ctypes.c_void_p()
    out_len = ctypes.c_int64()
    rc = lib.samtpu_sam_format(
        idx.size, idx.ctypes.data,
        np.ascontiguousarray(b.tid, np.int32).ctypes.data,
        np.ascontiguousarray(b.pos, np.int64).ctypes.data,
        np.ascontiguousarray(b.mapq, np.uint8).ctypes.data,
        np.ascontiguousarray(b.flag, np.uint16).ctypes.data,
        np.ascontiguousarray(b.mtid, np.int32).ctypes.data,
        np.ascontiguousarray(b.mpos, np.int64).ctypes.data,
        np.ascontiguousarray(b.tlen, np.int64).ctypes.data,
        np.ascontiguousarray(b.qname, np.uint8).ctypes.data,
        np.ascontiguousarray(b.qname_off, np.int64).ctypes.data,
        np.ascontiguousarray(b.cigar, np.uint32).ctypes.data,
        np.ascontiguousarray(b.cigar_off, np.int64).ctypes.data,
        np.ascontiguousarray(b.seq, np.uint8).ctypes.data,
        np.ascontiguousarray(b.seq_off, np.int64).ctypes.data,
        np.ascontiguousarray(b.qual, np.uint8).ctypes.data,
        np.ascontiguousarray(b.aux, np.uint8).ctypes.data,
        np.ascontiguousarray(b.aux_off, np.int64).ctypes.data,
        names_blob.ctypes.data, names_off.ctypes.data,
        names_off.size - 1, ctypes.byref(out), ctypes.byref(out_len))
    if rc < 0:
        return None
    try:
        return ctypes.string_at(out.value, out_len.value).decode(
            "latin-1")
    finally:
        lib.samtpu_buf_free(out)
