"""BGZF blocked-gzip codec.

BGZF (SAM spec §4.1) is a series of gzip members each <=64 KiB with an extra
'BC' subfield recording the compressed block size, enabling random access via
virtual offsets ``(coffset << 16) | uoffset``.

Reference analog: htslib's bgzf.c (external to /root/reference).  Design here
is batch-oriented: we scan all block boundaries first, then inflate blocks in
parallel on a host thread pool (zlib releases the GIL), yielding one large
contiguous uncompressed buffer — the shape the columnar BAM decoder wants.
This mirrors the reference's hts_tpool parallel block codec
(/root/reference/bam_sort.c:3479 uses it) but as a batch, not a stream.
"""

from __future__ import annotations

import io
import struct
import zlib
from concurrent.futures import ThreadPoolExecutor

import numpy as np

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)

_HDR = struct.Struct("<4BI2BH")  # id1,id2,cm,flg,mtime,xfl,os,xlen


class BgzfError(RuntimeError):
    pass


def is_bgzf(data: bytes) -> bool:
    """True if buffer starts with a BGZF block (gzip + FEXTRA + BC field)."""
    if len(data) < 18:
        return False
    if data[0] != 0x1F or data[1] != 0x8B or not (data[3] & 4):
        return False
    xlen = int.from_bytes(data[10:12], "little")
    extra = data[12:12 + xlen]
    i = 0
    while i + 4 <= len(extra):
        si1, si2, slen = extra[i], extra[i + 1], int.from_bytes(extra[i + 2:i + 4], "little")
        if si1 == 66 and si2 == 67 and slen == 2:
            return True
        i += 4 + slen
    return False


def is_gzip(data: bytes) -> bool:
    return len(data) >= 2 and data[0] == 0x1F and data[1] == 0x8B


def scan_blocks(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Return (coffsets, bsizes) for every BGZF block in `data`.

    coffsets[i] is the file offset of block i; bsizes[i] its compressed size.
    """
    coffs = []
    bsizes = []
    off = 0
    n = len(data)
    while off < n:
        if n - off < 18:
            raise BgzfError("truncated BGZF block header")
        if data[off] != 0x1F or data[off + 1] != 0x8B:
            raise BgzfError(f"bad gzip magic at offset {off}")
        xlen = int.from_bytes(data[off + 10:off + 12], "little")
        extra_start = off + 12
        extra = data[extra_start:extra_start + xlen]
        bsize = None
        i = 0
        while i + 4 <= len(extra):
            si1, si2, slen = extra[i], extra[i + 1], int.from_bytes(extra[i + 2:i + 4], "little")
            if si1 == 66 and si2 == 67 and slen == 2:
                bsize = int.from_bytes(extra[i + 4:i + 6], "little") + 1
                break
            i += 4 + slen
        if bsize is None:
            raise BgzfError(f"no BC subfield at offset {off}")
        coffs.append(off)
        bsizes.append(bsize)
        off += bsize
    return np.array(coffs, np.int64), np.array(bsizes, np.int64)


def scan_blocks_partial(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """(coffsets, bsizes) of all COMPLETE blocks in `data`; a truncated
    trailing block is ignored (streaming windows cut mid-block)."""
    coffs = []
    bsizes = []
    off = 0
    n = len(data)
    while off + 18 <= n:
        if data[off] != 0x1F or data[off + 1] != 0x8B:
            raise BgzfError(f"bad gzip magic at offset {off}")
        xlen = int.from_bytes(data[off + 10:off + 12], "little")
        if off + 12 + xlen > n:
            break
        extra = data[off + 12:off + 12 + xlen]
        bsize = None
        i = 0
        while i + 4 <= len(extra):
            si1, si2 = extra[i], extra[i + 1]
            slen = int.from_bytes(extra[i + 2:i + 4], "little")
            if si1 == 66 and si2 == 67 and slen == 2:
                bsize = int.from_bytes(extra[i + 4:i + 6], "little") + 1
                break
            i += 4 + slen
        if bsize is None:
            raise BgzfError(f"no BC subfield at offset {off}")
        if off + bsize > n:
            break
        coffs.append(off)
        bsizes.append(bsize)
        off += bsize
    return np.array(coffs, np.int64), np.array(bsizes, np.int64)


def inflate_blocks(data: bytes, coffs: np.ndarray, bsizes: np.ndarray,
                   threads: int = 0, out: np.ndarray | None = None
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Inflate the given blocks; returns (uint8 array, uoffsets[nblk+1]).
    ``out``: optional reusable buffer (see native.bgzf_inflate)."""
    nat = _native()
    if nat is not None and len(coffs):
        arr = np.frombuffer(data, np.uint8) if not isinstance(
            data, np.ndarray) else data
        ends = (coffs + bsizes - 4).astype(np.int64)
        isizes = (arr[ends[:, None] + np.arange(4)]
                  .astype(np.uint32) * (1 << (8 * np.arange(4)))).sum(1)
        uoffs = np.zeros(len(coffs) + 1, np.int64)
        np.cumsum(isizes, out=uoffs[1:])
        out = nat.bgzf_inflate(data, coffs, bsizes, int(uoffs[-1]),
                               max(threads, 2), out=out)
        return out, uoffs
    if isinstance(data, np.ndarray):
        data = data.tobytes()
    parts = [_inflate_block(data, int(o), int(b))
             for o, b in zip(coffs, bsizes)]
    ulens = np.array([len(p) for p in parts], np.int64)
    uoffs = np.zeros(len(parts) + 1, np.int64)
    np.cumsum(ulens, out=uoffs[1:])
    return np.frombuffer(b"".join(parts), np.uint8), uoffs


def _inflate_block(data: bytes, off: int, bsize: int) -> bytes:
    xlen = int.from_bytes(data[off + 10:off + 12], "little")
    cdata_start = off + 12 + xlen
    cdata_end = off + bsize - 8
    isize = int.from_bytes(data[off + bsize - 4:off + bsize], "little")
    out = zlib.decompress(data[cdata_start:cdata_end], -15, isize or 1)
    if len(out) != isize:
        raise BgzfError("BGZF ISIZE mismatch")
    return out


def _native():
    try:
        from . import native
        if native.available():
            return native
    except Exception:
        pass
    return None


def decompress_arr(data: bytes, threads: int = 0) -> np.ndarray:
    """Inflate an entire BGZF byte buffer to one uint8 array (zero-copy
    relative to the native inflate output; prefer for large BAM bodies)."""
    nat = _native()
    if nat is not None:
        coffs, bsizes, isizes = nat.bgzf_scan(data)
        return nat.bgzf_inflate(data, coffs, bsizes, int(isizes.sum()),
                                max(threads, 2))
    return np.frombuffer(decompress(data, threads), np.uint8)


def decompress(data: bytes, threads: int = 0) -> bytes:
    """Inflate an entire BGZF byte buffer to one contiguous bytes object."""
    nat = _native()
    if nat is not None:
        coffs, bsizes, isizes = nat.bgzf_scan(data)
        return nat.bgzf_inflate(data, coffs, bsizes, int(isizes.sum()),
                                max(threads, 2)).tobytes()
    coffs, bsizes = scan_blocks(data)
    if threads and len(coffs) > 4:
        with ThreadPoolExecutor(max_workers=threads) as ex:
            parts = list(ex.map(lambda t: _inflate_block(data, t[0], t[1]),
                                zip(coffs.tolist(), bsizes.tolist())))
    else:
        parts = [_inflate_block(data, int(o), int(b))
                 for o, b in zip(coffs, bsizes)]
    return b"".join(parts)


def decompress_with_index(data: bytes, threads: int = 0):
    """Inflate, also returning per-block (coffset, uoffset) for virtual-offset
    math (BAI chunk → uncompressed range)."""
    nat = _native()
    if nat is not None:
        coffs, bsizes, isizes = nat.bgzf_scan(data)
        out = nat.bgzf_inflate(data, coffs, bsizes, int(isizes.sum()),
                               max(threads, 2)).tobytes()
        uoffs = np.zeros(len(coffs) + 1, np.int64)
        np.cumsum(isizes, out=uoffs[1:])
        return out, coffs, uoffs
    coffs, bsizes = scan_blocks(data)
    if threads and len(coffs) > 4:
        with ThreadPoolExecutor(max_workers=threads) as ex:
            parts = list(ex.map(lambda t: _inflate_block(data, t[0], t[1]),
                                zip(coffs.tolist(), bsizes.tolist())))
    else:
        parts = [_inflate_block(data, int(o), int(b))
                 for o, b in zip(coffs, bsizes)]
    ulens = np.array([len(p) for p in parts], np.int64)
    uoffs = np.zeros(len(parts) + 1, np.int64)
    np.cumsum(ulens, out=uoffs[1:])
    return b"".join(parts), coffs, uoffs


def read_file(path: str, threads: int = 0) -> bytes:
    """Read a file that may be BGZF, plain gzip, or uncompressed; return the
    uncompressed content."""
    with open(path, "rb") as f:
        data = f.read()
    if is_bgzf(data):
        return decompress(data, threads=threads)
    if is_gzip(data):
        return zlib.decompress(data, 47)
    return data


def _deflate_block(chunk: bytes, level: int) -> bytes:
    nat = _native()
    if nat is not None and len(chunk) <= 0xFF00:
        return nat.bgzf_deflate(chunk, level, 0xFF00, 1)
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    cdata = co.compress(chunk) + co.flush()
    crc = zlib.crc32(chunk) & 0xFFFFFFFF
    bsize = len(cdata) + 18 + 8
    if bsize > 0x10000:
        raise BgzfError("BGZF block too large after compression")
    hdr = _HDR.pack(0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6)
    extra = b"BC" + struct.pack("<HH", 2, bsize - 1)
    return hdr + extra + cdata + struct.pack("<II", crc, len(chunk))


def compress(data: bytes, level: int = 6, threads: int = 0,
             append_eof: bool = True, block_size: int = 0xFF00) -> bytes:
    """Compress a buffer into BGZF blocks (+ EOF marker).

    Framing is identical whichever codec runs: block_size is clamped to
    0xFF00 (the BGZF payload maximum) on both paths, and empty input
    emits only the EOF marker (htslib behavior).
    """
    if block_size <= 0 or block_size > 0xFF00:
        block_size = 0xFF00
    if not data:
        return BGZF_EOF if append_eof else b""
    nat = _native()
    if nat is not None:
        body = nat.bgzf_deflate(data, level, block_size, max(threads, 2))
        return body + BGZF_EOF if append_eof else body
    chunks = [data[i:i + block_size] for i in range(0, len(data), block_size)]
    if threads and len(chunks) > 4:
        with ThreadPoolExecutor(max_workers=threads) as ex:
            parts = list(ex.map(lambda c: _deflate_block(c, level), chunks))
    else:
        parts = [_deflate_block(c, level) for c in chunks]
    if append_eof:
        parts.append(BGZF_EOF)
    return b"".join(parts)


class BgzfWriter:
    """Streaming BGZF writer (buffers up to block_size then deflates)."""

    def __init__(self, fileobj: io.RawIOBase, level: int = 6, threads: int = 0,
                 block_size: int = 0xFF00):
        self._f = fileobj
        self._level = level
        self._threads = threads
        self._block_size = block_size
        self._buf = bytearray()
        self._pool = (ThreadPoolExecutor(max_workers=threads)
                      if threads > 1 else None)
        self._pending = []

    def write(self, data: bytes):
        self._buf += data
        while len(self._buf) >= self._block_size:
            chunk = bytes(self._buf[:self._block_size])
            del self._buf[:self._block_size]
            self._emit(chunk)

    def _emit(self, chunk: bytes):
        if self._pool is not None:
            self._pending.append(self._pool.submit(_deflate_block, chunk, self._level))
            if len(self._pending) >= 64:
                self._drain()
        else:
            self._f.write(_deflate_block(chunk, self._level))

    def _drain(self):
        for fut in self._pending:
            self._f.write(fut.result())
        self._pending = []

    def close(self, write_eof: bool = True):
        if self._buf:
            self._emit(bytes(self._buf))
            self._buf = bytearray()
        if self._pool is not None:
            self._drain()
            self._pool.shutdown()
            self._pool = None
        if write_eof:
            self._f.write(BGZF_EOF)


def has_eof_block(path: str) -> bool:
    """Check the file ends with the 28-byte BGZF EOF marker
    (reference behavior: bam_quickcheck.c checks this)."""
    try:
        with open(path, "rb") as f:
            f.seek(0, 2)
            size = f.tell()
            if size < 28:
                return False
            f.seek(size - 28)
            return f.read(28) == BGZF_EOF
    except OSError:
        return False
