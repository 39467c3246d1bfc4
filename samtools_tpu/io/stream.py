"""Streaming + index-driven BAM access: bounded memory, O(region) bytes.

The reference streams everything (bam2depth.c:60-70 ring buffer;
sam_itr_querys at bam_plcmd.c:541 reads only indexed byte ranges).  The
round-1 framework slurped whole files; this module restores both
properties for the columnar design:

* ``BamStream.batches()`` — iterate ReadBatch chunks of bounded size:
  compressed file read in fixed windows, BGZF blocks inflated per
  window, complete records decoded per chunk (a partial tail record
  carries into the next chunk).  RSS stays O(window), any file size.
* ``BamStream.query(tid, beg, end)`` — BAI/CSI-driven random access:
  only the byte ranges of the index chunks overlapping the region are
  read from disk and inflated (htslib sam_itr semantics, including the
  linear-index lower bound), then filtered to actual overlap.

Python fallbacks exist for every native call via io.bgzf / io.bam.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..core.batch import ReadBatch
from . import bgzf
from .bam import BamError, decode_header, decode_records
from .header import SamHeader
from .index import BamIndex, find_index_file, read_bai


def _scan_partial(arr: np.ndarray, start: int):
    try:
        from . import native
        if native.available():
            return native.bam_scan_partial(arr, start)
    except (ImportError, OSError):
        pass
    # python fallback
    buf = arr.tobytes()
    n = len(buf)
    offs = []
    off = start
    while off + 4 <= n:
        bs = int.from_bytes(buf[off:off + 4], "little")
        if bs == 0:
            raise BamError(f"corrupt BAM record size 0 at offset {off}")
        if off + 4 + bs > n:
            break
        offs.append(off)
        off += 4 + bs
    return np.array(offs, np.int64), off


@dataclass
class _BlockWindow:
    """Blocks inflated from one compressed window."""
    data: np.ndarray          # uncompressed bytes
    coffs: np.ndarray         # compressed offset per block (absolute)
    bsizes: np.ndarray        # compressed size per block
    uoffs: np.ndarray         # uncompressed offset per block within data

    @property
    def cend(self) -> int:
        """Compressed offset just past the last inflated block."""
        return (int(self.coffs[-1] + self.bsizes[-1])
                if self.coffs.size else 0)


class BamStream:
    """Streaming BAM reader with index-driven random access."""

    def __init__(self, path: str, threads: int = 0,
                 window_bytes: int = 32 << 20):
        from .hfile import resolve
        path = resolve(path)
        self.path = path
        self.threads = threads or 2
        env_win = os.environ.get("SAMTPU_STREAM_WINDOW")
        self.window_bytes = int(env_win) if env_win else window_bytes
        self._f = open(path, "rb")
        self._size = os.fstat(self._f.fileno()).st_size
        self._ibuf: np.ndarray | None = None  # reusable inflate buffer
        self._index: BamIndex | None = None
        self._index_tried = False
        # decode the header from the first window(s)
        self.header, self._hdr_voffset = self._read_header()

    # ------------------------------------------------------------ internal
    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _inflate_span(self, cbeg: int, cend_hint: int) -> _BlockWindow:
        """Inflate complete BGZF blocks in [cbeg, ~cend_hint)."""
        self._f.seek(cbeg)
        raw = self._f.read(max(cend_hint - cbeg, 1 << 16))
        coffs, bsizes = bgzf.scan_blocks_partial(raw)
        if coffs.size == 0:
            return _BlockWindow(np.empty(0, np.uint8),
                                np.empty(0, np.int64),
                                np.empty(0, np.int64),
                                np.zeros(1, np.int64))
        span = int(coffs[-1] + bsizes[-1])
        data, uoffs = bgzf.inflate_blocks(raw[:span], coffs, bsizes,
                                          self.threads, out=self._ibuf)
        if data.base is not None and self._ibuf is not None \
                and data.base is self._ibuf:
            pass  # reused our buffer
        elif data.size >= (1 << 20):
            self._ibuf = data.base if data.base is not None else data
        return _BlockWindow(data, coffs + cbeg, bsizes, uoffs)

    def _read_header(self) -> tuple[SamHeader, int]:
        """Decode the SAM header, growing the inflated prefix as needed.
        Returns (header, virtual offset of the first record)."""
        import struct as _struct
        want = 1 << 16
        while True:
            w = self._inflate_span(0, want)
            try:
                header, off = decode_header(w.data)
            except (IndexError, ValueError, _struct.error):
                # header spans past the inflated prefix — grow it
                if w.cend >= self._size:
                    raise BamError("truncated BAM header")
                want *= 4
                continue
            if off <= w.data.size:
                blk = int(np.searchsorted(w.uoffs, off, "right") - 1)
                blk = min(blk, w.coffs.size - 1)
                voff = (int(w.coffs[blk]) << 16) | (off - int(w.uoffs[blk]))
                return header, voff
            if w.cend >= self._size:
                raise BamError("truncated BAM header")
            want *= 4

    # ------------------------------------------------------------- batches
    def batches(self, fields: int = 31, start_voffset: int | None = None):
        """Yield ReadBatch chunks; memory stays O(window_bytes).

        ``start_voffset``: resume from a record-aligned virtual offset
        (as reported in ``self.next_record_voffset`` after each yield)
        — the checkpoint/resume hook: a restarted process re-enters the
        stream exactly at the first unconsumed record."""
        voff = (self._hdr_voffset if start_voffset is None
                else start_voffset)
        cpos = voff >> 16
        skip = voff & 0xFFFF
        leftover = np.empty(0, np.uint8)
        self.next_record_voffset = voff
        while cpos < self._size:
            w = self._inflate_span(cpos, cpos + self.window_bytes)
            if w.coffs.size == 0:
                break
            data = w.data[skip:] if skip else w.data
            if leftover.size:
                data = np.concatenate([leftover, data])
            offs, consumed = _scan_partial(data, 0)
            lsize = leftover.size
            leftover = data[consumed:].copy()
            if offs.size:
                # virtual offset of the first byte after the consumed
                # records (record-aligned by construction)
                rel = consumed - lsize + skip
                if rel >= w.data.size and w.uoffs.size > 1:
                    nxt = (int(w.coffs[-1] + w.bsizes[-1])) << 16
                else:
                    blk = int(np.searchsorted(w.uoffs, rel,
                                              "right") - 1)
                    blk = max(0, min(blk, w.coffs.size - 1))
                    nxt = (int(w.coffs[blk]) << 16) \
                        | int(rel - w.uoffs[blk])
                self.next_record_voffset = nxt
                yield _decode(data, offs, self.threads, fields)
            cpos = w.cend  # next window starts after the last block
            skip = 0
        if leftover.size:
            raise BamError("truncated BAM record at end of stream")

    # -------------------------------------------------------------- query
    def index(self) -> BamIndex | None:
        if not self._index_tried:
            self._index_tried = True
            p = find_index_file(self.path)
            if p:
                try:
                    self._index = read_bai(p)
                except Exception:
                    self._index = None
        return self._index

    def query(self, tid: int, beg: int, end: int,
              fields: int = 31) -> ReadBatch | None:
        """Reads overlapping [beg, end) on tid via the index; None when no
        index is available (caller falls back to a full scan)."""
        idx = self.index()
        if idx is None:
            return None
        chunks = idx.query_chunks(tid, beg, end)
        parts = []
        for vbeg, vend in chunks:
            cbeg, ubeg = int(vbeg) >> 16, int(vbeg) & 0xFFFF
            cend, uend = int(vend) >> 16, int(vend) & 0xFFFF
            # inflate [cbeg .. cend] inclusive of the block at cend when
            # the end offset points inside it
            hint = cend - cbeg + (1 << 16) if uend else cend - cbeg
            w = self._inflate_span(cbeg, max(hint, 1 << 16))
            if w.coffs.size == 0:
                continue
            # clip to the chunk's uncompressed span
            if uend:
                eblk = np.searchsorted(w.coffs, cend, "right") - 1
                if eblk < 0:
                    continue
                stop = int(w.uoffs[eblk]) + uend
            else:
                eblk = np.searchsorted(w.coffs, cend, "left") - 1
                stop = (int(w.uoffs[eblk + 1])
                        if eblk + 1 < w.uoffs.size else w.data.size)
            stop = min(stop, w.data.size)
            data = w.data[ubeg:stop]
            offs, consumed = _scan_partial(data, 0)
            if consumed != data.size:
                raise BamError("BAI chunk does not end on a record boundary")
            if offs.size:
                parts.append(_decode(data, offs, self.threads, fields))
        if not parts:
            return ReadBatch(n=0)
        batch = parts[0] if len(parts) == 1 else ReadBatch.concat(parts)
        # exact overlap filter (bins are a superset)
        e = batch.end_pos()
        keep = (batch.tid == tid) & (batch.pos < end) & (e > beg)
        return batch.take(np.nonzero(keep)[0])


class WindowedReader:
    """Genomic-window iteration over one or more coordinate-sorted
    streams: yields (tid, wb, we, [overlap ReadBatch per stream]) with
    halo-carried boundary reads, bounded memory.  The generic form of
    the span-block pattern (bam_consensus.c:2626) used by the streamed
    pileup-family tools."""

    def __init__(self, streams, window_cols: int = 1 << 20,
                 filter_fn=None, fields: int = 31):
        # 1M columns: at 60x short-read coverage one window's expanded
        # entry temporaries stay ~1-2 GB; 4M-column windows peaked 17 GB
        self.streams = streams
        self.window = window_cols
        self.filter_fn = filter_fn
        self.fields = fields

    def __iter__(self):
        fns = (self.filter_fn if isinstance(self.filter_fn, list)
               else [self.filter_fn] * len(self.streams))
        cursors = [_Cursor(st, fn, self.fields)
                   for st, fn in zip(self.streams, fns)]
        while True:
            fronts = [c.front() for c in cursors]
            live = [f for f in fronts if f is not None]
            if not live:
                return
            tid = min(f[0] for f in live)
            wb = min(f[1] for f in live if f[0] == tid)
            while True:
                we = wb + self.window
                subs = [c.take(tid, wb, we) for c in cursors]
                yield tid, wb, we, subs
                if not any(c.more_on(tid) for c in cursors):
                    break
                wb = we


class _Cursor:
    def __init__(self, stream, filter_fn, fields):
        self.gen = stream.batches(fields=fields)
        self.filter_fn = filter_fn
        self.pending: list = []
        self.carry = None

    def _pull(self):
        nb = next(self.gen, None)
        if nb is None:
            return False
        if self.filter_fn is not None:
            sel = np.nonzero(self.filter_fn(nb))[0]
            if sel.size == 0:
                return True
            nb = nb.take(sel)
        if nb.n:
            self.pending.append(nb)
        return True

    def front(self):
        while not self.pending:
            if not self._pull():
                return None
        b = self.pending[0]
        return int(b.tid[0]), int(b.pos[0])

    def take(self, tid, wb, we):
        parts = []
        if self.carry is not None:
            cb, ctid = self.carry
            if ctid == tid:
                e = cb.end_pos()
                parts.append(cb.take(np.nonzero(e > wb)[0]))
            self.carry = None
        while True:
            fr = self.front()
            if fr is None or fr[0] > tid or (fr[0] == tid
                                             and fr[1] >= we):
                break
            b = self.pending[0]
            m = (b.tid == tid) & (b.pos < we)
            parts.append(b.take(np.nonzero(m)[0]))
            rest = np.nonzero(~m)[0]
            if rest.size:
                self.pending[0] = b.take(rest)
                break
            self.pending.pop(0)
        sub = (ReadBatch.concat(parts) if len(parts) > 1 else
               parts[0] if parts else ReadBatch(n=0))
        if sub.n:
            e = sub.end_pos()
            hal = np.nonzero(e > we)[0]
            if hal.size:
                self.carry = (sub.take(hal), tid)
        return sub

    def more_on(self, tid):
        if self.carry is not None and self.carry[1] == tid:
            return True
        fr = self.front()
        return fr is not None and fr[0] == tid


def _decode(data: np.ndarray, offs: np.ndarray, threads: int,
            fields: int) -> ReadBatch:
    from ..core import metrics
    with metrics.stage("stream.decode", offs.size, "reads"):
        return _decode_inner(data, offs, threads, fields)


def _decode_inner(data: np.ndarray, offs: np.ndarray, threads: int,
                  fields: int) -> ReadBatch:
    try:
        from . import native
        if native.available():
            cols = native.bam_decode_columns(data, offs, threads, fields)
            b = ReadBatch(n=offs.size)
            for k, v in cols.items():
                setattr(b, k, v)
            from .bam import _fixup_long_cigars
            if fields & 2 and fields & 16:
                _fixup_long_cigars(b)
            return b
    except (ImportError, OSError):
        pass
    return decode_records(data, int(offs[0]) if offs.size else 0)
