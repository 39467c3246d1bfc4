"""Columnar depth computation.

Reference semantics: bam2depth.c add_depth (/root/reference/bam2depth.c:209)
— ring-buffer per-file histograms incremented per CIGAR op, with per-base
quality gating, optional deletion counting (-J), and template-overlap
clipping (-s).  TPU-native design: the whole contig's reads become
difference arrays / per-base scatter-adds over a dense window — one
vectorized pass instead of a per-read loop.
"""

from __future__ import annotations

import numpy as np

from ..core import flags as F
from ..core.batch import ragged_gather_indices
from .cigar import expand_ops


def overlap_clips(batch, order: np.ndarray) -> np.ndarray:
    """Per-read clip positions for -s overlap removal.

    Reproduces the qname-hash protocol of fastdepth_core
    (bam2depth.c:486-625): first eligible sighting stores endpos, second
    sighting clips at it and clears the entry.  ``order`` gives the
    processing order (merged position order).  Returns clip pos per read
    (0 = no clip).
    """
    clips = np.zeros(batch.n, np.int64)
    eligible = ((batch.flag & F.FPAIRED) != 0) & ((batch.flag & F.FMUNMAP) == 0)
    end = batch.end_pos()
    stored: dict[bytes, int] = {}
    qf = batch.qname.tobytes()
    off = batch.qname_off
    for i in order:
        if not eligible[i]:
            continue
        name = qf[off[i]:off[i + 1]]
        got = stored.pop(name, None)
        if got is not None:
            clips[i] = got
        else:
            if batch.mpos[i] == -1 or (batch.mtid[i] == batch.tid[i]
                                       and batch.mpos[i] <= end[i]):
                stored[name] = int(end[i])
    return clips


def depth_window(batch, sel: np.ndarray, wbeg: int, wend: int,
                 min_qual: int, count_del: bool,
                 clips: np.ndarray | None = None) -> np.ndarray:
    """int32 depth over [wbeg, wend) for the selected reads of one file.

    ``clips`` are per-record absolute overlap-clip positions (0 = none):
    bases/deleted positions at refpos < clip are not counted
    (bam2depth.c:393-447 overlap_clip handling).
    """
    L = wend - wbeg
    diff = np.zeros(L + 1, np.int64)      # interval adds
    direct = np.zeros(L, np.int64)        # per-base adds
    if sel.size == 0:
        return direct.astype(np.int32)
    sub = batch.take(sel)
    t = expand_ops(sub)
    clip = (clips[sel] if clips is not None else np.zeros(sel.size, np.int64))

    m = np.isin(t.op, (F.CMATCH, F.CEQUAL, F.CDIFF))
    if m.any():
        rs = t.rpos[m]
        re = rs + t.oplen[m]
        opclip = clip[t.rid[m]]
        if min_qual == 0:
            s = np.clip(np.maximum(rs, opclip), wbeg, wend) - wbeg
            e = np.clip(np.maximum(re, opclip), wbeg, wend) - wbeg
            np.add.at(diff, s, 1)
            np.add.at(diff, e, -1)
        else:
            lens = t.oplen[m]
            refpos = ragged_gather_indices(rs, lens)
            qoff = ragged_gather_indices(t.qpos[m], lens)
            rid = np.repeat(t.rid[m], lens)
            qual = sub.qual[sub.seq_off[rid] + qoff]
            ok = ((qual >= min_qual) & (refpos >= clip[rid])
                  & (refpos >= wbeg) & (refpos < wend))
            np.add.at(direct, refpos[ok] - wbeg, 1)

    if count_del:
        d = t.op == F.CDEL
        if d.any():
            rs = t.rpos[d]
            re = rs + t.oplen[d]
            opclip = clip[t.rid[d]]
            qpos = t.qpos[d]
            rid = t.rid[d]
            # qual check uses the base at the deletion's query cursor
            # WITHOUT advancing it; reads with no seq always count
            # (bam2depth.c:419-429)
            ok = np.ones(rs.size, bool)
            if min_qual:
                lq = sub.l_qseq[rid]
                has_q = qpos < lq
                qv = np.zeros(rs.size, np.int64)
                qv[has_q] = sub.qual[sub.seq_off[rid[has_q]]
                                     + qpos[has_q]].astype(np.int64)
                ok = ~has_q | (qv >= min_qual)
            s = np.clip(np.maximum(rs, opclip), wbeg, wend) - wbeg
            e = np.clip(np.maximum(re, opclip), wbeg, wend) - wbeg
            np.add.at(diff, s[ok], 1)
            np.add.at(diff, e[ok], -1)

    return (np.cumsum(diff[:L]) + direct).astype(np.int32)


def coverage_envelope(pos: np.ndarray, end: np.ndarray,
                      wbeg: int, wend: int) -> np.ndarray:
    """bool[L]: positions covered by the union of read intervals — the row
    set depth prints (the reference's end_pos flush logic)."""
    L = wend - wbeg
    diff = np.zeros(L + 1, np.int64)
    s = np.clip(pos, wbeg, wend) - wbeg
    e = np.clip(end, wbeg, wend) - wbeg
    np.add.at(diff, s, 1)
    np.add.at(diff, e, -1)
    return np.cumsum(diff[:L]) > 0
