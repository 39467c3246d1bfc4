"""Read-pair overlap quality tweaking (mpileup default).

Reimplements htslib's overlap_push + tweak_overlap_quality (enabled by
bam_mplp_init_overlaps, /root/reference/bam_plcmd.c:586): when both mates
of a template overlap, the overlapping reference positions where both
reads have aligned (M) bases get their qualities merged — same base:
first read gets min(200, q1+q2), second gets 0; different base: the
higher-quality side keeps 0.8*q (truncated), the other gets 0.

Validated against samtools golden outputs (test/mpileup/expected/23.out
vs 24.out is exactly this effect).
"""

from __future__ import annotations

import numpy as np

from ..core import flags as F
from .cigar import expand_ops
from ..core.batch import ragged_gather_indices


def _aligned_map(sub, i: int):
    """(refpos[], qoff[]) of M/=/X bases for read i (absolute qual offsets
    into sub.qual)."""
    cig = sub.cigar_of(i)
    ops = (cig & 0xF).astype(np.int64)
    lens = (cig >> 4).astype(np.int64)
    rp = []
    qp = []
    x = int(sub.pos[i])
    y = 0
    for op, ln in zip(ops, lens):
        if op in (F.CMATCH, F.CEQUAL, F.CDIFF):
            rp.append(np.arange(x, x + ln))
            qp.append(np.arange(y, y + ln))
            x += ln
            y += ln
        elif op in (F.CINS, F.CSOFT_CLIP):
            y += ln
        elif op in (F.CDEL, F.CREF_SKIP):
            x += ln
    if not rp:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return (np.concatenate(rp),
            np.concatenate(qp) + int(sub.seq_off[i]))


def tweak_overlaps(sub) -> None:
    """In-place qual adjustment over a contig sub-batch in file order."""
    if sub.n == 0:
        return
    end = sub.end_pos()
    stored: dict[bytes, int] = {}
    qf = sub.qname.tobytes()
    off = sub.qname_off
    fl = sub.flag.astype(np.int64)
    for i in range(sub.n):
        if fl[i] & F.FMUNMAP or sub.tid[i] != sub.mtid[i]:
            continue
        if sub.mpos[i] >= end[i] or not (fl[i] & F.FPAIRED):
            continue
        name = qf[off[i]:off[i + 1]]
        j = stored.pop(name, None)
        if j is None:
            # only add reads where the mate is still to arrive
            if sub.mpos[i] >= sub.pos[i] or (fl[i] & F.FPAIRED
                                             and sub.mpos[i] == -1):
                stored[name] = i
            continue
        _tweak_pair(sub, j, i)


def _tweak_pair(sub, a: int, b: int) -> None:
    """tweak_overlap_quality(a, b): a arrived first."""
    ra, qa = _aligned_map(sub, a)
    rb, qb = _aligned_map(sub, b)
    if ra.size == 0 or rb.size == 0:
        return
    common, ia, ib = np.intersect1d(ra, rb, return_indices=True)
    if common.size == 0:
        return
    qa_i = qa[ia]
    qb_i = qb[ib]
    base_a = sub.seq[qa_i - sub.seq_off[a] + sub.seq_off[a]]  # = sub.seq[qa_i]
    base_a = sub.seq[qa_i]
    base_b = sub.seq[qb_i]
    qual = sub.qual
    same = base_a == base_b
    qsum = qual[qa_i].astype(np.int64) + qual[qb_i].astype(np.int64)
    a_ge = qual[qa_i] >= qual[qb_i]
    # same base: the stored (first) mate keeps the combined quality, the
    # later one is zeroed; different base: the higher-quality side keeps
    # 0.8*q (truncated), the other is zeroed.  (tweak_overlap_quality;
    # NOTE: two of five pairs in expected/78.out show the opposite
    # orientation — rule not fully reverse-engineered yet, see
    # KNOWN_ISSUES.md)
    new_a = np.where(same, np.minimum(qsum, 200),
                     np.where(a_ge,
                              (0.8 * qual[qa_i].astype(np.float64))
                              .astype(np.int64), 0))
    new_b = np.where(same, 0,
                     np.where(a_ge, 0,
                              (0.8 * qual[qb_i].astype(np.float64))
                              .astype(np.int64)))
    qual[qa_i] = new_a.astype(np.uint8)
    qual[qb_i] = new_b.astype(np.uint8)
