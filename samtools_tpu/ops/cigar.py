"""Vectorized CIGAR expansion — the foundational transform of the pileup
family.

Replaces the per-read cursor walks of the reference (htslib bam_plp,
consensus_pileup.c:81 get_next_base, bam2depth.c:209 add_depth) with one
columnar pass: every CIGAR op of every read becomes a row in a flat op
table carrying its absolute reference / query start coordinates, computed
with segment-offset cumsums (no Python loops).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core import flags as F
from ..core.batch import ragged_gather_indices

CONSUMES_REF = np.array(F.CIGAR_CONSUMES_REF + [0] * 6, np.int64)
CONSUMES_QRY = np.array(F.CIGAR_CONSUMES_QUERY + [0] * 6, np.int64)


@dataclass
class OpTable:
    """One row per CIGAR op across the whole batch."""
    rid: np.ndarray    # record index
    op: np.ndarray     # 0..9
    oplen: np.ndarray
    rpos: np.ndarray   # absolute 0-based reference pos at op start
    qpos: np.ndarray   # query offset at op start
    # per-read boundaries into this table
    op_off: np.ndarray

    @property
    def n(self) -> int:
        return self.rid.size


def expand_ops(batch, idx: np.ndarray | None = None) -> OpTable:
    """Build the op table for all (or selected) records."""
    if idx is not None:
        b = batch.take(np.asarray(idx, np.int64))
    else:
        b = batch
    n = b.n
    ncig = b.n_cigar
    rid = np.repeat(np.arange(n, dtype=np.int64), ncig)
    ops = (b.cigar & 0xF).astype(np.int64)
    lens = (b.cigar >> 4).astype(np.int64)
    rcons = lens * CONSUMES_REF[ops]
    qcons = lens * CONSUMES_QRY[ops]
    # exclusive prefix sums, reset per read via the segment-offset trick
    cr = np.concatenate([[0], np.cumsum(rcons)[:-1]])
    cq = np.concatenate([[0], np.cumsum(qcons)[:-1]])
    seg_r = cr[b.cigar_off[:-1]]
    seg_q = cq[b.cigar_off[:-1]]
    rpos = cr - seg_r[rid] + b.pos[rid]
    qpos = cq - seg_q[rid]
    return OpTable(rid=rid, op=ops, oplen=lens, rpos=rpos, qpos=qpos,
                   op_off=b.cigar_off.copy())


def match_bases(table: OpTable, batch, idx: np.ndarray | None = None):
    """Per-aligned-base expansion of M/=/X ops: (refpos, qoff, rid) flat
    arrays.  qoff indexes into the (possibly sub-batched) seq/qual flats."""
    b = batch if idx is None else batch.take(np.asarray(idx, np.int64))
    m = np.isin(table.op, (F.CMATCH, F.CEQUAL, F.CDIFF))
    lens = table.oplen[m]
    refpos = ragged_gather_indices(table.rpos[m], lens)
    qoff_in_read = ragged_gather_indices(table.qpos[m], lens)
    rid = np.repeat(table.rid[m], lens)
    qoff = b.seq_off[rid] + qoff_in_read
    return refpos, qoff, rid
