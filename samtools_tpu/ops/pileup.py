"""Columnar pileup engine.

Replaces htslib's bam_plp pull-iterator (consumed at
/root/reference/bam_plcmd.c:607) and the reference's second engine
consensus_pileup.c.  Instead of per-read cursors advanced column by
column, the whole sub-batch's CIGARs are expanded into a flat entry table
(one row per read per covered reference position) with one vectorized
pass, then sorted by (position, arrival order).  Downstream consumers
(mpileup text, consensus scorer, bedcov) walk columns as slices of this
table.

Entry semantics match bam_pileup1_t: qpos (query index of the base, or of
the next base when inside a deletion), is_del / is_refskip, is_head /
is_tail, and indel (+len insertion / -len deletion anchored at the column
*before* the event).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..core import flags as F
from ..core.batch import ragged_gather_indices
from .cigar import expand_ops

# ref-consuming ops that generate pileup entries
_ENTRY_OPS = (F.CMATCH, F.CDEL, F.CREF_SKIP, F.CEQUAL, F.CDIFF)


@dataclass
class Pileup:
    """Flat entry table sorted by (pos, read arrival)."""
    n_entries: int
    pos: np.ndarray        # int64 reference position
    rid: np.ndarray        # read index within the sub-batch
    qpos: np.ndarray       # int64 query offset
    is_del: np.ndarray     # bool
    is_refskip: np.ndarray
    is_head: np.ndarray
    is_tail: np.ndarray
    indel: np.ndarray      # int64, + insertion len / - deletion len
    # insertion details per entry index (only for indel>0 anchors):
    # entry_idx -> (ins_string_uppercase_with_pads, del_after, qpos_list)
    # where qpos_list[k] is the query offset of char k (-1 for '*' pads),
    # used by mpileup -M insertion mod annotation
    ins: dict = field(default_factory=dict)
    # column boundaries: sorted unique positions + start index per column
    col_pos: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    col_off: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    # the (pos, arrival) sort permutation applied by _finish — lets
    # consumers carry extra per-entry arrays computed in pre-sort
    # (expansion) order into table order
    order: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))


_ENTRY_LUT = np.zeros(16, bool)
for _o in _ENTRY_OPS:
    _ENTRY_LUT[_o] = True
_M_LUT = np.zeros(16, bool)
for _o in (F.CMATCH, F.CEQUAL, F.CDIFF):
    _M_LUT[_o] = True


def build_pileup(sub) -> Pileup:
    """Build the pileup table for one contig's reads (file order)."""
    t = expand_ops(sub)
    emit = _ENTRY_LUT[t.op]
    lens = np.where(emit, t.oplen, 0)
    total = int(lens.sum())
    if total == 0:
        return Pileup(0, *(np.empty(0, np.int64) for _ in range(3)),
                      *(np.empty(0, bool) for _ in range(4)),
                      np.empty(0, np.int64))

    # entry start per op (op order == read order == file order)
    entry_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
    e_ops = np.nonzero(emit)[0]
    e_len = t.oplen[e_ops]
    pos = ragged_gather_indices(t.rpos[e_ops], e_len)
    rid = np.repeat(t.rid[e_ops].astype(np.int32), e_len)
    is_m = _M_LUT[t.op[e_ops]]
    is_m_e = np.repeat(is_m, e_len)
    # query pos: advancing within M ops, frozen at op start within D/N
    qpos_adv = ragged_gather_indices(t.qpos[e_ops], e_len)
    qpos_frozen = np.repeat(t.qpos[e_ops], e_len)
    qpos = np.where(is_m_e, qpos_adv, qpos_frozen).astype(np.int32)
    is_del = ~is_m_e
    is_refskip = np.repeat(t.op[e_ops] == F.CREF_SKIP, e_len)

    end = sub.end_pos()
    is_head = pos == sub.pos[rid]
    is_tail = pos == end[rid] - 1

    indel = np.zeros(total, np.int32)
    ins: dict = {}

    n_ops = t.op.size
    last_entry_of_op = entry_start + lens - 1  # valid where emit
    seq_chars = np.frombuffer(F.SEQ_NT16_STR.encode(), np.uint8)

    # indel events: for each pair of consecutive emitting ops of a read,
    # the run of non-emitting ops between them anchors at the last entry
    # of the first op.  A run containing I → insertion event whose string
    # covers the whole run (I bases, '*' per pad — the padded-reference
    # grammar of pileup_seq / bam_plp_insertion; see the c1#pad fixtures);
    # a following D contributes del_after.  An empty/pad-only run before a
    # D → plain deletion (-dlen).  N never produces an indel annotation.
    indel_reads = np.unique(t.rid[np.isin(t.op, (F.CINS, F.CDEL))])
    rid_op_start = {}
    if indel_reads.size:
        # op ranges per read from op_off
        for r in indel_reads:
            k0 = int(t.op_off[r])
            k1 = int(t.op_off[r + 1])
            emit_ks = [k for k in range(k0, k1) if emit[k]]
            for ei, p in enumerate(emit_ks):
                q = emit_ks[ei + 1] if ei + 1 < len(emit_ks) else None
                run = range(p + 1, q if q is not None else k1)
                if not len(run):
                    # adjacent emitting ops: direct deletion
                    if q is not None and t.op[q] == F.CDEL:
                        anchor = int(last_entry_of_op[p])
                        indel[anchor] = -int(t.oplen[q])
                    continue
                parts = []
                qlist: list[int] = []
                has_ins = False
                for j in run:
                    o = int(t.op[j])
                    if o == F.CINS:
                        has_ins = True
                        q0 = int(t.qpos[j])
                        bases = sub.seq[sub.seq_off[r] + q0:
                                        sub.seq_off[r] + q0
                                        + int(t.oplen[j])]
                        if bases.size:
                            parts.append(
                                bytes(seq_chars[bases]).decode("latin-1"))
                        else:
                            parts.append("N" * int(t.oplen[j]))
                        qlist.extend(range(q0, q0 + int(t.oplen[j])))
                    elif o == F.CPAD:
                        parts.append("*" * int(t.oplen[j]))
                        qlist.extend([-1] * int(t.oplen[j]))
                    else:  # S/H terminate the event scan
                        break
                anchor = int(last_entry_of_op[p])
                if has_ins:
                    del_after = (int(t.oplen[q])
                                 if q is not None and t.op[q] == F.CDEL
                                 else 0)
                    sstr = "".join(parts)
                    indel[anchor] = len(sstr)
                    ins[anchor] = (sstr, del_after, qlist)
                elif q is not None and t.op[q] == F.CDEL:
                    indel[anchor] = -int(t.oplen[q])
    del rid_op_start
    return _finish(Pileup(total, pos, rid, qpos, is_del, is_refskip,
                          is_head, is_tail, indel, ins))


_DEV_SORT = None


def _device_stable_order(pos: np.ndarray) -> np.ndarray:
    """Stable order-by-position on the accelerator: ``lax.sort`` with the
    entry index as a carried operand (is_stable=True preserves read
    arrival order within a column, the bam_plp iteration contract).
    Padded to power-of-two buckets so repeated windows share the compiled
    kernel."""
    global _DEV_SORT
    from .. import device as _device  # noqa: F401  platform selection
    import jax
    import jax.numpy as jnp
    if _DEV_SORT is None:
        @jax.jit
        def f(keys):
            idx = jnp.arange(keys.size, dtype=jnp.int32)
            _, order = jax.lax.sort((keys, idx), num_keys=1,
                                    is_stable=True)
            return order
        _DEV_SORT = f
    n = pos.size
    b = 1 << int(np.ceil(np.log2(max(n, 1024))))
    # int32 device keys (x64 is off); shift to a window-relative base.
    # Positions are window-local by construction; guard anyway.
    base = int(pos.min()) if n else 0
    span = int(pos.max()) - base if n else 0
    if span >= np.iinfo(np.int32).max - 1 or n >= (1 << 31):
        return np.lexsort((np.arange(n), pos))
    keys = np.full(b, np.iinfo(np.int32).max, np.int32)
    keys[:n] = (pos - base).astype(np.int32)
    order = np.asarray(_DEV_SORT(keys))[:n]
    return order.astype(np.int64)


def _finish(p: Pileup) -> Pileup:
    if p.n_entries == 0:
        return p
    import os
    from ..core import metrics
    if os.environ.get("SAMTPU_DEVICE") in ("1", "device", "force"):
        # forced-device runs exercise the accelerator sort path (tests);
        # auto mode keeps this op on the host: a 30M-key window moves
        # ~250 MB of keys+order, which loses to a ~1 s host radix sort
        # on any link slower than ~GB/s
        with metrics.stage("device.pileup_sort", p.n_entries, "entries"):
            order = _device_stable_order(p.pos)
    else:
        # stable integer sort on window-relative int32 keys
        base = int(p.pos.min())
        span = int(p.pos.max()) - base
        if span < (1 << 31) - 1:
            order = np.argsort((p.pos - base).astype(np.int32),
                               kind="stable")
        else:
            order = np.argsort(p.pos, kind="stable")
    for f in ("pos", "rid", "qpos", "is_del", "is_refskip", "is_head",
              "is_tail", "indel"):
        setattr(p, f, getattr(p, f)[order])
    p.order = order
    if p.ins:
        inv = np.empty(p.n_entries, np.int64)
        inv[order] = np.arange(p.n_entries)
        p.ins = {int(inv[k]): v for k, v in p.ins.items()}
    # column boundaries from the sorted key run ends (no hashing)
    bnd = np.flatnonzero(np.diff(p.pos)) + 1
    p.col_pos = p.pos[np.concatenate(([0], bnd))]
    p.col_off = np.concatenate(([0], bnd, [p.n_entries]))
    return p
