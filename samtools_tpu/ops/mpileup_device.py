"""Streamed mpileup-core pipeline with device BAQ + device census.

The reference's default mpileup spends almost all its time in per-read
BAQ (sam_prob_realn at /root/reference/bam_plcmd.c:451) followed by the
per-column accumulation loop (:607).  This module runs that pipeline
TPU-first over a streaming BAM:

  BamStream window -> columnar decode (C++) -> ship (pos, seq codes,
  quals) -> device banded pair-HMM BAQ (ops/baq_device) -> device
  census: one-hot(base) x qual-gate segment matmul accumulated into a
  resident [window, 6] table -> ONE device->host fetch at the end.

BAQ-adjusted quals never leave the device (the d2h link is the scarcest
resource); only the per-read `risky` bits and the final census do.
Reads the device path cannot take bit-exactly (non-uniform shape,
contig-edge windows, f32 rounding-boundary posteriors) are recomputed
on the host through the native f64 HMM (samtpu_baq_batch), keeping the
total byte-identical to the single-core reference pipeline
(native samtpu_bench_baq_census).
"""

from __future__ import annotations

import numpy as np

from ..core import flags as F
from .pileup_engine import padded_tiles, tile_plan

CENSUS_K = 6      # A,C,G,T,other counts + qual-sum lane
DEFAULT_EXCL = F.FUNMAP | F.FSECONDARY | F.FQCFAIL | F.FDUP

# nt16 -> 0-4 code (A,C,G,T,other)
NT16_TO4 = np.array([4, 0, 1, 4, 2, 4, 4, 4, 3, 4, 4, 4, 4, 4, 4, 4],
                    np.uint8)


def _census_jit():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from .pileup_engine import _get_segmm

    @partial(jax.jit, static_argnames=("l_query", "n_tiles_pad", "B",
                                       "tile", "chunk", "passes"))
    def census_add(census, pos, seq4, appq, ok_read, lo, hi, wbeg,
                   l_query: int, n_tiles_pad: int, B: int, tile: int,
                   chunk: int, min_baseq: int, passes: int):
        """census[p, 0:5] += base counts, census[p, 5] += capped quals,
        for the in-plan events of non-risky reads.  ``passes`` covers
        tiles whose item slice exceeds the B bucket (deep columns)."""
        refpos = (pos[:, None] + jnp.arange(l_query,
                                            dtype=jnp.int32)[None, :])
        refpos = refpos.reshape(-1)
        gate = (appq >= min_baseq) & ok_read[:, None]
        g = gate.reshape(-1)
        code = seq4.reshape(-1)
        onehot = jax.nn.one_hot(code, 5, dtype=jnp.int8)
        W = jnp.concatenate(
            [onehot, appq.reshape(-1, 1).astype(jnp.int8)], axis=1)
        W = jnp.where(g[:, None], W, 0)
        segmm = _get_segmm()
        total = None
        cur_lo = lo
        for _ in range(passes):
            out = segmm(refpos.astype(jnp.int32), W, cur_lo, hi,
                        wbeg.astype(jnp.int32), B=B, chunk=chunk,
                        n_tiles_pad=n_tiles_pad, out_int=True, tile=tile)
            total = out if total is None else total + out
            cur_lo = jnp.minimum(cur_lo + B, hi)
        return jax.lax.dynamic_update_slice(
            census, jax.lax.dynamic_slice(
                census, (wbeg, 0),
                (n_tiles_pad * tile, CENSUS_K)) + total, (wbeg, 0))

    return census_add


_CENSUS_ADD = None


def _get_census_add():
    global _CENSUS_ADD
    if _CENSUS_ADD is None:
        _CENSUS_ADD = _census_jit()
    return _CENSUS_ADD


def _chunk_jit():
    """One fused launch per chunk: ref-window gather + BAQ HMM +
    finalize + census accumulate.  The host<->device tunnel charges
    per dispatch, so the whole chunk must be a single executable."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from . import baq_device

    @partial(jax.jit, static_argnames=(
        "l_query", "l_ref", "bw", "n_tiles_pad", "B", "tile", "chunk",
        "passes", "min_baseq", "baq_flag"))
    def chunk_step(census, ref_dev, buf, n_live, lo, hi, wbeg,
                   l_query: int, l_ref: int, bw: int, n_tiles_pad: int,
                   B: int, tile: int, chunk: int, passes: int,
                   min_baseq: int, baq_flag: int):
        # buf: uint8[C, 4 + 2*l_query] = LE int32 pos | seq nt16 | qual
        # (one h2d transfer per chunk instead of three; the nt16->0-4
        # code mapping runs on device)
        pb = buf[:, :4].astype(jnp.int32)
        pc = pb[:, 0] | (pb[:, 1] << 8) | (pb[:, 2] << 16) \
            | (pb[:, 3] << 24)
        nt16 = buf[:, 4:4 + l_query]
        # nt16 -> 0-4 codes arithmetically (a table gather lowers to
        # slow scalar loads on TPU)
        sq = jnp.where(nt16 == 1, 0,
                       jnp.where(nt16 == 2, 1,
                                 jnp.where(nt16 == 4, 2,
                                           jnp.where(nt16 == 8, 3, 4)))
                       ).astype(jnp.uint8)
        qq = buf[:, 4 + l_query:4 + 2 * l_query]
        idx = jnp.minimum(pc, ref_dev.shape[0] - 1)[:, None] \
            + jnp.arange(l_ref)[None, :]
        ref_win = ref_dev[jnp.clip(idx, 0, ref_dev.shape[0] - 1)]
        diag = jnp.zeros(pc.shape[0], jnp.int32)
        bq, good, risky = baq_device._probaln_batch(
            ref_win, sq, qq, diag, l_query, l_ref, bw)
        appq = baq_device._finalize(bq, good, qq, l_query)
        if not baq_flag:
            appq = qq
            risky = jnp.zeros(pc.shape[0], bool)
        pad_ok = jnp.arange(pc.shape[0]) < n_live
        ok = (~risky) & pad_ok
        census = _get_census_add()(
            census, pc.astype(jnp.int32), sq, appq, ok, lo, hi,
            wbeg, l_query, n_tiles_pad, B, tile, chunk, min_baseq,
            passes)
        return census, risky

    return chunk_step


_CHUNK_STEP = None


def _get_chunk_step():
    global _CHUNK_STEP
    if _CHUNK_STEP is None:
        _CHUNK_STEP = _chunk_jit()
    return _CHUNK_STEP


def _host_census(census, qsum, pos, cigar, cigar_off, seq4, qual, seq_off,
                 ref_int, min_baseq, baq_flag):
    """Host path: native f64 BAQ + vectorized census accumulate for the
    reads the device path routes away.  Arbitrary cigars supported."""
    from ..io import native
    from ..core.batch import ragged_gather_indices
    if pos.size == 0:
        return
    if baq_flag:
        newq, _ = native.baq_batch(pos, cigar, cigar_off, seq4_to_nt16(
            seq4), qual, seq_off, ref_int, flag=baq_flag, threads=2)
    else:
        newq = qual
    # expand M/=/X ops to (refpos, qpos) pairs
    ops = (cigar & 0xF).astype(np.int64)
    lens = (cigar >> 4).astype(np.int64)
    n = pos.size
    rid_op = np.repeat(np.arange(cigar_off.size - 1),
                       np.diff(cigar_off))
    # per-op running ref/query positions
    consumes_r = np.array(F.CIGAR_CONSUMES_REF, np.int64)[ops]
    consumes_q = np.array(F.CIGAR_CONSUMES_QUERY, np.int64)[ops]
    rl = lens * consumes_r
    ql = lens * consumes_q
    cr = np.concatenate([[0], np.cumsum(rl)[:-1]])
    cq = np.concatenate([[0], np.cumsum(ql)[:-1]])
    # rebase per read
    base_r = cr[cigar_off[:-1]]
    base_q = cq[cigar_off[:-1]]
    op_rpos = pos[rid_op] + (cr - base_r[rid_op])
    op_qpos = cq - base_q[rid_op]
    m = (ops == F.CMATCH) | (ops == F.CEQUAL) | (ops == F.CDIFF)
    mlens = lens[m]
    rp = ragged_gather_indices(op_rpos[m], mlens)
    qp = ragged_gather_indices(op_qpos[m], mlens)
    rid = np.repeat(rid_op[m], mlens)
    qoff = seq_off[rid] + qp
    q = newq[qoff]
    ok = (q >= min_baseq) & (rp >= 0) & (rp < qsum.size)
    rp, qoff, q = rp[ok], qoff[ok], q[ok]
    code = seq4[qoff].astype(np.int64)
    np.add.at(census, (rp, code), 1)
    np.add.at(qsum, rp, q.astype(np.int64))
    del n


def census_checksum(census: np.ndarray, qsum: np.ndarray):
    """Host-side order-independent weighted checksum, two uint32 lanes;
    identical math to DeviceCensusPipeline.finish_checksum (wrapping
    mod 2^32)."""
    c = np.ascontiguousarray(census, np.int64).astype(np.uint32).ravel()
    q = np.ascontiguousarray(qsum, np.int64).astype(np.uint32).ravel()
    v = np.concatenate([c, q])
    idx = np.arange(v.size, dtype=np.uint32)
    with np.errstate(over="ignore"):
        w1 = idx * np.uint32(2654435761)
        w2 = (idx + np.uint32(0x9E3779B9)) * np.uint32(40503)
        s1 = int((v * w1).sum(dtype=np.uint64) & 0xFFFFFFFF)
        s2 = int((v * w2).sum(dtype=np.uint64) & 0xFFFFFFFF)
    return s1, s2


_NT16_OF4 = np.array([1, 2, 4, 8, 15], np.uint8)


def seq4_to_nt16(seq4: np.ndarray) -> np.ndarray:
    return _NT16_OF4[seq4]


class DeviceCensusPipeline:
    """Accumulates the BAQ'd base census for one contig window on the
    device across streamed batches."""

    def __init__(self, ref_int: np.ndarray, wlen: int, min_baseq: int = 13,
                 baq_flag: int = 3, tile: int = 256, bw: int = 7,
                 l_query: int = 100, chunk_reads: int = 1 << 16):
        import jax
        import jax.numpy as jnp
        self.ref_int = np.ascontiguousarray(ref_int, np.uint8)
        self.wlen = wlen
        self.min_baseq = min_baseq
        self.baq_flag = baq_flag
        self.tile = tile
        self.bw = bw
        self.l_query = l_query
        self.chunk = chunk_reads
        self.n_tiles = (wlen + tile - 1) // tile
        self.total_tiles = max(padded_tiles(self.n_tiles), 512)
        pad_len = self.total_tiles * tile
        self.census_dev = jnp.zeros((pad_len, CENSUS_K), jnp.int32)
        self.ref_dev = jax.device_put(jnp.asarray(self.ref_int, jnp.uint8))
        self.host_census = np.zeros((wlen, 5), np.int64)
        self.host_qsum = np.zeros(wlen, np.int64)
        self.n_reads = 0
        self.n_host_reads = 0
        self.n_risky = 0
        self._pending = None  # deferred risky masks of the last batch

    # ------------------------------------------------------------------
    def add_batch(self, batch, excl_flags: int = DEFAULT_EXCL,
                  min_mapq: int = 0, want_tid: int = 0):
        import jax
        import jax.numpy as jnp
        from . import baq_device

        b = batch
        keep = ((b.tid == want_tid)
                & ((b.flag.astype(np.int64) & excl_flags) == 0)
                & (b.mapq >= min_mapq))
        sel = np.nonzero(keep)[0]
        if sel.size == 0:
            return
        self.n_reads += sel.size
        LQ = self.l_query
        lens = b.seq_off[sel + 1] - b.seq_off[sel]
        simple = ((b.cigar_off[sel + 1] - b.cigar_off[sel]) == 1)
        opv = np.zeros(sel.size, np.uint32)
        opv[simple] = b.cigar[b.cigar_off[sel[simple]]]
        uniform = (simple & (opv == np.uint32((LQ << 4)))
                   & (lens == LQ)
                   & (b.pos[sel] >= 0)
                   & (b.pos[sel] + LQ + self.bw // 2 <= self.ref_int.size))
        # qual[0]==0xFF sentinel -> host
        q0 = b.qual[b.seq_off[sel]]
        uniform &= q0 != 0xFF

        dsel = sel[uniform]
        hsel = sel[~uniform]
        if hsel.size:
            self._host_reads(b, hsel)
        if dsel.size == 0:
            return

        pos = b.pos[dsel].astype(np.int64)
        # contiguous uniform selections (the common case) reshape the
        # flat seq/qual arrays zero-copy; nt16->code mapping happens on
        # device inside the fused chunk kernel
        off0 = b.seq_off[dsel]
        if dsel.size and int(off0[-1]) - int(off0[0]) \
                == (dsel.size - 1) * LQ \
                and int(b.seq_off[dsel[-1] + 1]) - int(off0[-1]) == LQ:
            s0 = int(off0[0])
            seqm = b.seq[s0:s0 + dsel.size * LQ].reshape(-1, LQ)
            qual = b.qual[s0:s0 + dsel.size * LQ].reshape(-1, LQ)
        else:
            idx2 = off0[:, None] + np.arange(LQ)[None, :]
            seqm = b.seq[idx2]
            qual = b.qual[idx2]

        chunk_step = _get_chunk_step()
        l_ref = LQ + self.bw // 2
        C = self.chunk
        risky_parts = []  # (device risky mask, chunk lo, n)
        for lo in range(0, dsel.size, C):
            hi = min(lo + C, dsel.size)
            n = hi - lo
            npad = C
            pc = np.zeros(npad, np.int64)
            pc[:n] = pos[lo:hi]
            pc[n:] = self.wlen  # park padding out of every tile
            buf = np.zeros((npad, 4 + 2 * LQ), np.uint8)
            buf[:, :4] = pc.astype("<i4").view(np.uint8).reshape(npad, 4)
            buf[:n, 4:4 + LQ] = seqm[lo:hi]
            buf[:n, 4 + LQ:] = qual[lo:hi]
            plan = self._plan(pc[:n], n, npad)
            # one fused device launch + one h2d transfer per chunk; the
            # risky mask stays device-resident (fetching per chunk
            # costs a tunnel round trip), host recompute happens once
            # per batch below
            self.census_dev, risky = chunk_step(
                self.census_dev, self.ref_dev, jax.device_put(buf),
                np.int32(n), plan[0], plan[1], jnp.int32(plan[2]),
                LQ, l_ref, self.bw, plan[3], plan[4], self.tile, 16,
                plan[5], self.min_baseq, 1 if self.baq_flag else 0)
            risky_parts.append((risky, lo, n))
        # drain the PREVIOUS batch's risky masks now: the fetch blocks
        # until that batch's device work finishes, which overlaps with
        # this batch's freshly-dispatched chunks
        prev = self._pending
        self._pending = (risky_parts, b, dsel, C) if risky_parts else None
        if prev is not None:
            self._drain(prev)

    def _drain(self, pending):
        import jax.numpy as jnp
        risky_parts, b, dsel, C = pending
        allr = np.asarray(jnp.concatenate(
            [r for r, _, _ in risky_parts]))
        gidx = []
        for (_, lo, n), off in zip(risky_parts,
                                   range(0, len(risky_parts) * C, C)):
            rk = allr[off:off + n]
            if rk.any():
                gidx.append(dsel[lo:lo + n][rk])
        if gidx:
            gsel = np.concatenate(gidx)
            self.n_risky += gsel.size
            self._host_reads(b, gsel)

    def _plan(self, pos_n: np.ndarray, n: int, npad: int):
        """Tile slices for one chunk: items are read-major, 100/read."""
        tile = self.tile
        if n == 0:
            t0 = 0
            span_tiles = 1
        else:
            t0 = int(pos_n[0]) // tile
            t1 = (int(pos_n[-1]) + self.l_query + tile - 1) // tile
            span_tiles = max(1, t1 - t0)
        # fixed plan width keeps one compiled census kernel across
        # chunks (512-tile window unless a chunk spans wider), and the
        # window is clamped inside the padded census buffer so the
        # device-side dynamic_update_slice never clips
        ntp = min(max(512, padded_tiles(span_tiles)), self.total_tiles)
        t0 = min(t0, self.total_tiles - ntp)
        item_off = np.arange(npad + 1, dtype=np.int64) * self.l_query
        rpos = np.full(npad, (self.total_tiles + self.bw + 2) * tile,
                       np.int64)
        rpos[:n] = pos_n
        rend = rpos + self.l_query
        plan = tile_plan(rpos, rend + 1, item_off, t0 * tile,
                         ntp * tile, tile=tile)
        lo = np.zeros(ntp, np.int32)
        hi = np.zeros(ntp, np.int32)
        lo[:plan.n_tiles] = plan.lo
        hi[:plan.n_tiles] = plan.hi
        # fixed item bucket: the natural power-of-two bucket flips with
        # per-chunk depth variation, recompiling the fused kernel
        # mid-run; one pinned B (+ extra passes for deep tiles) keeps a
        # single compiled executable
        B = 1 << 14
        width = int((hi - lo).max(initial=1))
        passes = max(1, -(-width // B))
        return lo, hi, t0 * tile, ntp, B, passes

    def _host_reads(self, b, gsel):
        self.n_host_reads += gsel.size
        sub_pos = b.pos[gsel].astype(np.int64)
        # gather ragged cigar/seq/qual for the subset
        from ..core.batch import ragged_gather_indices
        clens = b.cigar_off[gsel + 1] - b.cigar_off[gsel]
        coff = np.zeros(gsel.size + 1, np.int64)
        np.cumsum(clens, out=coff[1:])
        cig = b.cigar[ragged_gather_indices(b.cigar_off[gsel], clens)]
        slens = b.seq_off[gsel + 1] - b.seq_off[gsel]
        soff = np.zeros(gsel.size + 1, np.int64)
        np.cumsum(slens, out=soff[1:])
        gidx = ragged_gather_indices(b.seq_off[gsel], slens)
        seq4 = NT16_TO4[b.seq[gidx]]
        qual = b.qual[gidx]
        _host_census(self.host_census, self.host_qsum, sub_pos, cig, coff,
                     seq4, qual, soff, self.ref_int, self.min_baseq,
                     self.baq_flag)

    # ------------------------------------------------------------------
    def finish_checksum(self):
        """Two-lane weighted checksum of (census, qsum), fetched as TWO
        scalars instead of the full arrays — the d2h-minimal way to
        assert equality with a host-computed census when the link is
        degraded.  The checksum is linear, so the device part and the
        host-fallback part combine by addition mod 2^32."""
        import jax
        import jax.numpy as jnp
        if self._pending is not None:
            prev, self._pending = self._pending, None
            self._drain(prev)
        wlen = self.wlen

        @jax.jit
        def _ck(c):
            v = c[:wlen, :5].astype(jnp.uint32).ravel()
            q = c[:wlen, 5].astype(jnp.uint32)
            idx = jnp.arange(v.size + q.size, dtype=jnp.uint32)
            w1 = idx * jnp.uint32(2654435761)
            w2 = (idx + jnp.uint32(0x9E3779B9)) * jnp.uint32(40503)
            allv = jnp.concatenate([v, q])
            s1 = jnp.sum(allv * w1, dtype=jnp.uint32)
            s2 = jnp.sum(allv * w2, dtype=jnp.uint32)
            return s1, s2

        s1, s2 = jax.device_get(_ck(self.census_dev))
        h1, h2 = census_checksum(self.host_census, self.host_qsum)
        return (int(s1) + h1) & 0xFFFFFFFF, (int(s2) + h2) & 0xFFFFFFFF

    # ------------------------------------------------------------------
    def finish(self):
        """One d2h fetch; merge host contributions.  Returns
        (census int64[wlen,5], qsum int64[wlen]).  The fetch narrows to
        the smallest lossless dtype per column group first — the
        device->host link is the pipeline's scarcest resource."""
        import jax
        import jax.numpy as jnp
        if self._pending is not None:
            prev, self._pending = self._pending, None
            self._drain(prev)

        @jax.jit
        def _split(c):
            counts = c[:, :5]
            qsum = c[:, 5]
            return counts.max(), qsum.max(), counts, qsum

        cmax, qmax, counts, qsum = _split(self.census_dev)
        cmax, qmax = int(cmax), int(qmax)
        cdt = (jnp.uint8 if cmax < 256 else
               jnp.uint16 if cmax < 65536 else jnp.int32)
        qdt = jnp.uint16 if qmax < 65536 else jnp.int32
        counts = np.asarray(jax.jit(
            lambda x, d=cdt: x.astype(d))(counts))[:self.wlen]
        qsum = np.asarray(jax.jit(
            lambda x, d=qdt: x.astype(d))(qsum))[:self.wlen]
        census = counts.astype(np.int64) + self.host_census
        qsum = qsum.astype(np.int64) + self.host_qsum
        return census, qsum
