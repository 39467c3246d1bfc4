"""Device BAQ: the banded glocal pair-HMM batched over reads.

The reference computes BAQ per read in scalar C (htslib sam_prob_realn,
consumed at /root/reference/bam_plcmd.c:451) — the dominant cost of
default mpileup.  Here the whole DP runs as [batch, band] vector ops on
the TPU VPU: a `lax.scan` over query rows carrying the three HMM states
as [B, W] lanes (W = 2*bw+1 band slots), with the within-row D-state
recurrences expressed as small Toeplitz matmuls (the serial scan
`D[j] = c[j] + m8*D[j-1]` is `c @ T` with T[t,j] = m8^(j-t) lower
triangular — an MXU-shaped contraction instead of a W-step loop).

Banded-coordinate quirks of the reference implementation (set_u index
clamping, the row-l_query j=0 exclusion, the one-slot zero padding read
by the forward I-transition) are replicated exactly — see the comments
at each site.  Arithmetic is float32: bit-parity with the f64 host HMM
(ops/baq.py, native samtpu_baq_batch) is recovered by detecting
rounding-boundary-adjacent posteriors on device and recomputing those
few reads on the host (`uncertain` mask), GATK-PairHMM-style dynamic
precision.

Generalized (round 5) to messy reads: the kernel takes a per-read ref
-window length (`lref` int32[B], padded to a static `l_ref_max`), a
per-base expected-diagonal row (`cdeltaT`, from the cigar walk: the
htslib state check `(state>>2) == x - xb + (i - y)` in the per-M-op
loop), per-read boundary probabilities bM/bI (they depend on l_ref),
and per-base smoothing-segment ids (one segment per M op — extended
-BAQ smoothing resets at indels exactly as the per-op host loop).
Soft-clipped and small-indel reads (|l_ref - l_query| <= bw and
M-extent diff <= bw, so htslib's inner band stays at bw) therefore run
on device; remaining host routes: N/B cigar ops, >8 cigar ops, big
indels, contig-edge windows, stored BQ/ZQ tags, qual[0]==0xFF
sentinels, f32 rounding-risky posteriors.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from .. import device as _device  # noqa: F401  (platform selection)

PD = 0.001
PE = 0.1
EI = 0.25
EM = 1.0 / 3.0

# margin (in phred units) below which an f32 posterior is considered at
# risk of rounding differently than the f64 host HMM.  The decode sums
# the leak (non-best posterior mass) directly instead of computing
# 1 - max/sum — the subtraction cancels catastrophically in f32 once
# the posterior is confident, which is what made wider margins still
# leak mismatches.  With direct summation the f32 value error is
# ~1e-4 phred, so a 3e-3 margin has a 30x cushion.
PHRED_MARGIN = 3e-3
# relative margin for best-state ties in the posterior argmax
TIE_MARGIN = 3e-4


def _decode_row(fM_i, bM_i, fI_i, bI_i, i, crow, qrow, B: int,
                W: int, bw: int):
    """Posterior decode of one query row: best state, phred of 1-p,
    risk flags.  The leak (competitor mass) is summed directly — never
    computed as zsum - max — so the f32 value tracks the f64 host HMM
    to ~1e-4 phred even for confident bases.  A rounding-boundary base
    is flagged risky only when a +-1 flip could change the OUTPUT,
    i.e. when floor(val) <= q+1 (beyond that the qual cap absorbs it).
    All inputs are band-major [W, B]."""
    import jax.numpy as jnp
    # interleave M/I per band slot: rows [2j]=M_j, [2j+1]=I_j
    z2 = jnp.stack([fM_i * bM_i, fI_i * bI_i], axis=1).reshape(2 * W, B)
    best = jnp.argmax(z2, axis=0)
    # argmax row == max value; masking it out with a compare is the
    # vectorized equivalent of the scatter z2.at[best, b].set(0) (TPU
    # scatters/gathers serialize on the scalar core) — bit-identical
    mx = z2.max(0)
    rows2 = jnp.arange(2 * W, dtype=best.dtype)[:, None]
    z2z = jnp.where(rows2 == best[None, :], jnp.float32(0.0), z2)
    leak = z2z.sum(0)
    mx2 = z2z.max(0)
    tot = mx + leak
    val = -4.343 * (jnp.log(jnp.maximum(leak, 1e-38))
                    - jnp.log(jnp.maximum(tot, 1e-38))) + 0.499
    kq = jnp.where(leak > 0, val.astype(jnp.int32), 100)
    bq = jnp.where(kq > 100, 99, kq)
    frac = val - jnp.floor(val)
    matters = jnp.floor(val) <= qrow.astype(jnp.float32) + 1
    risky = ((jnp.minimum(frac, 1 - frac) < PHRED_MARGIN) & matters) | \
            (mx2 > (1 - TIE_MARGIN) * mx)
    # rounding flips on non-M bases (soft-clip / insertion positions,
    # crow at the sentinel) cannot change any output: their quals are
    # never printed (pileup text prints M-base quals only; insertion
    # strings print letters) and never censused — don't route the
    # whole read to the host for them
    risky = risky & (crow < (1 << 19))
    kbest = best // 2 + i - 1 - bw
    isI = (best % 2).astype(jnp.int32)
    good = (isI == 0) & (kbest == crow + (i - 1)) & (mx > 0)
    return bq, good, risky


def _toeplitz(W: int, decay: float, lower: bool, dtype):
    """T[t, j] = decay^(j-t) for j>=t (lower) / decay^(t-j) for t>=j."""
    import jax.numpy as jnp
    t = np.arange(W)
    d = t[None, :] - t[:, None] if lower else t[:, None] - t[None, :]
    M = np.where(d >= 0, np.power(decay, np.maximum(d, 0)), 0.0)
    return jnp.asarray(M, dtype)


@partial(
    __import__("jax").jit,
    static_argnames=("l_query", "l_ref_max", "bw"))
def _probaln_batch(ref_win, query, qual, cdeltaT, lref, bMv, bIv,
                   l_query: int, l_ref_max: int, bw: int):
    """Banded glocal HMM for B reads of uniform query length but
    per-read ref-window length.

    ref_win: uint8[B, l_ref_max] 0-4 codes (junk beyond lref[b] is
    masked to ambiguous inside); query: uint8[B, l_query]; qual:
    uint8[B, l_query]; cdeltaT: int32[l_query, B] per-base expected
    diagonal (state k-1 at base i-1 must equal cdeltaT[i-1] + (i-1);
    large sentinel on non-M bases); lref: int32[B] per-read window
    length (htslib inner band must stay `bw`: callers guarantee
    |lref - l_query| <= bw); bMv/bIv: f32[B] boundary probabilities
    (1-PD)/lref, PD/lref — shipped precomputed in f64->f32 so the
    clean-read path stays bit-identical to the former scalar kernel.

    Returns (bq int32[B, l_query], good bool[B, l_query] state-check,
    risky bool[B]).
    """
    import jax
    import jax.numpy as jnp

    f32 = jnp.float32
    B = ref_win.shape[0]
    W = 2 * bw + 1

    # mask ref bases beyond each read's window as ambiguous (code 15)
    ref_win = jnp.where(
        jnp.arange(l_ref_max, dtype=jnp.int32)[None, :] < lref[:, None],
        ref_win, jnp.uint8(15))

    # Band-on-sublanes layout: every DP array is [W, B] so the batch
    # axis rides the 128-wide vector lanes; [B, W] would pad the
    # 15-wide band axis to 128 lanes and waste 8/9 of the VPU.
    queryT = query.T                                       # [LQ, B]
    qlnT = jnp.power(f32(10.0), -qual.T.astype(f32) / 10.0)  # [LQ, B]
    sM = 1.0 / (2 * l_query + 2)
    m0 = (1 - 2 * PD) * (1 - sM)
    m1 = m2 = PD * (1 - sM)
    m3 = (1 - PE) * (1 - sM)
    m4 = PE * (1 - sM)
    m6 = 1 - PE
    m8 = PE
    bM = bMv[None, :]                                  # [1, B]
    bI = bIv[None, :]
    lrow = lref[None, :]                               # [1, B]

    TLt = _toeplitz(W, m8, lower=True, dtype=f32).T   # forward D chain
    TUt = _toeplitz(W, m8, lower=False, dtype=f32).T  # backward D chain

    # ref transposed + padded so a W-row slice starting at row i yields
    # ref[i+j-bw-1] for j in [0, W) (code 15 > 3 == ambiguous; every
    # out-of-band j is masked before use)
    refp = jnp.pad(ref_win.T, ((bw + 1, bw + 1), (0, 0)),
                   constant_values=15)

    js = jnp.arange(W, dtype=jnp.int32)

    def band_mask(i):
        # valid k = i + j - bw in [max(1, i-bw), min(lref_b, i+bw)]
        k = (i + js - bw)[:, None]
        return ((k >= jnp.maximum(1, i - bw))
                & (k <= jnp.minimum(lrow, i + bw)))

    def emis(i, qrow, qlrow):
        """e(ref[k-1], query[i-1]) for band j (forward row i): [W, B]."""
        rslice = jax.lax.dynamic_slice(refp, (i, 0), (W, B))
        q = qrow[None, :]
        ql = qlrow[None, :]
        amb = (rslice > 3) | (q > 3)
        return jnp.where(amb, f32(1.0),
                         jnp.where(rslice == q, 1.0 - ql, ql * EM))

    # ---------------- forward ----------------
    def fwd_row1():
        i = 1
        e = emis(i, queryT[0], qlnT[0])
        # C row 1: k in [1, min(l_ref, bw+1)] -> j in [bw, min(2bw, ...)]
        k = (i + js - bw)[:, None]
        mask = (k >= 1) & (k <= jnp.minimum(lrow, bw + 1))
        fM = jnp.where(mask, e * bM, 0.0)
        fI = jnp.where(mask, EI * bI * jnp.ones_like(e), 0.0)
        s = (fM + fI).sum(0)
        return fM / s[None, :], fI / s[None, :], jnp.zeros_like(fM), s

    fM1, fI1, fD1, s1 = fwd_row1()

    def fwd_step(carry, xs):
        pM, pI, pD = carry
        i, qrow, qlrow = xs
        e = emis(i, qrow, qlrow)
        mask = band_mask(i)
        # v11 -> prev j ; v10 -> prev j+1 (one zero pad slot, as in the
        # C array's trailing padding)
        pMs = jnp.pad(pM, ((0, 1), (0, 0)))[1:]
        pIs = jnp.pad(pI, ((0, 1), (0, 0)))[1:]
        fM = e * (m0 * pM + m3 * pI + m6 * pD)
        fI = EI * (m1 * pMs + m4 * pIs)
        fM = jnp.where(mask, fM, 0.0)
        fI = jnp.where(mask, fI, 0.0)
        # D chain: D[j] = m2*M[j-1] + m8*D[j-1]; the j=0 slot reads the
        # set_u-clamped alias of its own M (C reads fi[0*3] which holds
        # this row's just-written fM at j=0).  HIGHEST precision: the
        # default f32 matmul feeds the MXU bf16 inputs (~1e-3
        # relative), which leaks into the posterior decode.
        Mshift = jnp.concatenate([fM[:1], fM[:-1]], axis=0)
        fD = jnp.matmul(TLt, m2 * Mshift,
                        precision=jax.lax.Precision.HIGHEST)
        fD = jnp.where(mask, fD, 0.0)
        s = (fM + fI + fD).sum(0)
        inv = (1.0 / s)[None, :]
        fM, fI, fD = fM * inv, fI * inv, fD * inv
        return (fM, fI, fD), (fM, fI, s)

    rows = jnp.arange(2, l_query + 1, dtype=jnp.int32)
    (_, _, _), (fMs, fIs, ss) = jax.lax.scan(
        fwd_step, (fM1, fI1, fD1),
        (rows, queryT[1:], qlnT[1:]))
    # stack row 1 in front: fMs [LQ, W, B]
    fMs = jnp.concatenate([fM1[None], fMs], axis=0)
    fIs = jnp.concatenate([fI1[None], fIs], axis=0)
    s_all = jnp.concatenate([s1[None], ss], axis=0)     # [LQ, B]

    # s[l_query+1]: sum over k with the u-bounds quirk (j in [1, 2bw])
    i = l_query
    k = (i + js - bw)[:, None]
    mask_end = ((k >= 1) & (k <= lrow)
                & ((js >= 1) & (js <= 2 * bw))[:, None])
    s_end = ((fMs[-1] * sM + fIs[-1] * sM) * mask_end).sum(0)

    # ---------------- backward + decode ----------------
    bM_init = jnp.where(mask_end,
                        sM / s_all[-1][None, :] / s_end[None, :], 0.0)
    bI_init = bM_init

    def bwd_step(carry, xs):
        nM, nI, nD = carry      # b rows at i+1, already scaled by 1/s[i+1]
        i, fM_i, fI_i, s_i = xs
        # emission of row i+1 at ref[k] (0-based), zero where k >= lref_b
        rslice = jax.lax.dynamic_slice(refp, (i + 1, 0), (W, B))
        q1 = queryT[jnp.minimum(i, l_query - 1)]  # query[i] (0-based)
        ql1 = qlnT[jnp.minimum(i, l_query - 1)]
        amb = (rslice > 3) | (q1[None, :] > 3)
        e1 = jnp.where(amb, f32(1.0),
                       jnp.where(rslice == q1[None, :],
                                 1.0 - ql1[None, :], ql1[None, :] * EM))
        k = (i + js - bw)[:, None]
        e1 = jnp.where(k >= lrow, 0.0, e1)
        ee = e1 * nM                        # e * b_{i+1}[v11]
        # v10+1: next-row I at j-1, set_u clamped to j=0 at the left edge
        nIs = jnp.concatenate([nI[:1], nI[:-1]], axis=0)
        bD = jnp.matmul(TUt, ee * m6,       # D[j] = ee*m6 + m8*D[j+1]
                        precision=jax.lax.Precision.HIGHEST)
        bDs = jnp.pad(bD, ((0, 1), (0, 0)))[1:]      # D[j+1], zero pad
        bMr = ee * m0 + EI * m1 * nIs + m2 * bDs
        bIr = ee * m3 + EI * m4 * nIs
        mask = band_mask(i)
        bMr = jnp.where(mask, bMr, 0.0)
        bIr = jnp.where(mask, bIr, 0.0)
        bD = jnp.where(mask, bD, 0.0)
        inv = (1.0 / s_i)[None, :]
        bMr, bIr, bD = bMr * inv, bIr * inv, bD * inv

        # decode row i with stored f and fresh b
        qrow = qual.T[jnp.minimum(i - 1, l_query - 1)]  # qual[i-1]
        crow = cdeltaT[jnp.minimum(i - 1, l_query - 1)]
        bq, good, risky = _decode_row(fM_i, bMr, fI_i, bIr, i, crow,
                                      qrow, B, W, bw)
        return (bMr, bIr, bD), (bq, good, risky)

    ridx = jnp.arange(l_query - 1, 0, -1, dtype=jnp.int32)
    (_, _, _), (bqs, goods, riskys) = jax.lax.scan(
        bwd_step, (bM_init, bI_init, jnp.zeros_like(bM_init)),
        (ridx, fMs[:-1][::-1], fIs[:-1][::-1], s_all[:-1][::-1]))

    # decode the last row directly (b at l_query is the init row)
    bq_l, good_l, risky_l = _decode_row(fMs[-1], bM_init, fIs[-1],
                                        bI_init, l_query,
                                        cdeltaT[l_query - 1],
                                        qual[:, l_query - 1], B, W, bw)

    # assemble [B, LQ]: rows scanned were l_query-1 .. 1
    bq_all = jnp.concatenate([bqs[::-1], bq_l[None]], axis=0).T
    good_all = jnp.concatenate([goods[::-1], good_l[None]], axis=0).T
    risky_any = jnp.concatenate([riskys[::-1], risky_l[None]],
                                axis=0).T.any(-1)
    return bq_all, good_all, risky_any


@partial(__import__("jax").jit, static_argnames=("l_query",))
def _finalize(bq, good, qual, seg, l_query: int):
    """State-check zeroing, qual cap, extended smoothing per M segment,
    and the applied-qual arithmetic — all vectorized [B, LQ].

    ``seg`` int32[B, LQ]: cigar-op ordinal of each base, monotone
    non-decreasing along the read; negative = non-M base.  Smoothing
    (min of prefix/suffix running max) must not cross M-op boundaries
    (baq_one applies it per op); the segmented cummax rides the
    classic offset trick: adding K*seg (K > any bqv) before the scan
    makes earlier segments unable to dominate later ones.  Non-M bases
    take min(q, raw posterior) exactly as the host final loop (their
    bqv was never state-checked or smoothed)."""
    import jax.numpy as jnp
    import jax
    q = qual.astype(jnp.int32)
    is_m = seg >= 0
    segc = jnp.maximum(seg, 0)
    bqv = jnp.where(good & is_m, jnp.minimum(bq, q), 0)
    K = 256
    left = jax.lax.cummax(bqv + K * segc, axis=1) - K * segc
    rseg = K * (64 - segc)
    rght = jax.lax.cummax((bqv + rseg)[:, ::-1], axis=1)[:, ::-1] - rseg
    bqv = jnp.minimum(left, rght)
    out_m = q - jnp.where(q <= bqv, 0, q - bqv)   # = min(q, smoothed)
    out_x = jnp.minimum(q, bq)                    # non-M: raw posterior
    return jnp.where(is_m, out_m, out_x).astype(jnp.uint8)


_FUSED_APPLY = None


def _get_fused_apply():
    """One jitted launch per chunk: buf unpack (pos | nt16 seq | qual) +
    ref-window gather + banded HMM + finalize.  Eager per-chunk jnp ops
    each cost a device dispatch round trip — ruinous on high-latency
    links — so everything between the single h2d and the batched d2h
    must live in one executable (the design of mpileup_device's
    chunk_step, reused here for the plain BAQ-apply path)."""
    global _FUSED_APPLY
    if _FUSED_APPLY is not None:
        return _FUSED_APPLY
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("l_query", "l_ref", "bw"))
    def fused(ref_dev, buf, l_query: int, l_ref: int, bw: int):
        pb = buf[:, :4].astype(jnp.int32)
        pc = pb[:, 0] | (pb[:, 1] << 8) | (pb[:, 2] << 16) \
            | (pb[:, 3] << 24)
        nt16 = buf[:, 4:4 + l_query]
        sq = jnp.where(nt16 == 1, 0,
                       jnp.where(nt16 == 2, 1,
                                 jnp.where(nt16 == 4, 2,
                                           jnp.where(nt16 == 8, 3, 4)))
                       ).astype(jnp.uint8)
        qq = buf[:, 4 + l_query:4 + 2 * l_query]
        idx = jnp.minimum(pc, ref_dev.shape[0] - 1)[:, None] \
            + jnp.arange(l_ref)[None, :]
        ref_win = ref_dev[jnp.clip(idx, 0, ref_dev.shape[0] - 1)]
        B = pc.shape[0]
        cdeltaT = jnp.zeros((l_query, B), jnp.int32)
        lref = jnp.full((B,), l_ref, jnp.int32)
        bMv = jnp.full((B,), np.float32((1 - PD) / l_ref), jnp.float32)
        bIv = jnp.full((B,), np.float32(PD / l_ref), jnp.float32)
        bq, good, risky = _probaln_batch(ref_win, sq, qq, cdeltaT, lref,
                                         bMv, bIv, l_query, l_ref, bw)
        seg = jnp.zeros((B, l_query), jnp.int32)
        appq = _finalize(bq, good, qq, seg, l_query)
        return appq, risky

    _FUSED_APPLY = fused
    return fused


def baq_apply_device_nt16(ref_int: np.ndarray, pos: np.ndarray,
                          seq_nt16: np.ndarray, qual: np.ndarray,
                          l_query: int, bw: int = 7,
                          ref_dev=None, chunk: int = 1 << 16):
    """Device BAQ over a uniform batch of all-M reads given raw nt16
    codes ([B, l_query] uint8).  One packed h2d + one fused launch per
    chunk; ONE d2h for the whole batch.  Returns (applied uint8[B,L],
    risky bool[B])."""
    import jax
    import jax.numpy as jnp
    l_ref = l_query + bw // 2
    B = pos.shape[0]
    if ref_dev is None:
        ref_dev = jax.device_put(jnp.asarray(ref_int, jnp.uint8))
    fused = _get_fused_apply()
    outs, risks = [], []
    for lo in range(0, B, chunk):
        hi = min(lo + chunk, B)
        n = hi - lo
        npad = chunk if n < chunk and B > chunk else n
        buf = np.zeros((npad, 4 + 2 * l_query), np.uint8)
        buf[:n, :4] = pos[lo:hi].astype("<i4").view(np.uint8) \
            .reshape(n, 4)
        buf[:n, 4:4 + l_query] = seq_nt16[lo:hi]
        buf[:n, 4 + l_query:] = qual[lo:hi]
        appq, rk = fused(ref_dev, jax.device_put(buf), l_query, l_ref,
                         bw)
        outs.append(appq[:n] if n < npad else appq)
        risks.append(rk[:n] if n < npad else rk)
    allq = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    allr = jnp.concatenate(risks) if len(risks) > 1 else risks[0]
    out, risky = jax.device_get((allq, allr))
    return np.asarray(out), np.asarray(risky)


