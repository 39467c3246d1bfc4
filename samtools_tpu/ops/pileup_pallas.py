"""Pallas TPU kernel for the pileup segment matmul.

Computes  out[t*TILE + p, k] = sum_{b in [lo_t, hi_t)} 1[pos_b == wbeg +
t*TILE + p] * W[b, k]  — the dense pileup contraction of
ops/pileup_engine.py — as a hand-scheduled TPU kernel:

* grid over genomic tiles; per tile the CONTIGUOUS item slice
  (positions + weights) streams HBM -> VMEM in KB-item blocks with
  double-buffered DMA.  The slice bounds come from the host tile plan
  (scalar-prefetched), exploiting coordinate order: no gathers, no
  global sort, and dead blocks are skipped so the static padding B
  costs neither DMA nor FLOPs.
* items are stored lane-major (positions [n/KB, 1, KB] int32, weights
  [n/KB, Kp, KB] int8) so the kernel builds each one-hot block
  [TILE, KB] with a single broadcasted-iota compare — no in-VMEM
  relayouts — and contracts on the MXU:
  bf16 [TILE, KB] x [Kp, KB]^T -> f32 [TILE, Kp].
* products are 0/1 x int8 accumulated in f32 — exact integers (sums
  < 2^24), so results are bit-identical to the host path.

This replaces the XLA one-hot einsum (gather-bound on TPU) and the
reference's per-read cursor walks (/root/reference/bam2depth.c:209,
consensus_pileup.c:81).
"""

from __future__ import annotations

import functools

from .. import device as _device  # noqa: F401  (platform selection)

import numpy as np

TILE = 128   # genomic positions per output tile (MXU edge)
KB = 512     # items per one-hot block (lane-major width)
KP = 32      # weight columns padded to the int8 sublane tile


@functools.lru_cache(maxsize=None)
def _build(n_blk: int, n_tiles: int, interpret: bool,
           TILE: int, KB: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(lo_ref, hi_ref, wbeg_ref, rp_hbm, w_hbm, out_ref,
               rp_s, w_s, sem):
        t = pl.program_id(0)
        nt = pl.num_programs(0)

        def bounds(tt):
            lo = lo_ref[tt]
            blk0 = lo // KB
            return lo, hi_ref[tt], blk0

        def dma(slot, tt):
            # one DMA per array per tile: the tile's blocks are
            # contiguous rows of the block-major item arrays
            _, _, blk0 = bounds(tt)
            return (pltpu.make_async_copy(
                        rp_hbm.at[pl.ds(blk0, n_blk)],
                        rp_s.at[slot], sem.at[slot, 0]),
                    pltpu.make_async_copy(
                        w_hbm.at[pl.ds(blk0, n_blk)],
                        w_s.at[slot], sem.at[slot, 1]))

        def start(slot, tt):
            lo, hi, _ = bounds(tt)

            @pl.when(hi > lo)
            def _():
                a, b = dma(slot, tt)
                a.start()
                b.start()

        # warm-up: first tile's DMA; then prefetch next tile's while
        # computing this one (cross-tile double buffering)
        @pl.when(t == 0)
        def _():
            start(0, 0)

        @pl.when(t + 1 < nt)
        def _():
            start(jax.lax.rem(t + 1, 2), t + 1)

        lo, hi, blk0 = bounds(t)
        startoff = lo - blk0 * KB   # leading items to mask off
        width = hi - blk0 * KB      # items visible from the block start
        nblk_live = jnp.where(hi > lo,
                              jnp.minimum((width + KB - 1) // KB, n_blk),
                              0)
        slot = jax.lax.rem(t, 2)

        @pl.when(hi > lo)
        def _():
            a, b = dma(slot, t)
            a.wait()
            b.wait()

        base = wbeg_ref[0] + t * TILE
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, KB), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)

        def block(kb, acc):
            posrel = rp_s[slot, kb] - base           # [1, KB]
            j = kb * KB + lane
            live = (j >= startoff) & (j < width)
            onehot = ((posrel == sub) & live).astype(jnp.bfloat16)
            wblk = w_s[slot, kb].astype(jnp.bfloat16)  # [KP, KB]
            return acc + jax.lax.dot_general(
                onehot, wblk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(
            0, nblk_live, block, jnp.zeros((TILE, KP), jnp.float32))
        out_ref[:] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,      # lo, hi, wbeg
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # rp [nb, 1, KB] int32
            pl.BlockSpec(memory_space=pl.ANY),  # W  [nb, KP, KB] int8
        ],
        out_specs=pl.BlockSpec((TILE, KP), lambda t, *_: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, n_blk, 1, KB), jnp.int32),
            pltpu.VMEM((2, n_blk, KP, KB), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, KP), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=16 * 1024 * 1024),
    )
    return jax.jit(fn)


def available() -> bool:
    """Pallas path runs compiled on TPU only.  ``SAMTPU_PALLAS=interpret``
    enables the (slow) interpreter on CPU for kernel unit tests;
    ``SAMTPU_PALLAS=0`` disables the kernel even on TPU (falls back to
    the XLA one-hot einsum in pileup_engine)."""
    import os
    env = os.environ.get("SAMTPU_PALLAS", "auto")
    if env == "0":
        return False
    if env == "interpret":
        return True
    try:
        import jax
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def _packer(kb=KB):
    """Jitted device-side packing: row-major items -> block/lane-major
    kernel layout (host-side numpy transposes of hundreds of MB are
    orders of magnitude slower than one XLA transpose)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def pack_w(W):
        n_pad, K = W.shape
        nb = n_pad // kb
        Wp = (jnp.pad(W, ((0, 0), (0, KP - K))) if K < KP else W)
        return Wp.reshape(nb, kb, KP).transpose(0, 2, 1)

    @jax.jit
    def pack_census(lane, qual, min_qual):
        # one-hot(lane) gated by qual >= min_qual, built directly in the
        # [nb, KP, kb] kernel layout (pure elementwise, no transpose)
        nb = lane.shape[0] // kb
        l3 = lane.reshape(nb, 1, kb).astype(jnp.int32)
        k = jax.lax.broadcasted_iota(jnp.int32, (1, KP, 1), 1)
        gate = (qual.reshape(nb, 1, kb) >= min_qual)
        return ((l3 == k) & gate).astype(jnp.int8)

    return pack_w, pack_census


def _pad_rows(a: np.ndarray, n_pad: int, fill=0) -> np.ndarray:
    out = np.empty((n_pad,) + a.shape[1:], a.dtype)
    out[:a.shape[0]] = a
    out[a.shape[0]:] = fill  # only the tail needs the fill value
    return out


def _run(rp3, w3, lo, hi, wbeg, n_tiles, n_blk, interpret,
         tile=TILE, kb=KB):
    fn = _build(n_blk, n_tiles, interpret, tile, kb)
    B_pad = n_blk * kb
    out = None
    cur = lo.copy()
    while True:
        o = fn(cur.astype(np.int32), hi.astype(np.int32),
               np.array([wbeg], np.int32), rp3, w3)
        out = o if out is None else out + o
        # each pass covers [cur, min(hi, block_align(cur) + B_pad))
        cur = np.minimum(np.maximum(cur, (cur // kb) * kb + B_pad), hi)
        if (cur >= hi).all():
            break
    return out


def _shapes(refpos, lo, hi, B, kb=KB):
    lo = np.asarray(lo, np.int64)
    hi = np.asarray(hi, np.int64)
    B_need = int((hi - (lo // kb) * kb).max(initial=1))
    B_pad = kb
    while B_pad < B_need and B_pad < max(B, kb):
        B_pad <<= 1
    # extra B_pad tail so a slice starting at the last real block never
    # overruns the padded arrays
    n_pad = -(-max(refpos.size, 1) // kb) * kb + B_pad
    return lo, hi, B_pad, n_pad


def segment_matmul_pallas(refpos: np.ndarray, W: np.ndarray, lo, hi,
                          wbeg: int, n_tiles: int, B: int,
                          tile: int = TILE, kb: int = KB):
    """Run the kernel.  refpos int[n] (any int dtype), W int8 [n, K<=32],
    lo/hi int32[n_tiles] item ranges, wbeg window start.  Returns f32
    device array [n_tiles*tile, K] whose values are exact integers.
    """
    import jax

    K = W.shape[1]
    if K > KP:
        raise ValueError(f"K={K} exceeds kernel width {KP}")
    interpret = jax.devices()[0].platform != "tpu"
    lo, hi, B_pad, n_pad = _shapes(refpos, lo, hi, B, kb)
    rp = _pad_rows(refpos.astype(np.int32, copy=False), n_pad,
                   np.iinfo(np.int32).min)
    rp3 = rp.reshape(-1, 1, kb)
    pack_w, _ = _packer(kb)
    w3 = pack_w(_pad_rows(np.ascontiguousarray(W, np.int8), n_pad))
    out = _run(rp3, w3, lo, hi, wbeg, n_tiles, B_pad // kb, interpret,
               tile, kb)
    return out[:, :K]


def census_pallas(refpos: np.ndarray, lane: np.ndarray, qual: np.ndarray,
                  min_qual: int, lo, hi, wbeg: int, n_tiles: int, B: int,
                  tile: int = TILE, kb: int = KB):
    """Base x strand census: out[p, lane] counts with qual gating.  The
    one-hot weights are built on device from 1-byte lanes — minimal
    host->device transfer (5 bytes/base)."""
    import jax

    interpret = jax.devices()[0].platform != "tpu"
    lo, hi, B_pad, n_pad = _shapes(refpos, lo, hi, B, kb)
    rp = _pad_rows(refpos.astype(np.int32, copy=False), n_pad,
                   np.iinfo(np.int32).min)
    rp3 = rp.reshape(-1, 1, kb)
    _, pack_census = _packer(kb)
    w3 = pack_census(_pad_rows(lane.astype(np.uint8, copy=False), n_pad),
                     _pad_rows(np.zeros(0, np.uint8) if qual is None
                               else qual.astype(np.uint8, copy=False),
                               n_pad),
                     np.uint8(min_qual))
    return _run(rp3, w3, lo, hi, wbeg, n_tiles, B_pad // kb, interpret,
                tile, kb)
