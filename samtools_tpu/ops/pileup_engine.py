"""TPU pileup engine: MXU-tiled segment matmul over genomic tiles.

The core device kernel of the pileup family (depth, mpileup, consensus,
coverage, bedcov).  The reference's per-read cursor walks
(/root/reference/bam2depth.c:209 add_depth, consensus_pileup.c:81
get_next_base, htslib bam_plp) become one dense tensor contraction:

    out[p, k] = sum_b  1[refpos_b == p] * W[b, k]

i.e. a one-hot(position) x weight matmul.  XLA's scatter-add serializes
on TPU; a matmul rides the 128x128 systolic array at full rate.  The
trick that makes the one-hot affordable is *genomic tiling*:

* The genome window is cut into tiles of T positions (T = 128, one MXU
  edge).  For tile t only positions [tT,(t+1)T) matter, so the one-hot
  is [B, T], not [B, window].
* Because the input is coordinate-sorted and bases are emitted in read
  order, every tile's contributing items live in ONE CONTIGUOUS SLICE
  [lo_t, hi_t) of the flat item arrays.  ``tile_plan`` computes those
  slices host-side with two searchsorteds (cummax of read ends / read
  starts) — no global sort, no bucketing shuffle.
* On device, a block of tiles gathers its (padded) slices into [C, B]
  arrays and contracts ``int8 one-hot [C,B,T] x int8 weights [C,B,K]
  -> int32 [C,T,K]`` on the MXU.  Products are 0/1 * small ints,
  accumulated in int32 — bit-exact integer counts, so every consumer
  keeps byte-parity with the host (and reference) outputs.

Weights W generalize the kernel: ones -> depth; +-1 at interval
endpoints -> difference arrays (cumsum gives depth in O(2 ops/read));
one_hot(lane) -> the [window, 32] base x strand census; qual-gated /
qual-weighted columns -> consensus and mpileup inputs.

Multi-chip: the window axis shards over the mesh 'region' axis (each
shard runs the same kernel on its tile range) and item shards psum —
see parallel/mesh.py.
"""

from __future__ import annotations

from functools import partial

from .. import device as _device  # noqa: F401  (platform selection)

import numpy as np

TILE = 128          # genomic positions per tile = MXU edge
LANE_K = 32         # 16 nt16 codes x 2 strands


# --------------------------------------------------------------------- plan
class TilePlan:
    """Host-side plan: per-tile contiguous item slices.

    Attributes
    ----------
    lo, hi : int32[n_tiles] — item index range per tile
    n_tiles : int           — ceil(window_len / TILE)
    B : int                 — padded max items per tile (power-of-2 bucket)
    passes : int            — number of engine passes needed (max slice
                              length may exceed B; extra passes advance lo)
    """

    __slots__ = ("lo", "hi", "n_tiles", "B", "passes", "wbeg", "wlen",
                 "tile")

    def __init__(self, lo, hi, n_tiles, B, passes, wbeg, wlen, tile=TILE):
        self.lo, self.hi = lo, hi
        self.n_tiles, self.B, self.passes = n_tiles, B, passes
        self.wbeg, self.wlen = wbeg, wlen
        self.tile = tile


def _bucket(n: int, lo: int = 256, cap: int = 1 << 14) -> int:
    """Round up to a power of two in [lo, cap] (compile-cache friendly)."""
    b = lo
    while b < n and b < cap:
        b <<= 1
    return b


def pick_tile(wlen: int) -> int:
    """Tile size by window length: large windows amortize the per-tile
    fixed cost (DMA issue + grid step); small windows keep compile
    shapes small."""
    if wlen >= 1 << 21:
        return 1024
    if wlen >= 1 << 17:
        return 512
    return TILE


def tile_plan(read_pos: np.ndarray, read_end: np.ndarray,
              item_off: np.ndarray, wbeg: int, wlen: int,
              max_b: int = 1 << 14, tile: int | None = None) -> TilePlan:
    """Build per-tile item slices for a window [wbeg, wbeg+wlen).

    read_pos/read_end: per-read reference start / exclusive end, reads in
    coordinate order (read_pos non-decreasing).  item_off: int64[n_reads+1]
    offsets of each read's items in the flat item arrays.  All of a read's
    items must carry positions within [read_pos, read_end] (items outside
    are allowed if they self-cancel, e.g. +1/-1 at the same position).
    """
    if tile is None:
        tile = pick_tile(wlen)
    n_tiles = max(1, (wlen + tile - 1) // tile)
    starts = wbeg + np.arange(n_tiles, dtype=np.int64) * tile
    if read_pos.size == 0:
        lo = np.zeros(n_tiles, np.int32)
        return TilePlan(lo, lo.copy(), n_tiles, 256, 1, wbeg, wlen, tile)
    cummax_end = np.maximum.accumulate(read_end)
    # first read that can still touch the tile (end >= tile start)
    lo_read = np.searchsorted(cummax_end, starts, side="left")
    # first read starting at/after the tile end
    hi_read = np.searchsorted(read_pos, starts + tile, side="left")
    hi_read = np.maximum(hi_read, lo_read)
    lo = item_off[lo_read].astype(np.int64)
    hi = item_off[hi_read].astype(np.int64)
    width = int((hi - lo).max(initial=0))
    B = _bucket(max(width, 1), cap=max_b)
    passes = max(1, -(-width // B))
    return TilePlan(lo.astype(np.int32), hi.astype(np.int32),
                    n_tiles, B, passes, wbeg, wlen, tile)


# ------------------------------------------------------------------- kernel
def _segmm_jit():
    """Build (once) the jitted segment-matmul over tile blocks."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit,
             static_argnames=("B", "chunk", "n_tiles_pad", "out_int",
                              "tile"))
    def segmm(refpos, W, lo, hi, wbeg, B: int, chunk: int,
              n_tiles_pad: int, out_int: bool, tile: int = TILE):
        """out[t*TILE + p, k] = sum over items in slice [lo_t, hi_t) with
        refpos == wbeg + t*TILE + p of W[item, k].

        refpos: int32[n]; W: int8|f32 [n, K]; lo/hi: int32[n_tiles_pad]
        (padded with empty slices); wbeg: int32 scalar.
        Returns [n_tiles_pad * TILE, K] int32 (out_int) or f32.
        """
        n = refpos.shape[0]
        K = W.shape[1]
        n_chunks = n_tiles_pad // chunk
        tids = jnp.arange(n_tiles_pad, dtype=jnp.int32).reshape(n_chunks,
                                                                chunk)

        def body(carry, tid):
            # tid: int32[chunk] tile ids of this block
            lo_c = lo[tid]                               # [C]
            hi_c = hi[tid]
            j = jnp.arange(B, dtype=jnp.int32)
            idx = lo_c[:, None] + j[None, :]             # [C, B]
            live = idx < hi_c[:, None]
            idxc = jnp.clip(idx, 0, max(n - 1, 0))
            rp = refpos[idxc]                            # [C, B]
            posrel = rp - (wbeg + tid[:, None] * tile)
            ok = live & (posrel >= 0) & (posrel < tile)
            # OOB -> class `tile` -> all-zero one-hot row
            cls = jnp.where(ok, posrel, tile)
            p1h = jax.nn.one_hot(cls, tile, dtype=W.dtype, axis=-1)
            Wg = W[idxc]                                 # [C, B, K]
            acc = jnp.float32 if not out_int else jnp.int32
            out = jnp.einsum("cbt,cbk->ctk", p1h, Wg,
                             preferred_element_type=acc)
            return carry, out

        _, outs = jax.lax.scan(body, 0, tids)
        out = outs.reshape(n_tiles_pad * tile, K)
        return out

    return segmm


_SEGMM = None


def _get_segmm():
    global _SEGMM
    if _SEGMM is None:
        _SEGMM = _segmm_jit()
    return _SEGMM


def padded_tiles(n_tiles: int, chunk: int = 16) -> int:
    """Pad a tile count to a compile-cache-stable shape: the next power
    of two that is a multiple of chunk (bounds recompiles to
    O(log window) distinct shapes)."""
    n = max(n_tiles, chunk)
    p = chunk
    while p < n:
        p <<= 1
    return p


def segment_matmul(refpos: np.ndarray, W: np.ndarray, plan: TilePlan,
                   chunk: int = 16):
    """Run the engine: returns a device array [wlen_padded, K] where rows
    [0, plan.wlen) are valid.  Integer weights accumulate in int32
    (bit-exact); float weights in f32.

    Handles overflow tiles (slice wider than plan.B) with extra passes.
    All shapes (item count, tile count, B) are bucketed to powers of two
    so repeated tool invocations reuse the jit cache.
    """
    from ..core import metrics
    with metrics.stage("device.segment_matmul", refpos.size, "events"):
        return _segment_matmul(refpos, W, plan, chunk)


def _segment_matmul(refpos: np.ndarray, W: np.ndarray, plan: TilePlan,
                    chunk: int = 16):
    import jax.numpy as jnp

    segmm = _get_segmm()
    n_tiles_pad = padded_tiles(plan.n_tiles, chunk)
    lo = np.zeros(n_tiles_pad, np.int32)
    hi = np.zeros(n_tiles_pad, np.int32)
    lo[:plan.n_tiles] = plan.lo
    hi[:plan.n_tiles] = plan.hi
    out_int = W.dtype != np.float32
    K = W.shape[1]
    if refpos.size == 0:
        dt = jnp.int32 if out_int else jnp.float32
        return jnp.zeros((n_tiles_pad * plan.tile, K), dt)
    if out_int:
        from . import pileup_pallas as pp
        if pp.available():
            out = pp.segment_matmul_pallas(
                refpos, np.ascontiguousarray(W, np.int8), lo, hi,
                plan.wbeg, n_tiles_pad, plan.B, tile=plan.tile)
            return out.astype(jnp.int32)
    # pad item arrays to a power-of-two length; padded rows sit beyond
    # every hi bound so the kernel's `live` mask never reads them
    n_pad = 1 << int(np.ceil(np.log2(max(refpos.size, 256))))
    rp = np.zeros(n_pad, np.int32)
    rp[:refpos.size] = refpos.astype(np.int32, copy=False)
    Wp = np.zeros((n_pad, K), np.int8 if out_int else np.float32)
    Wp[:W.shape[0]] = W
    total = None
    cur_lo = lo
    for _ in range(plan.passes):
        out = segmm(rp, Wp, cur_lo, hi, np.int32(plan.wbeg),
                    B=plan.B, chunk=chunk, n_tiles_pad=n_tiles_pad,
                    out_int=out_int, tile=plan.tile)
        total = out if total is None else total + out
        if plan.passes > 1:
            cur_lo = np.minimum(cur_lo + plan.B, hi).astype(np.int32)
    return total


# ----------------------------------------------------------- depth kernels
def _depth_cumsum_jit():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(diff_col, direct_col):
        d = (jnp.cumsum(diff_col[:, 0]) + direct_col[:, 0]).astype(
            jnp.int32)
        return d, d.max()

    return f


_NARROW = {}


def _fetch_narrow(depth, mx: int, L: int) -> np.ndarray:
    """Device->host transfer with the narrowest lossless dtype — the
    host link (PCIe, or ~20 MB/s on the tunnelled dev box) is the depth
    path's bottleneck, and 30x depth columns fit in uint8/int16."""
    import jax
    import jax.numpy as jnp
    if mx < 256:
        dt = jnp.uint8
    elif mx < (1 << 15):
        dt = jnp.int16
    else:
        return np.asarray(depth[:L])
    fn = _NARROW.get(dt)
    if fn is None:
        fn = _NARROW[dt] = jax.jit(
            lambda x, d=dt: x.astype(d))
    return np.asarray(fn(depth)[:L]).astype(np.int32)


_DEPTH_CS = None


def depth_window_device(batch, sel: np.ndarray, wbeg: int, wend: int,
                        min_qual: int, count_del: bool,
                        clips: np.ndarray | None = None,
                        segmm_fn=None) -> np.ndarray:
    """Device implementation of ops.depth.depth_window — same contract,
    same integers, computed on the TPU via the segment-matmul engine.

    Interval contributions (M/=/X spans when min_qual==0, and -J
    deletions) become +-1 difference events; per-base quality-gated
    contributions (min_qual>0) become 0/1 weights; depth =
    cumsum(diff) + direct, all on device.
    """
    global _DEPTH_CS
    from ..core import flags as F
    from ..core.batch import ragged_gather_indices
    from .cigar import expand_ops

    L = wend - wbeg
    if sel.size == 0:
        return np.zeros(L, np.int32)
    # gather only the columns this kernel reads (cigar; qual when gated)
    ragged = ("cigar", "qual") if min_qual else ("cigar",)
    sub = batch.take(sel, ragged=ragged)
    t = expand_ops(sub)
    clip = (clips[sel] if clips is not None else np.zeros(sel.size, np.int64))

    # ---- interval events (diff array) --------------------------------
    ev_pos_parts, ev_w_parts, ev_rid_parts = [], [], []
    m = np.isin(t.op, (F.CMATCH, F.CEQUAL, F.CDIFF))
    base_rid = None
    base_pos = None
    base_w = None
    if min_qual == 0:
        if m.any():
            rs = t.rpos[m]
            re = rs + t.oplen[m]
            opclip = clip[t.rid[m]]
            s = np.clip(np.maximum(rs, opclip), wbeg, wend)
            e = np.clip(np.maximum(re, opclip), wbeg, wend)
            # drop empty intervals NOW: keeps every surviving event inside
            # its read's [pos, end] span, the invariant tile_plan needs
            nz = s < e
            s, e, rm = s[nz], e[nz], t.rid[m][nz]
            # interleave (+start, -end) per op: rid stays nondecreasing
            # (op order == read order), so the per-read grouping below
            # needs no sort at all on this path
            k = s.size
            ev_pos = np.empty(2 * k, s.dtype)
            ev_pos[0::2] = s
            ev_pos[1::2] = e
            ev_w = np.empty(2 * k, np.int8)
            ev_w[0::2] = 1
            ev_w[1::2] = -1
            ev_rid = np.empty(2 * k, rm.dtype)
            ev_rid[0::2] = rm
            ev_rid[1::2] = rm
            ev_pos_parts.append(ev_pos)
            ev_w_parts.append(ev_w)
            ev_rid_parts.append(ev_rid)
    else:
        if m.any():
            lens = t.oplen[m]
            refpos = ragged_gather_indices(t.rpos[m], lens)
            qoff = ragged_gather_indices(t.qpos[m], lens)
            rid = np.repeat(t.rid[m], lens)
            qual = sub.qual[sub.seq_off[rid] + qoff]
            ok = (qual >= min_qual) & (refpos >= clip[rid])
            base_pos = refpos.astype(np.int64)
            base_w = ok.astype(np.int8)[:, None]
            base_rid = rid

    if count_del:
        d = t.op == F.CDEL
        if d.any():
            rs = t.rpos[d]
            re = rs + t.oplen[d]
            opclip = clip[t.rid[d]]
            qpos = t.qpos[d]
            rid = t.rid[d]
            ok = np.ones(rs.size, bool)
            if min_qual:
                lq = sub.l_qseq[rid]
                has_q = qpos < lq
                qv = np.zeros(rs.size, np.int64)
                qv[has_q] = sub.qual[sub.seq_off[rid[has_q]]
                                     + qpos[has_q]].astype(np.int64)
                ok = ~has_q | (qv >= min_qual)
            s = np.clip(np.maximum(rs, opclip), wbeg, wend)[ok]
            e = np.clip(np.maximum(re, opclip), wbeg, wend)[ok]
            rm = rid[ok]
            nz = s < e
            s, e, rm = s[nz], e[nz], rm[nz]
            ev_pos_parts += [s, e]
            ev_w_parts += [np.ones(s.size, np.int8),
                           -np.ones(e.size, np.int8)]
            ev_rid_parts += [rm, rm]

    rpos_reads = sub.pos
    rend_reads = sub.end_pos()
    # events clipped into [wbeg, wend]; widen per-read bounds accordingly
    rpos_b = np.minimum(np.maximum(rpos_reads, wbeg), wend)
    rend_b = np.minimum(np.maximum(rend_reads, wbeg), wend) + 1

    tile = pick_tile(L)

    contract = segmm_fn or segment_matmul

    def run(pos, w, rid):
        # group events per read; skip the sort when rid is already
        # nondecreasing (true for the interleaved diff events)
        if rid.size and (np.diff(rid) < 0).any():
            order = np.argsort(rid, kind="stable")
            pos, w, rid = pos[order], w[order], rid[order]
        cnt = np.bincount(rid, minlength=sub.n)
        off = np.zeros(sub.n + 1, np.int64)
        np.cumsum(cnt, out=off[1:])
        plan = tile_plan(rpos_b, rend_b, off, wbeg, L, tile=tile)
        return contract(pos, w, plan)

    import jax.numpy as jnp
    n_tiles_pad_len = padded_tiles(max(1, (L + tile - 1) // tile)) * tile

    if ev_pos_parts:
        ev_pos = np.concatenate(ev_pos_parts)
        ev_w = np.concatenate(ev_w_parts)[:, None]
        ev_rid = np.concatenate(ev_rid_parts)
        diff_col = run(ev_pos, ev_w, ev_rid)
    else:
        diff_col = jnp.zeros((n_tiles_pad_len, 1), jnp.int32)
    if base_pos is not None:
        direct_col = run(base_pos, base_w, base_rid)
    else:
        direct_col = jnp.zeros((n_tiles_pad_len, 1), jnp.int32)

    if _DEPTH_CS is None:
        _DEPTH_CS = _depth_cumsum_jit()
    # pad the shorter column (shapes can differ if one side was empty)
    h = max(diff_col.shape[0], direct_col.shape[0])
    if diff_col.shape[0] < h:
        diff_col = jnp.pad(diff_col, ((0, h - diff_col.shape[0]), (0, 0)))
    if direct_col.shape[0] < h:
        direct_col = jnp.pad(direct_col,
                             ((0, h - direct_col.shape[0]), (0, 0)))
    depth, dmax = _DEPTH_CS(diff_col, direct_col)
    return _fetch_narrow(depth, int(dmax), L)


# ------------------------------------------------------- coverage kernel
_COV_REDUCE = None


def _cov_reduce_jit():
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("sub", "min_depth"))
    def f(census, sub: int, min_depth: int):
        """census [rows, 3] (okq count, okq qual sum, entry count) ->
        [rows//sub, 3] per-subwindow sums over pos_ok positions
        (coverage.c:589's covered/meandepth/meanbaseq accumulators)."""
        c0 = census[:, 0]
        c2 = census[:, 2]
        ok = (c2 > 0) & (c0 > 0) & (c0 >= min_depth)
        gated = jnp.where(ok[:, None], census, 0)
        gated = gated.at[:, 2].set(ok.astype(jnp.int32))
        return gated.reshape(-1, sub, 3).sum(axis=1)

    return f


def _coverage_census_part(batch, sel: np.ndarray, wbeg: int, wend: int,
                          min_baseq: int):
    """One file's [window, 3] coverage census on device (okq count,
    okq qual sum, entry count incl. del/refskip)."""
    from ..core import flags as F
    from ..core.batch import ragged_gather_indices
    from .cigar import expand_ops

    L = wend - wbeg
    sb = batch.take(np.asarray(sel, np.int64), ragged=("cigar", "qual"))
    t = expand_ops(sb)
    emit = np.isin(t.op, (F.CMATCH, F.CEQUAL, F.CDIFF, F.CDEL,
                          F.CREF_SKIP))
    e_ops = np.nonzero(emit)[0]
    e_len = t.oplen[e_ops]
    pos = ragged_gather_indices(t.rpos[e_ops], e_len)
    is_m = np.isin(t.op[e_ops], (F.CMATCH, F.CEQUAL, F.CDIFF))
    is_m_e = np.repeat(is_m, e_len)
    rid = np.repeat(t.rid[e_ops], e_len)
    qpos = ragged_gather_indices(t.qpos[e_ops], e_len)
    W = np.zeros((pos.size, 3), np.int8)
    W[:, 2] = 1
    qm = sb.qual[sb.seq_off[rid[is_m_e]] + qpos[is_m_e]]
    okq = qm >= min_baseq
    W[is_m_e, 0] = okq
    W[is_m_e, 1] = np.where(okq, np.minimum(qm, 127), 0).astype(np.int8)
    inw = (pos >= wbeg) & (pos < wend)
    W[~inw] = 0
    per_read = np.bincount(t.rid[e_ops], weights=e_len,
                           minlength=sb.n).astype(np.int64)
    off = np.zeros(sb.n + 1, np.int64)
    np.cumsum(per_read, out=off[1:])
    plan = tile_plan(np.minimum(np.maximum(sb.pos, wbeg), wend),
                     np.minimum(np.maximum(sb.end_pos(), wbeg), wend) + 1,
                     off, wbeg, L)
    return segment_matmul(np.clip(pos, wbeg, wend - 1), W, plan)


def coverage_window_device(parts, wbeg: int, wend: int, min_baseq: int,
                           min_depth: int, sub: int = 1 << 16
                           ) -> np.ndarray:
    """Device coverage statistics for one window across input files:
    returns int64 (n_cov_bases, summed_cov, summed_baseq) — the
    per-position accumulators of coverage.c:589, summed across files on
    device and gated by min_depth at full resolution, then reduced in
    64k-position subwindows so only O(window/64k) scalars cross the
    link.  Integer accumulation in int32 is bit-exact vs the host path.

    parts: iterable of (batch, sel) pairs (one per input file).
    """
    global _COV_REDUCE
    import jax.numpy as jnp
    out = None
    for batch, sel in parts:
        if sel.size == 0:
            continue
        part = _coverage_census_part(batch, sel, wbeg, wend, min_baseq)
        out = part if out is None else _pad_to_match(out, part)
    if out is None:
        return np.zeros(3, np.int64)
    if _COV_REDUCE is None:
        _COV_REDUCE = _cov_reduce_jit()
    rows = out.shape[0]
    if rows % sub:
        out = jnp.pad(out, ((0, sub - rows % sub), (0, 0)))
    red = np.asarray(_COV_REDUCE(out, sub, min_depth)).astype(np.int64)
    tot = red.sum(axis=0)
    # red columns: [0] okq-count over ok positions -> summed_cov,
    # [1] qual sums -> summed_baseq, [2] pos_ok indicator -> covbases
    return np.array([tot[2], tot[0], tot[1]], np.int64)


def _pad_to_match(a, b):
    import jax.numpy as jnp
    h = max(a.shape[0], b.shape[0])
    if a.shape[0] < h:
        a = jnp.pad(a, ((0, h - a.shape[0]), (0, 0)))
    if b.shape[0] < h:
        b = jnp.pad(b, ((0, h - b.shape[0]), (0, 0)))
    return a + b


# -------------------------------------------------------- base-lane census
def base_lane_weights(lane: np.ndarray, qual: np.ndarray | None = None,
                      min_qual: int = 0) -> np.ndarray:
    """int8 weights W[b, 32] = one_hot(lane), optionally qual-gated."""
    n = lane.size
    W = np.zeros((n, LANE_K), np.int8)
    ok = np.ones(n, bool)
    if qual is not None and min_qual > 0:
        ok = qual >= min_qual
    W[np.arange(n)[ok], lane[ok]] = 1
    return W


def pileup_census(batch, sel: np.ndarray, wbeg: int, wend: int,
                  min_qual: int = 0):
    """[wlen, 32] int32 base x strand counts on device for the selected
    reads — the tensor depth/consensus/coverage consume.  Returns a numpy
    array (valid rows only)."""
    from ..core import flags as F
    from .pileup_device import expand_to_device_arrays

    # wbeg=0 keeps refpos absolute; the plan's wbeg handles the offset
    refpos, lane, qual, _ = expand_to_device_arrays(batch, sel, 0, 1 << 62)
    sub = batch.take(np.asarray(sel, np.int64))
    # per-read item offsets: bases are emitted in read order by
    # expand_to_device_arrays (M/=/X ops in op order)
    from .cigar import expand_ops
    t = expand_ops(sub)
    m = np.isin(t.op, (F.CMATCH, F.CEQUAL, F.CDIFF))
    per_read = np.bincount(t.rid[m], weights=t.oplen[m],
                           minlength=sub.n).astype(np.int64)
    off = np.zeros(sub.n + 1, np.int64)
    np.cumsum(per_read, out=off[1:])
    plan = tile_plan(sub.pos, sub.end_pos(), off, wbeg, wend - wbeg)
    from . import pileup_pallas as pp
    if pp.available():
        n_tiles_pad = padded_tiles(plan.n_tiles)
        lo = np.zeros(n_tiles_pad, np.int32)
        hi = np.zeros(n_tiles_pad, np.int32)
        lo[:plan.n_tiles] = plan.lo
        hi[:plan.n_tiles] = plan.hi
        out = pp.census_pallas(refpos, lane.astype(np.uint8), qual, min_qual,
                               lo, hi, wbeg, n_tiles_pad, plan.B,
                               tile=plan.tile)
    else:
        W = base_lane_weights(lane, qual, min_qual)
        out = segment_matmul(refpos, W, plan)
    return np.asarray(out[:wend - wbeg]).astype(np.int32)
