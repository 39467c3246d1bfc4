"""Device pileup kernels (JAX/XLA): dense scatter-add pileup tensors.

The TPU-native core of the pileup family (SURVEY §7): per-aligned-base
(refpos, base-lane) pairs scatter into a dense [window, 32] count tensor
(16 nt16 codes × 2 strands).  Depth, coverage, consensus and the
genotype-likelihood kernels all consume these tensors.

Multi-chip: reads shard over the mesh ``data`` axis, the genomic window
shards over ``region``; each device scatters its read shard into its
window slice and a psum over ``data`` merges partial counts — the
collective formulation of the reference's span-block thread pool
(/root/reference/bam_consensus.c:2626).
"""

from __future__ import annotations

from functools import partial

from .. import device as _device  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

N_LANES = 32  # 16 base codes x 2 strands


@partial(jax.jit, static_argnames=("window",))
def pileup_counts(refpos, lane, valid, window: int):
    """[window, 32] int32 counts from per-base (refpos, lane) pairs.

    refpos: int32[n] positions relative to the window start (OOB masked)
    lane:   int32[n] = base_code | (is_reverse << 4)
    valid:  bool[n]
    """
    ok = valid & (refpos >= 0) & (refpos < window)
    idx = jnp.where(ok, refpos, 0)
    contrib = ok.astype(jnp.int32)
    counts = jnp.zeros((window, N_LANES), jnp.int32)
    return counts.at[idx, lane].add(contrib, mode="drop")


@partial(jax.jit, static_argnames=("window",))
def pileup_qual_sums(refpos, lane, qual, valid, window: int):
    """[window, 32] int32 summed base qualities per lane (consensus
    scoring input)."""
    ok = valid & (refpos >= 0) & (refpos < window)
    idx = jnp.where(ok, refpos, 0)
    contrib = jnp.where(ok, qual.astype(jnp.int32), 0)
    sums = jnp.zeros((window, N_LANES), jnp.int32)
    return sums.at[idx, lane].add(contrib, mode="drop")


@partial(jax.jit, static_argnames=("tile", "n_tiles"))
def pileup_counts_tiled(posrel, lane, valid, tile: int, n_tiles: int):
    """MXU formulation of the pileup scatter: bases pre-bucketed by
    position tile (host side, input is coordinate-sorted so this is a
    cheap searchsorted), then each tile's counts are a one-hot x one-hot
    matmul contracted over the bucket axis — [B,T] x [B,32] -> [T,32]
    rides the systolic array instead of XLA's serialized scatter.

    posrel: int32[n_tiles, B] position within tile (OOB = invalid)
    lane:   int32[n_tiles, B]
    valid:  bool[n_tiles, B]
    Returns [n_tiles * tile, 32] int32 counts.
    """
    ok = valid & (posrel >= 0) & (posrel < tile)
    pos1h = jax.nn.one_hot(jnp.where(ok, posrel, tile), tile,
                           dtype=jnp.bfloat16, axis=-1)  # OOB -> all-zero
    lane1h = jax.nn.one_hot(lane, N_LANES, dtype=jnp.bfloat16, axis=-1)
    counts = jnp.einsum("nbt,nbl->ntl", pos1h, lane1h,
                        preferred_element_type=jnp.float32)
    return counts.reshape(n_tiles * tile, N_LANES).astype(jnp.int32)


def bucket_bases(refpos: np.ndarray, lane: np.ndarray, window: int,
                 tile: int = 512, max_per_tile: int | None = None):
    """Host-side bucketing of (sorted-ish) per-base arrays into fixed
    [n_tiles, B] blocks for pileup_counts_tiled.  Returns (posrel, lane,
    valid) padded arrays."""
    order = np.argsort(refpos, kind="stable")
    rp = refpos[order]
    ln = lane[order]
    n_tiles = (window + tile - 1) // tile
    edges = np.searchsorted(rp, np.arange(n_tiles + 1) * tile)
    per = np.diff(edges)
    B = int(per.max()) if max_per_tile is None else max_per_tile
    B = max(B, 1)
    posrel = np.full((n_tiles, B), -1, np.int32)
    lanes = np.zeros((n_tiles, B), np.int32)
    valid = np.zeros((n_tiles, B), bool)
    # vectorized fill: index within tile
    within = np.arange(rp.size) - edges[:-1].repeat(per)
    keep = within < B
    trow = np.repeat(np.arange(n_tiles), per)[keep]
    tcol = within[keep]
    posrel[trow, tcol] = (rp[keep] - trow * tile).astype(np.int32)
    lanes[trow, tcol] = ln[keep]
    valid[trow, tcol] = True
    return posrel, lanes, valid


def depth_from_counts(counts):
    """[window] depth from the count tensor."""
    return counts.sum(axis=-1)


def expand_to_device_arrays(batch, sel, wbeg: int, window: int):
    """Host-side: selected reads' M/=/X bases -> (refpos, lane, qual,
    valid) numpy arrays ready for the device kernels."""
    from .cigar import expand_ops
    from ..core import flags as F
    from ..core.batch import ragged_gather_indices

    sub = batch.take(np.asarray(sel, np.int64))
    t = expand_ops(sub)
    m = np.isin(t.op, (F.CMATCH, F.CEQUAL, F.CDIFF))
    lens = t.oplen[m]
    refpos = ragged_gather_indices(t.rpos[m], lens) - wbeg
    qoff_in = ragged_gather_indices(t.qpos[m], lens)
    rid = np.repeat(t.rid[m], lens)
    qoff = sub.seq_off[rid] + qoff_in
    base = sub.seq[qoff].astype(np.int32)
    rev = ((sub.flag[rid] & F.FREVERSE) != 0).astype(np.int32)
    lane = base | (rev << 4)
    qual = sub.qual[qoff].astype(np.int32)
    valid = np.ones(refpos.size, bool)
    return (refpos.astype(np.int32), lane.astype(np.int32), qual, valid)


def make_sharded_pileup(mesh, window_per_shard: int):
    """Returns a jitted fn computing region-sharded pileup counts with
    reads data-sharded: in  refpos/lane/valid sharded over 'data';
    out [n_region * window_per_shard, 32] sharded over 'region'."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    n_region = mesh.shape["region"]
    total_window = n_region * window_per_shard

    def local(refpos, lane, valid):
        # each device holds a read shard and owns one window slice;
        # region index via axis coordinate
        r = jax.lax.axis_index("region")
        lo = r * window_per_shard
        rel = refpos - lo
        counts = pileup_counts(rel, lane, valid, window_per_shard)
        # merge read shards
        return jax.lax.psum(counts, axis_name="data")

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("data"), P("data"), P("data")),
                   out_specs=P("region", None))
    return jax.jit(fn), total_window
