"""Device mesh construction and sharded record-wise reductions.

The reference is single-node pthreads (SURVEY §2.8); the TPU-native
equivalents are:

* ``data`` axis   — read batches sharded across chips (generalizes the
  pthread block sort / hts_tpool decode pools).
* ``region`` axis — genomic position ranges sharded across chips
  (generalizes consensus's span-block pool,
  /root/reference/bam_consensus.c:2626).

Reductions ride XLA collectives: flagstat/stats histograms are a local
einsum + psum; pileup columns are all_gathered in shard order.
"""

from __future__ import annotations

from functools import partial

from .. import device as _device  # noqa: F401  (platform override)

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_region: int = 1,
              devices=None) -> Mesh:
    """A (data, region) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_region
    devs = np.asarray(devices[:n_data * n_region]).reshape(n_data, n_region)
    return Mesh(devs, axis_names=("data", "region"))


def shard_batch_arrays(mesh: Mesh, *arrays, axis: str = "data"):
    """Place 1-D record-wise arrays sharded along the data axis (pads to a
    multiple of the axis size)."""
    n_shards = mesh.shape[axis]
    out = []
    sharding = NamedSharding(mesh, P(axis))
    for a in arrays:
        n = a.shape[0]
        pad = (-n) % n_shards
        if pad:
            a = np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])
        out.append(jax.device_put(a, sharding))
    return out


def flagstat_sharded(mesh: Mesh, flag, mapq, tid, mtid, valid):
    """Multi-chip flagstat: shard records over the data axis; the einsum
    runs per-shard and XLA inserts the psum for the [16,2] result."""
    from ..ops.flagstat import flagstat_device

    @partial(jax.jit,
             in_shardings=NamedSharding(mesh, P("data")),
             out_shardings=NamedSharding(mesh, P()))
    def run(flag, mapq, tid, mtid, valid):
        return flagstat_device(flag, mapq, tid, mtid, valid)

    return run(flag, mapq, tid, mtid, valid)


def flagstat_counts_sharded(mesh: Mesh, batch) -> dict:
    """Tool-level mesh flagstat: a ReadBatch window → the {counter:
    (qc_pass, qc_fail)} dict, records sharded over every mesh device
    (both axes flattened into the data dimension).  This is the CLI face
    of the psum census — `samtools_tpu flagstat` routes windows here
    when SAMTPU_SHARDS > 1 (tests/test_multichip.py asserts N-device
    stdout == 1-device stdout)."""
    from ..ops.flagstat import COUNTERS, flagstat_device

    from ..ops.flagstat import COUNTERS as _C
    if batch.n == 0:
        return {name: (0, 0) for name in _C}
    n_dev = mesh.devices.size
    flat = Mesh(mesh.devices.reshape(-1), ("data",)) \
        if mesh.devices.ndim > 1 or tuple(mesh.axis_names) != ("data",) \
        else mesh
    n = batch.n
    pad = (-n) % max(n_dev, 1)
    size = n + pad

    def padded(a, fill=0):
        out = np.full((size,) + a.shape[1:], fill, a.dtype)
        out[:n] = a[:n]
        return out

    sharding = NamedSharding(flat, P("data"))
    args = [jax.device_put(x, sharding) for x in (
        padded(batch.flag), padded(batch.mapq),
        padded(batch.tid, -1), padded(batch.mtid, -1),
        padded(np.ones(n, bool) if n else np.zeros(0, bool)))]

    @partial(jax.jit,
             in_shardings=sharding,
             out_shardings=NamedSharding(flat, P()))
    def run(flag, mapq, tid, mtid, valid):
        return flagstat_device(flag, mapq, tid, mtid, valid)

    total = np.asarray(run(*args), np.int64)
    return {name: (int(total[i, 0]), int(total[i, 1]))
            for i, name in enumerate(COUNTERS)}


def segment_matmul_sharded(mesh: Mesh, refpos: np.ndarray, W: np.ndarray,
                           plan, chunk: int = 16):
    """Region-sharded pileup contraction: the genomic tile axis is
    distributed over ALL mesh devices (axes flattened); each shard
    contracts its tile slices with the same one-hot einsum the
    single-device engine uses.  Items are replicated — each shard
    touches only its slices via dynamic indexing, so the collective
    cost is one all_gather of the [tiles, K] output.

    This generalizes the reference's span-block pool
    (/root/reference/bam_consensus.c:2626) to a device mesh.  Returns a
    host int32/float32 array [plan.n_tiles * plan.tile, K].
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from ..ops.pileup_engine import padded_tiles

    ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    tile = plan.tile
    n_tiles_pad = padded_tiles(plan.n_tiles, chunk)
    while n_tiles_pad % (ndev * chunk):
        n_tiles_pad *= 2
    lo = np.zeros(n_tiles_pad, np.int32)
    hi = np.zeros(n_tiles_pad, np.int32)
    lo[:plan.n_tiles] = plan.lo
    hi[:plan.n_tiles] = plan.hi
    tids = np.arange(n_tiles_pad, dtype=np.int32)
    out_int = W.dtype != np.float32
    K = W.shape[1]
    n_pad = 1 << int(np.ceil(np.log2(max(refpos.size, 256))))
    rp = np.zeros(n_pad, np.int32)
    rp[:refpos.size] = refpos.astype(np.int32, copy=False)
    Wp = np.zeros((n_pad, K), np.int8 if out_int else np.float32)
    Wp[:W.shape[0]] = W
    B = plan.B
    wbeg = int(plan.wbeg)
    spec = P(mesh.axis_names)
    acc = jnp.int32 if out_int else jnp.float32

    @partial(jax.jit,
             in_shardings=(NamedSharding(mesh, spec),) * 3
             + (NamedSharding(mesh, P()),) * 2,
             out_shardings=NamedSharding(mesh, spec))
    def run_all(tids, lo, hi, rp, Wp):
        @partial(shard_map, mesh=mesh,
                 in_specs=(spec, spec, spec, P(), P()),
                 out_specs=spec)
        def body(tids, lo, hi, rp, Wp):
            n_local = tids.shape[0]
            blocks = tids.reshape(n_local // chunk, chunk)
            lo_b = lo.reshape(n_local // chunk, chunk)
            hi_b = hi.reshape(n_local // chunk, chunk)

            def step(carry, x):
                tid, lo_c, hi_c = x
                j = jnp.arange(B, dtype=jnp.int32)
                idx = lo_c[:, None] + j[None, :]
                live = idx < hi_c[:, None]
                idxc = jnp.clip(idx, 0, rp.shape[0] - 1)
                posrel = rp[idxc] - (wbeg + tid[:, None] * tile)
                ok = live & (posrel >= 0) & (posrel < tile)
                cls = jnp.where(ok, posrel, tile)
                p1h = jax.nn.one_hot(cls, tile, dtype=Wp.dtype, axis=-1)
                out = jnp.einsum("cbt,cbk->ctk", p1h, Wp[idxc],
                                 preferred_element_type=acc)
                return carry, out

            _, outs = jax.lax.scan(step, 0, (blocks, lo_b, hi_b))
            return outs.reshape(n_local * tile, K)

        return body(tids, lo, hi, rp, Wp)

    out = run_all(tids, lo, hi, rp, Wp)
    total = None
    # multi-pass for overflow slices, advancing lo (rare; plan.passes)
    if plan.passes > 1:
        total = np.asarray(out)
        cur_lo = lo
        for _ in range(plan.passes - 1):
            cur_lo = np.minimum(cur_lo + B, hi).astype(np.int32)
            total = total + np.asarray(run_all(tids, cur_lo, hi, rp, Wp))
        return total[:plan.n_tiles * tile]
    return np.asarray(out)[:plan.n_tiles * tile]


def depth_window_sharded(mesh: Mesh, batch, sel: np.ndarray, wbeg: int,
                         wend: int, min_qual: int, count_del: bool,
                         clips: np.ndarray | None = None) -> np.ndarray:
    """Multi-device depth: same contract as ops.depth.depth_window /
    pileup_engine.depth_window_device, with the tile axis sharded over
    the mesh.  Used by the N-chip == 1-chip golden tests."""
    from ..ops import pileup_engine as pe

    L = wend - wbeg
    if sel.size == 0:
        return np.zeros(L, np.int32)

    def sharded_segmm(pos, w, plan, chunk=16):
        return segment_matmul_sharded(mesh, pos, w, plan, chunk)

    return pe.depth_window_device(batch, sel, wbeg, wend, min_qual,
                                  count_del, clips,
                                  segmm_fn=sharded_segmm)
