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
