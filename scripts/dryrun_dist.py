"""Two-process jax.distributed dryrun on CPU devices.

Each process contributes 4 virtual CPU devices to a global 8-device
mesh; a region-sharded depth kernel runs over the global mesh and
process 0 checks the result against the single-process host compute.

Launch (the test does this):
  SAMTPU_DIST_COORD=localhost:PORT SAMTPU_DIST_NPROCS=2 \
  SAMTPU_DIST_PROC_ID={0,1} JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
  python scripts/dryrun_dist.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    os.environ.setdefault("SAMTPU_PLATFORM", "cpu")
    from samtools_tpu import device as _dev  # noqa: F401  platform sel
    from samtools_tpu.parallel.dist import (maybe_init_distributed,
                                            process_info)
    assert maybe_init_distributed(), "SAMTPU_DIST_* env not set"
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    pid, nprocs = process_info()
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 global devices, got {len(devs)}"

    # deterministic global histogram: every process builds the same
    # input; records shard over the global mesh; psum merges
    mesh = Mesh(np.asarray(devs).reshape(8), axis_names=("data",))
    n = 1 << 12
    rng = np.random.RandomState(0)
    vals = rng.randint(0, 16, n).astype(np.int32)

    @jax.jit
    def hist(x):
        return jnp.zeros(16, jnp.int32).at[x].add(1)

    sharding = NamedSharding(mesh, P("data"))
    # every process knows the full array; each device takes its slice
    xs = jax.make_array_from_callback(vals.shape, sharding,
                                      lambda idx: vals[idx])
    out = jax.jit(hist, out_shardings=NamedSharding(mesh, P()))(xs)
    got = np.asarray(out.addressable_data(0))
    want = np.bincount(vals, minlength=16).astype(np.int32)
    ok = np.array_equal(got, want)
    print(f"DIST_DRYRUN proc={pid}", "OK" if ok else "MISMATCH",
          f"procs={nprocs}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
