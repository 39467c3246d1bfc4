"""Scaling-efficiency measurement for the sharded device kernels.

Hardware honesty: this box has ONE real TPU chip (multi-chip is not
available), so two complementary measurements stand in for the
BASELINE "N hosts" column until a pod slice exists:

1. virtual-mesh sharding overhead — 8 virtual CPU devices on one host
   share the same cores, so N-way sharded throughput CANNOT exceed
   1-device throughput; what it measures is the partition + collective
   overhead of the sharded program.  A sharded run at >= 80% of the
   unsharded throughput means the collectives/partitioning leave >= 80%
   scaling headroom on real independent chips.
2. 2-process jax.distributed — two worker processes on two real cores,
   each owning ONE CPU device, data-parallel flagstat census with the
   cross-process psum riding the distributed backend.  This is a REAL
   2-worker scaling number (each worker has its own core), the
   single-host form of the multi-host DCN layout.

Writes SCALING_r04.json at the repo root and prints it.

Run:  python scripts/scaling_bench.py            (drives everything)
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_RECORDS = 8 << 20


def _records(n):
    import numpy as np
    rng = np.random.default_rng(0)
    flag = rng.integers(0, 1 << 12, n).astype(np.uint16)
    mapq = rng.integers(0, 61, n).astype(np.uint8)
    tid = rng.integers(-1, 4, n).astype(np.int32)
    mtid = rng.integers(-1, 4, n).astype(np.int32)
    valid = np.ones(n, bool)
    return flag, mapq, tid, mtid, valid


def virtual_mesh_overhead():
    """Part 1: in a subprocess with 8 virtual CPU devices."""
    env = dict(os.environ,
               JAX_PLATFORMS="cpu", SAMTPU_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PYTHONPATH=REPO, SCALING_PART="virtual")
    p = subprocess.run([sys.executable, __file__], env=env,
                       capture_output=True, text=True, cwd=REPO)
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-800:])
    return json.loads(p.stdout.strip().splitlines()[-1])


def _part_virtual():
    import numpy as np
    import jax
    from samtools_tpu.parallel import mesh as M
    from samtools_tpu.ops.flagstat import flagstat_device

    data = _records(N_RECORDS)
    out = {}

    # single device baseline
    one = jax.jit(flagstat_device)
    r = one(*data)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = one(*data)
    jax.block_until_ready(r)
    t1 = (time.perf_counter() - t0) / 3
    out["flagstat_1dev_s"] = t1

    for ndev in (2, 4, 8):
        mesh = M.make_mesh(n_data=ndev, n_region=1,
                           devices=jax.devices()[:ndev])
        sharded = M.shard_batch_arrays(mesh, *data)
        r = M.flagstat_sharded(mesh, *sharded)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(3):
            r = M.flagstat_sharded(mesh, *sharded)
        jax.block_until_ready(r)
        tN = (time.perf_counter() - t0) / 3
        out[f"flagstat_{ndev}dev_s"] = tN
        out[f"flagstat_{ndev}dev_overhead_ratio"] = round(tN / t1, 3)
    print(json.dumps(out))
    return 0


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def two_process_scaling():
    """Part 2: real 2-core scaling via jax.distributed."""
    # single-process baseline (1 device, 1 core pinned)
    env1 = dict(os.environ, JAX_PLATFORMS="cpu", SAMTPU_PLATFORM="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=1",
                PYTHONPATH=REPO, SCALING_PART="solo")
    p = subprocess.run(["taskset", "-c", "0", sys.executable, __file__],
                       env=env1, capture_output=True, text=True,
                       cwd=REPO)
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-800:])
    solo = json.loads(p.stdout.strip().splitlines()[-1])

    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   SAMTPU_PLATFORM="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=1",
                   PYTHONPATH=REPO, SCALING_PART="dist",
                   SAMTPU_DIST_COORD=f"localhost:{port}",
                   SAMTPU_DIST_NPROCS="2",
                   SAMTPU_DIST_PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            ["taskset", "-c", str(pid), sys.executable, __file__],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(o[-800:])
    dist = json.loads(outs[0].strip().splitlines()[-1])
    eff = solo["wall_s"] / (2 * dist["wall_s"]) * 2
    return {
        "solo_1core_s": solo["wall_s"],
        "dist_2proc_s": dist["wall_s"],
        "speedup": round(solo["wall_s"] / dist["wall_s"], 3),
        "efficiency": round(solo["wall_s"] / dist["wall_s"] / 2, 3),
        "records": N_RECORDS,
        "note": "each process pinned to its own core, one CPU device "
                "each; psum over the jax.distributed backend",
    }


def _part_solo():
    import jax
    from samtools_tpu.ops.flagstat import flagstat_device
    data = _records(N_RECORDS)
    f = jax.jit(flagstat_device)
    r = f(*data)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = f(*data)
    jax.block_until_ready(r)
    print(json.dumps({"wall_s": (time.perf_counter() - t0) / 3}))
    return 0


def _part_dist():
    from samtools_tpu.parallel.dist import maybe_init_distributed
    maybe_init_distributed()
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from samtools_tpu.ops.flagstat import flagstat_device
    from functools import partial

    pid = jax.process_index()
    n_local = N_RECORDS // 2
    import numpy as _np
    rng = _np.random.default_rng(pid)
    flag = rng.integers(0, 1 << 12, n_local).astype(_np.uint16)
    mapq = rng.integers(0, 61, n_local).astype(_np.uint8)
    tid = rng.integers(-1, 4, n_local).astype(_np.int32)
    mtid = rng.integers(-1, 4, n_local).astype(_np.int32)
    valid = _np.ones(n_local, bool)

    devs = np.array(jax.devices()).reshape(-1)
    mesh = Mesh(devs, axis_names=("data",))
    sharding = NamedSharding(mesh, P("data"))
    local = jax.local_devices()[0]
    arrs = []
    for a in (flag, mapq, tid, mtid, valid):
        lbuf = jax.device_put(a, local)
        arrs.append(jax.make_array_from_single_device_arrays(
            (N_RECORDS,) + a.shape[1:], sharding, [lbuf]))

    @partial(jax.jit, in_shardings=sharding,
             out_shardings=NamedSharding(mesh, P()))
    def run(flag, mapq, tid, mtid, valid):
        return flagstat_device(flag, mapq, tid, mtid, valid)

    r = run(*arrs)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = run(*arrs)
    jax.block_until_ready(r)
    print(json.dumps({"wall_s": (time.perf_counter() - t0) / 3}))
    return 0


def main():
    part = os.environ.get("SCALING_PART")
    if part == "virtual":
        return _part_virtual()
    if part == "solo":
        return _part_solo()
    if part == "dist":
        return _part_dist()
    out = {
        "records": N_RECORDS,
        "virtual_8dev_mesh": virtual_mesh_overhead(),
        "two_process_distributed": two_process_scaling(),
        "hardware": "2 vCPUs, 1 TPU v5e chip (multi-chip unavailable; "
                    "virtual-mesh numbers measure sharding overhead, "
                    "2-process numbers are real 2-core scaling)",
    }
    with open(os.path.join(REPO, "SCALING_r04.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
