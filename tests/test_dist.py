"""Multi-process jax.distributed dryrun + sharded CLI execution."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_distributed_dryrun():
    """2 processes x 4 CPU devices = one 8-device global mesh; the
    sharded reduction must equal the local compute on every process."""
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.update(SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4",
                   SAMTPU_DIST_COORD=f"localhost:{port}",
                   SAMTPU_DIST_NPROCS="2",
                   SAMTPU_DIST_PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "dryrun_dist.py")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=REPO))
    outs = [p.communicate(timeout=180)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-800:]
        assert "OK" in out


def test_depth_cli_sharded_equals_host():
    """`samtools_tpu depth` with SAMTPU_SHARDS=8 on the virtual mesh is
    byte-identical to the host path — the CLI face of region
    sharding."""
    bam = "/root/reference/test/mpileup/mpileup.1.bam"

    def run(env_extra):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO
        env.update(env_extra)
        r = subprocess.run(
            [sys.executable, "-m", "samtools_tpu", "depth", bam],
            capture_output=True, env=env, cwd=REPO)
        assert r.returncode == 0, r.stderr.decode()[-800:]
        return r.stdout

    host = run({"SAMTPU_DEVICE": "0"})
    shard = run({"SAMTPU_DEVICE": "1", "SAMTPU_PLATFORM": "cpu",
                 "JAX_PLATFORMS": "cpu", "SAMTPU_SHARDS": "8",
                 "XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    assert host == shard and host
