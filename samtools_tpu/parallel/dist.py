"""Multi-host bootstrap: jax.distributed over DCN.

The reference has no distributed story (single-node pthreads,
SURVEY §2.8); the TPU-native equivalent is the standard JAX multi-host
model: one process per host, `jax.distributed.initialize` over the
coordinator, global meshes spanning every host's devices, XLA
collectives riding ICI within a slice and DCN across hosts.

Environment contract (set by the launcher on every host):
  SAMTPU_DIST_COORD    coordinator address host:port (required switch)
  SAMTPU_DIST_NPROCS   number of processes
  SAMTPU_DIST_PROC_ID  this process's id (0-based)

`maybe_init_distributed()` is called once from the CLI entry before any
jax use; without the env vars it is a no-op, so single-host behavior is
untouched.  Each host reads its own input byte ranges (the multi-fp
pattern of /root/reference/bam_consensus.c:2640 generalized), and
region shards map to the global mesh exactly as on one host.
"""

from __future__ import annotations

import os

_INITED = False


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed from the SAMTPU_DIST_* environment.
    Returns True when running distributed (after init), False
    otherwise.  Idempotent."""
    global _INITED
    if _INITED:
        return True
    coord = os.environ.get("SAMTPU_DIST_COORD")
    if not coord:
        return False
    nprocs = int(os.environ["SAMTPU_DIST_NPROCS"])
    proc_id = int(os.environ["SAMTPU_DIST_PROC_ID"])
    import jax
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs,
                               process_id=proc_id)
    _INITED = True
    return True


def process_info() -> tuple[int, int]:
    """(process_id, num_processes) — (0, 1) when not distributed."""
    if not _INITED:
        return 0, 1
    import jax
    return jax.process_index(), jax.process_count()


def host_shard_ranges(total: int) -> tuple[int, int]:
    """This host's contiguous slice of `total` work items (block
    partition; the host-local file-range read pattern)."""
    pid, n = process_info()
    per = (total + n - 1) // n
    lo = min(pid * per, total)
    return lo, min(lo + per, total)
