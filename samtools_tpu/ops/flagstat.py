"""Device flagstat kernel: the 16-counter flag census as one batched
masked reduction.

Reference semantics: flagstat_loop (/root/reference/bam_stat.c:48-79) — a
per-record chain of flag bit tests split by QC-fail.  TPU-native design:
build a [n, 16] boolean condition matrix and a [n, 2] QC one-hot, contract
them with a single ``einsum`` (rides the MXU), giving the full [16, 2]
counter table in one pass.  Sharded across a mesh this becomes a local
einsum + psum (see samtools_tpu.parallel.mesh).
"""

from __future__ import annotations

from .. import device as _device  # noqa: F401  (platform override)

import jax
import jax.numpy as jnp
import numpy as np

from ..core import flags as F

# counter row order (matches the output order of bam_stat.c:129-146)
COUNTERS = [
    "n_reads", "n_primary", "n_secondary", "n_supp", "n_dup", "n_pdup",
    "n_mapped", "n_pmapped", "n_pair_all", "n_read1", "n_read2",
    "n_pair_good", "n_pair_map", "n_sgltn", "n_diffchr", "n_diffhigh",
]
N_COUNTERS = len(COUNTERS)


def condition_matrix(flag: jax.Array, mapq: jax.Array, tid: jax.Array,
                     mtid: jax.Array) -> jax.Array:
    """[n, 16] float32 0/1 matrix of per-record counter conditions."""
    f = flag.astype(jnp.int32)
    secondary = (f & F.FSECONDARY) != 0
    supp = (f & F.FSUPPLEMENTARY) != 0
    primary = ~secondary & ~supp
    unmap = (f & F.FUNMAP) != 0
    munmap = (f & F.FMUNMAP) != 0
    paired = (f & F.FPAIRED) != 0
    dup = (f & F.FDUP) != 0
    ppair = (f & F.FPROPER_PAIR) != 0
    pair_all = primary & paired
    pair_map = pair_all & ~unmap & ~munmap
    diffchr = pair_map & (mtid.astype(jnp.int32) != tid.astype(jnp.int32))
    conds = [
        jnp.ones_like(unmap),                      # n_reads
        primary,                                   # n_primary
        secondary,                                 # n_secondary
        supp,                                      # n_supp
        dup,                                       # n_dup
        primary & dup,                             # n_pdup
        ~unmap,                                    # n_mapped
        primary & ~unmap,                          # n_pmapped
        pair_all,                                  # n_pair_all
        pair_all & ((f & F.FREAD1) != 0),          # n_read1
        pair_all & ((f & F.FREAD2) != 0),          # n_read2
        pair_all & ppair & ~unmap,                 # n_pair_good
        pair_map,                                  # n_pair_map
        pair_all & munmap & ~unmap,                # n_sgltn
        diffchr,                                   # n_diffchr
        diffchr & (mapq.astype(jnp.int32) >= 5),   # n_diffhigh
    ]
    return jnp.stack(conds, axis=1).astype(jnp.float32)


def flagstat_device(flag: jax.Array, mapq: jax.Array, tid: jax.Array,
                    mtid: jax.Array, valid: jax.Array) -> jax.Array:
    """[16, 2] int64 counters; column 0 = QC-pass, 1 = QC-fail.  ``valid``
    masks out padding rows (fixed shapes keep the compile cache warm)."""
    conds = condition_matrix(flag, mapq, tid, mtid)
    qcfail = ((flag.astype(jnp.int32) & F.FQCFAIL) != 0)
    w = jnp.stack([~qcfail & valid, qcfail & valid], axis=1).astype(jnp.float32)
    # [n,16] x [n,2] contraction over the batch axis → MXU matmul
    counts = jnp.einsum("nc,nw->cw", conds, w,
                        preferred_element_type=jnp.float32)
    # int32 is safe: chunks are capped well below 2^31 records
    return counts.astype(jnp.int32)


_jit_flagstat = jax.jit(flagstat_device)


def flagstat_counts(batch, chunk: int = 1 << 22) -> dict[str, tuple[int, int]]:
    """Host entry: run the device census over a ReadBatch, returning
    {counter: (qc_pass, qc_fail)}.  Large batches are processed in padded
    fixed-size chunks so XLA compiles once."""
    n = batch.n
    total = np.zeros((N_COUNTERS, 2), np.int64)
    for s in range(0, max(n, 1), chunk):
        e = min(s + chunk, n)
        m = e - s
        if m <= 0:
            break
        size = min(chunk, _next_pow2(m))
        flag = np.zeros(size, np.uint16)
        mapq = np.zeros(size, np.uint8)
        tid = np.full(size, -1, np.int32)
        mtid = np.full(size, -1, np.int32)
        valid = np.zeros(size, bool)
        flag[:m] = batch.flag[s:e]
        mapq[:m] = batch.mapq[s:e]
        tid[:m] = batch.tid[s:e]
        mtid[:m] = batch.mtid[s:e]
        valid[:m] = True
        total += np.asarray(_jit_flagstat(flag, mapq, tid, mtid, valid))
    return {name: (int(total[i, 0]), int(total[i, 1]))
            for i, name in enumerate(COUNTERS)}


def _next_pow2(n: int) -> int:
    p = 1024
    while p < n:
        p <<= 1
    return p


def flagstat_numpy(batch) -> dict[str, tuple[int, int]]:
    """Pure-numpy reference implementation (CI without JAX devices and the
    correctness oracle for the device kernel)."""
    f = batch.flag.astype(np.int32)
    mapq = batch.mapq.astype(np.int32)
    tid = batch.tid.astype(np.int32)
    mtid = batch.mtid.astype(np.int32)
    secondary = (f & F.FSECONDARY) != 0
    supp = (f & F.FSUPPLEMENTARY) != 0
    primary = ~secondary & ~supp
    unmap = (f & F.FUNMAP) != 0
    munmap = (f & F.FMUNMAP) != 0
    paired = (f & F.FPAIRED) != 0
    dup = (f & F.FDUP) != 0
    ppair = (f & F.FPROPER_PAIR) != 0
    pair_all = primary & paired
    pair_map = pair_all & ~unmap & ~munmap
    diffchr = pair_map & (mtid != tid)
    conds = np.stack([
        np.ones_like(unmap), primary, secondary, supp, dup, primary & dup,
        ~unmap, primary & ~unmap, pair_all,
        pair_all & ((f & F.FREAD1) != 0), pair_all & ((f & F.FREAD2) != 0),
        pair_all & ppair & ~unmap, pair_map, pair_all & munmap & ~unmap,
        diffchr, diffchr & (mapq >= 5),
    ], axis=1)
    qcfail = (f & F.FQCFAIL) != 0
    w = np.stack([~qcfail, qcfail], axis=1)
    counts = conds.astype(np.int64).T @ w.astype(np.int64)
    return {name: (int(counts[i, 0]), int(counts[i, 1]))
            for i, name in enumerate(COUNTERS)}
