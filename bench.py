"""Benchmark: dense pileup scatter kernel throughput on the TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: examples/ex1 reads tiled to ~2M records across a synthetic 32 Mb
window (≈30x depth), expanded host-side to per-aligned-base (refpos, lane)
pairs, then scatter-added into the dense [window, 32] pileup tensor on
device — the core compute of depth/mpileup/consensus (SURVEY §7).

vs_baseline = device throughput / single-core numpy host throughput on the
same arrays (np.add.at), the in-repo stand-in until a samtools+htslib CPU
baseline can be measured (reference repo ships no binaries and htslib is
not vendored).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax

    from samtools_tpu.io.files import read_alignments
    from samtools_tpu.ops.pileup_device import (expand_to_device_arrays,
                                                pileup_counts)

    f = read_alignments("/root/reference/examples/ex1.sam.gz")
    b = f.batch
    sel = np.nonzero((b.tid >= 0) & ((b.flag & 4) == 0))[0]

    refpos, lane, qual, valid = expand_to_device_arrays(b, sel, 0, 1 << 25)
    # tile to ~2M reads' worth of bases spread over a 32Mb window
    reps = max(1, (2_000_000 // max(sel.size, 1)))
    span = int(refpos.max()) + 1
    parts = []
    for r in range(reps):
        shift = (r * 524_287) % ((1 << 25) - span)
        parts.append(refpos + np.int32(shift))
    refpos_t = np.concatenate(parts)
    lane_t = np.tile(lane, reps)
    valid_t = np.ones(refpos_t.size, bool)
    window = 1 << 25
    n_bases = refpos_t.size
    n_reads = sel.size * reps

    dev_fn = lambda: pileup_counts(refpos_t, lane_t, valid_t, window)
    out = dev_fn()
    out.block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out = dev_fn()
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    dev_bases_per_s = n_bases / dt
    dev_reads_per_s = n_reads / dt

    # host numpy baseline (single pass)
    t0 = time.perf_counter()
    counts = np.zeros((window, 32), np.int32)
    np.add.at(counts, (refpos_t, lane_t), 1)
    host_dt = time.perf_counter() - t0
    host_bases_per_s = n_bases / host_dt

    print(json.dumps({
        "metric": "pileup_scatter_aligned_bases_per_s",
        "value": round(dev_bases_per_s),
        "unit": "bases/s",
        "vs_baseline": round(dev_bases_per_s / host_bases_per_s, 2),
        "detail": {
            "reads_per_s": round(dev_reads_per_s),
            "n_bases": int(n_bases),
            "window": window,
            "device": str(jax.devices()[0]),
            "host_numpy_bases_per_s": round(host_bases_per_s),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
