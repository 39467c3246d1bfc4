"""Design-space sweep of the Pallas pileup kernel on the real TPU.

Measures steady-state ON-CHIP throughput (inputs pre-packed and
device-resident; this box's host->device tunnel is ~100 MB/s and not
representative of a production host's PCIe) of the two production
configurations:
* depth events: sparse +-1 difference events (~2 per read op)
* census: per-base lane counts (every aligned base an item)

over (tile, kb) variants.  Appends JSON lines to scripts/sweep_out.jsonl.
Usage: python scripts/sweep_kernel.py [tile kb ...]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

OUT = "scripts/sweep_out.jsonl"


def gen_events(wlen=8 << 20, cov=30, rlen=100, seed=0):
    rng = np.random.RandomState(seed)
    n_reads = wlen * cov // rlen
    pos = np.sort(rng.randint(0, wlen - rlen, n_reads)).astype(np.int64)
    end = pos + rlen
    ev_pos = np.empty(2 * n_reads, np.int64)
    ev_pos[0::2] = pos
    ev_pos[1::2] = end
    W = np.empty((2 * n_reads, 1), np.int8)
    W[0::2] = 1
    W[1::2] = -1
    off = np.arange(0, 2 * n_reads + 1, 2, dtype=np.int64)
    return pos, end + 1, ev_pos, W, off, wlen, n_reads


def gen_census(wlen=1 << 20, cov=30, rlen=100, seed=1):
    rng = np.random.RandomState(seed)
    n_reads = wlen * cov // rlen
    pos = np.sort(rng.randint(0, wlen - rlen, n_reads)).astype(np.int64)
    base_pos = (pos[:, None] + np.arange(rlen)[None, :]).ravel()
    lane = rng.randint(0, 32, base_pos.size).astype(np.uint8)
    qual = rng.randint(0, 42, base_pos.size).astype(np.uint8)
    off = np.arange(0, base_pos.size + 1, rlen, dtype=np.int64)
    return pos, pos + rlen, base_pos, lane, qual, off, wlen, n_reads


def bench(fn, iters=5):
    r = fn()
    np.asarray(r[:8])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
        np.asarray(r[:8])  # force completion with a tiny fetch
    return (time.perf_counter() - t0) / iters


def emit(r):
    print(json.dumps(r), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(r) + "\n")


def stage(pp, refpos, W_or_lane, qual, min_qual, kb, census, n_pad):
    """Pack inputs into kernel layout and put on device; returns
    (rp3, w3) device arrays."""
    import jax
    rp = pp._pad_rows(refpos.astype(np.int32, copy=False), n_pad,
                      np.iinfo(np.int32).min)
    rp3 = jax.device_put(rp.reshape(-1, 1, kb))
    if census:
        _, pack_census = pp._packer(kb)
        w3 = pack_census(
            pp._pad_rows(W_or_lane.astype(np.uint8, copy=False), n_pad),
            pp._pad_rows(qual.astype(np.uint8, copy=False), n_pad),
            np.uint8(min_qual))
    else:
        pack_w, _ = pp._packer(kb)
        w3 = pack_w(pp._pad_rows(np.ascontiguousarray(W_or_lane, np.int8),
                                 n_pad))
    w3.block_until_ready()
    return rp3, w3


def main():
    from samtools_tpu.ops import pileup_engine as pe
    from samtools_tpu.ops import pileup_pallas as pp
    import jax
    print("platform", jax.devices()[0].platform, flush=True)
    interpret = jax.devices()[0].platform != "tpu"

    args = sys.argv[1:]
    if args:
        it = iter(args)
        variants = [(int(a), int(b)) for a, b in zip(it, it)]
    else:
        variants = [(128, 512), (512, 512), (1024, 512), (1024, 2048),
                    (2048, 2048)]

    rpos, rend, ev_pos, W, off, wlen, n_reads = gen_events()
    cpos, cend, bpos, lane, qual, coff, cwlen, c_reads = gen_census()

    for tile, kb in variants:
        # ---- depth events (kernel only, device-resident) ----
        try:
            plan = pe.tile_plan(rpos, rend, off, 0, wlen, tile=tile)
            n_tiles_pad = pe.padded_tiles(plan.n_tiles)
            lo = np.zeros(n_tiles_pad, np.int32)
            hi = np.zeros(n_tiles_pad, np.int32)
            lo[:plan.n_tiles] = plan.lo
            hi[:plan.n_tiles] = plan.hi
            _, _, B_pad, n_pad = pp._shapes(ev_pos, lo, hi, plan.B, kb)
            rp3, w3 = stage(pp, ev_pos, W, None, 0, kb, False, n_pad)
            t0 = time.perf_counter()
            dt = bench(lambda: pp._run(rp3, w3, lo, hi, 0, n_tiles_pad,
                                       B_pad // kb, interpret, tile, kb))
            emit({"kind": "events", "tile": tile, "kb": kb,
                  "B_pad": int(B_pad), "n_tiles": int(n_tiles_pad),
                  "n_items": int(ev_pos.size), "wlen": wlen,
                  "ms": round(dt * 1e3, 2),
                  "aligned_bases_per_s_M": round(n_reads * 100 / dt / 1e6,
                                                 1),
                  "positions_per_s_M": round(wlen / dt / 1e6, 1),
                  "compile_s": round(time.perf_counter() - t0 - 6 * dt, 1)})
        except Exception as e:
            emit({"kind": "events", "tile": tile, "kb": kb,
                  "error": repr(e)[:300]})

        # ---- census (kernel only, device-resident) ----
        try:
            plan = pe.tile_plan(cpos, cend, coff, 0, cwlen, tile=tile)
            n_tiles_pad = pe.padded_tiles(plan.n_tiles)
            lo = np.zeros(n_tiles_pad, np.int32)
            hi = np.zeros(n_tiles_pad, np.int32)
            lo[:plan.n_tiles] = plan.lo
            hi[:plan.n_tiles] = plan.hi
            _, _, B_pad, n_pad = pp._shapes(bpos, lo, hi, plan.B, kb)
            rp3, w3 = stage(pp, bpos, lane, qual, 13, kb, True, n_pad)
            t0 = time.perf_counter()
            dt = bench(lambda: pp._run(rp3, w3, lo, hi, 0, n_tiles_pad,
                                       B_pad // kb, interpret, tile, kb))
            emit({"kind": "census", "tile": tile, "kb": kb,
                  "B_pad": int(B_pad), "n_tiles": int(n_tiles_pad),
                  "n_items": int(bpos.size), "wlen": cwlen,
                  "ms": round(dt * 1e3, 2),
                  "bases_per_s_M": round(bpos.size / dt / 1e6, 1),
                  "compile_s": round(time.perf_counter() - t0 - 6 * dt, 1)})
        except Exception as e:
            emit({"kind": "census", "tile": tile, "kb": kb,
                  "error": repr(e)[:300]})


if __name__ == "__main__":
    main()
