"""stats histograms as segment-sum kernels.

The reference accumulates every `samtools stats` histogram one record at a
time in C (collect_stats, /root/reference/stats.c:1212-1515).  The TPU
rebuild instead flattens a whole columnar window into per-base streams
(cycle, qual, base-class, order) and scatter-adds them into dense
histogram tensors — the same segment-sum shape as flagstat's census
(ops/flagstat.py).  Two interchangeable backends:

* numpy ``bincount`` on fused indices — the host default; already ~100x
  the per-record loop.
* a jitted JAX scatter-add (``base_hists_device``) — one fused device
  pass per window; all outputs are dense int32 tensors, so an N-chip run
  psums them over the mesh before host formatting (see
  tests/test_multichip.py).  Used when the device engine is enabled
  (SAMTPU_DEVICE=1 forces it; tests assert bit-equality vs numpy).

Row convention: ``cycle`` is already reverse-adjusted (len-1-i for
reverse-strand reads).  stats.c indexes first/last-fragment quality
matrices as (machine cycle, reversed qual) — an identical multiset of
(row, qual) pairs, so one stream feeds both the ACGT and quality
matrices.
"""

from __future__ import annotations

import os

import numpy as np

_PAD_BUCKETS = (1 << 12, 1 << 14, 1 << 16, 1 << 18, 1 << 20, 1 << 22,
                1 << 24)

NQUALS = 257


def _bucket(n: int) -> int:
    for b in _PAD_BUCKETS:
        if n <= b:
            return b
    return n


def base_hists_numpy(nbases: int, cycle: np.ndarray, qual: np.ndarray,
                     col: np.ndarray, order: np.ndarray,
                     rev: np.ndarray):
    """(quals_1st, quals_2nd, acgt_1st, acgt_2nd, acgt_rev) int64.

    Inputs may be narrow dtypes (int32 cycle, uint8 qual/col); the fused
    bincount keys stay in int32 to minimize memory traffic."""
    cycle = cycle.astype(np.int32, copy=False)
    o1 = order == 1
    o2 = order == 2
    rows_q = nbases + 1

    def hist2(mask, val, ncols, rows):
        fused = cycle[mask] * np.int32(ncols) + val[mask]
        return np.bincount(fused, minlength=rows * ncols).reshape(
            rows, ncols)

    qual32 = qual.astype(np.int32, copy=False)
    q1 = hist2(o1, qual32, NQUALS, rows_q)
    q2 = hist2(o2, qual32, NQUALS, rows_q)
    col32 = col.astype(np.int32, copy=False)
    a1 = hist2(o1, col32, 6, nbases)
    a2 = hist2(o2, col32, 6, nbases)
    acgt = (col < 4) & (o1 | o2)
    col2 = np.where(rev, np.int32(3) - col32, col32)
    fused = cycle[acgt] * np.int32(6) + col2[acgt]
    ar = np.bincount(fused, minlength=nbases * 6).reshape(nbases, 6)
    return q1, q2, a1, a2, ar


_jit_cache: dict = {}


def _device_fn(nbases: int, padded: int):
    key = (nbases, padded)
    fn = _jit_cache.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp

    def impl(cycle, qual, col, order, rev, valid):
        # one extra scratch row absorbs padded/invalid lanes
        rows_q = nbases + 2
        rows_a = nbases + 1
        o1 = (order == 1) & valid
        o2 = (order == 2) & valid
        row_q1 = jnp.where(o1, cycle, nbases + 1)
        row_q2 = jnp.where(o2, cycle, nbases + 1)
        row_a1 = jnp.where(o1, cycle, nbases)
        row_a2 = jnp.where(o2, cycle, nbases)
        acgt = (col < 4) & (o1 | o2)
        row_ar = jnp.where(acgt, cycle, nbases)
        col2 = jnp.where(rev, 3 - col, col)
        one = jnp.ones_like(cycle, jnp.int32)
        q1 = jnp.zeros((rows_q, NQUALS), jnp.int32).at[row_q1, qual].add(one)
        q2 = jnp.zeros((rows_q, NQUALS), jnp.int32).at[row_q2, qual].add(one)
        a1 = jnp.zeros((rows_a, 6), jnp.int32).at[row_a1, col].add(one)
        a2 = jnp.zeros((rows_a, 6), jnp.int32).at[row_a2, col].add(one)
        ar = jnp.zeros((rows_a, 6), jnp.int32).at[row_ar, col2].add(one)
        return (q1[: nbases + 1], q2[: nbases + 1], a1[:nbases],
                a2[:nbases], ar[:nbases])

    fn = jax.jit(impl)
    _jit_cache[key] = fn
    return fn


def base_hists_device(nbases: int, cycle: np.ndarray, qual: np.ndarray,
                      col: np.ndarray, order: np.ndarray,
                      rev: np.ndarray):
    """JAX scatter-add backend; bit-equal to base_hists_numpy."""
    n = cycle.size
    padded = _bucket(max(n, 1))

    def pad(a, dt):
        out = np.zeros(padded, dt)
        out[:n] = a
        return out

    valid = np.zeros(padded, bool)
    valid[:n] = True
    fn = _device_fn(int(nbases), padded)
    outs = fn(pad(cycle, np.int32), pad(qual, np.int32),
              pad(col, np.int32), pad(order, np.int32), pad(rev, bool),
              valid)
    return tuple(np.asarray(o, np.int64) for o in outs)


def use_device_hists(n_items: int) -> bool:
    """Host is the single-chip default: the native histogram pass beats
    a device round-trip for these tiny tensors (the win is multi-chip
    psum, exercised via the mesh tests and SAMTPU_SHARDS tools).
    SAMTPU_STATS_DEVICE=1 forces the device kernel; =0 forbids it."""
    env = os.environ.get("SAMTPU_STATS_DEVICE")
    if env == "1":
        return True
    return False


def base_hists(nbases: int, cycle, qual, col, order, rev):
    if use_device_hists(cycle.size):
        try:
            return base_hists_device(nbases, cycle, qual, col, order, rev)
        except Exception:
            pass
    return base_hists_numpy(nbases, cycle, qual, col, order, rev)
