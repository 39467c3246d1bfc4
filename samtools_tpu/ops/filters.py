"""Vectorized record predicates and the qname hash family.

Reference analog: process_aln (/root/reference/sam_view.c:151-230) — a
per-record filter chain.  Here each predicate is a whole-batch boolean
column; the chain is a single AND-reduce over the batch.

Hashes reproduce the exact bit patterns of khash's X31/Wang/FNV1a
(sam_view.c:178 uses Wang(X31(qname) ^ seed) for deterministic
subsampling) — all vectorized over the batch via a per-character sweep of
the ragged qname column.
"""

from __future__ import annotations

import numpy as np

from ..core import flags as F

U32 = np.uint32
_M32 = np.uint64(0xFFFFFFFF)


def x31_hash_ragged(flat: np.ndarray, off: np.ndarray) -> np.ndarray:
    """khash __ac_X31_hash_string over each ragged string:
    h = h*31 + c.  Vectorized: loop over character positions (max qname
    length, ~tens), operating on all records at once."""
    n = off.size - 1
    lens = off[1:] - off[:-1]
    maxlen = int(lens.max()) if n else 0
    h = np.zeros(n, np.uint32)
    starts = off[:-1]
    for j in range(maxlen):
        live = lens > j
        c = flat[starts[live] + j].astype(np.uint32)
        h[live] = (h[live] << np.uint32(5)) - h[live] + c
    return h


def wang_hash(key: np.ndarray) -> np.ndarray:
    """khash __ac_Wang_hash (32-bit)."""
    k = key.astype(np.uint32)
    k = k + ~(k << np.uint32(15))
    k = k ^ (k >> np.uint32(10))
    k = k + (k << np.uint32(3))
    k = k ^ (k >> np.uint32(6))
    k = k + ~(k << np.uint32(11))
    k = k ^ (k >> np.uint32(16))
    return k


def fnv1a_hash_bytes(data: bytes) -> int:
    """khash __ac_FNV1a_hash_string."""
    h = 0x811C9DC5
    for c in data:
        h = ((h ^ c) * 16777619) & 0xFFFFFFFF
    return h


def glibc_rand_first(seed: int) -> int:
    """First value of glibc srand(seed); rand() (TYPE_3 additive generator)
    — needed because view scrambles the subsample seed through it
    (/root/reference/sam_view.c:1390-1394)."""
    seed &= 0xFFFFFFFF
    if seed == 0:
        seed = 1
    r = [0] * 345
    r[0] = seed
    for i in range(1, 31):
        r[i] = (16807 * r[i - 1]) % 2147483647
    for i in range(31, 34):
        r[i] = r[i - 31]
    for i in range(34, 345):
        r[i] = (r[i - 31] + r[i - 3]) & 0xFFFFFFFF
    return r[344] >> 1


def subsample_keep(batch, frac: float, seed: int) -> np.ndarray:
    """Deterministic qname-hash subsampling mask
    (sam_view.c:178-181)."""
    h = x31_hash_ragged(batch.qname, batch.qname_off)
    k = wang_hash(h ^ np.uint32(seed))
    return (k & np.uint32(0xFFFFFF)).astype(np.float64) / 0x1000000 < frac


def qlen_from_cigar(batch) -> np.ndarray:
    """Per-record query length including hard clips (view -m semantics,
    sam_view.c:162-168)."""
    if batch.n == 0:
        return np.zeros(0, np.int64)
    ops = (batch.cigar & 0xF).astype(np.int64)
    lens = (batch.cigar >> 4).astype(np.int64)
    counts_q = np.array(F.CIGAR_CONSUMES_QUERY, np.int64).copy()
    counts_q[F.CHARD_CLIP] = 1
    contrib = lens * counts_q[ops]
    csum = np.concatenate([[0], np.cumsum(contrib)])
    return csum[batch.cigar_off[1:]] - csum[batch.cigar_off[:-1]]


def flag_mask(batch, flag_on: int = 0, flag_off: int = 0,
              flag_anyon: int = 0, flag_alloff: int = 0) -> np.ndarray:
    """The 4-way flag logic of view (sam_view.c:63-66,168-175)."""
    f = batch.flag.astype(np.int64)
    keep = np.ones(batch.n, bool)
    if flag_on:
        keep &= (f & flag_on) == flag_on
    if flag_off:
        keep &= (f & flag_off) == 0
    if flag_alloff:
        keep &= (f & flag_alloff) != flag_alloff
    if flag_anyon:
        keep &= (f & flag_anyon) != 0
    return keep


def qnames_array(batch) -> np.ndarray:
    """Decode qnames to a python object array (for hash-set filters)."""
    out = np.empty(batch.n, object)
    qf = batch.qname.tobytes()
    off = batch.qname_off
    for i in range(batch.n):
        out[i] = qf[off[i]:off[i + 1]]
    return out
