"""Order-agnostic checksum reduction in GF(2^31 - 1).

Reference: /root/reference/bam_checksum.c:188-253 (``update_hash`` /
``sums_update_row``).  The per-record CRC32s are combined *multiplicatively*
modulo the Mersenne prime 2^31-1, which makes the reduction fully
commutative and associative — the ideal cross-shard/device validation
primitive (SURVEY §2.5, §5): shards compute partial products locally and
combine with one more multiply.

Host path: numpy log-depth tree product (vectorized, no Python-per-record
loop).  The same tree maps 1:1 onto a multi-chip psum-style collective;
products of two values < 2^31 fit in uint64, so no wraparound occurs
between reduction steps.
"""

from __future__ import annotations

import numpy as np

PRIME = np.uint64((1 << 31) - 1)


def map_crc(crcs: np.ndarray) -> np.ndarray:
    """Map raw uint32 CRCs into the multiplicative group of GF(2^31-1).

    Mirrors update_hash's input conditioning (bam_checksum.c:196-199):
    crc &= PRIME; 0 and PRIME (both ≡ 0 mod PRIME) become 1.
    """
    v = np.asarray(crcs).astype(np.uint64) & PRIME
    v = np.where(v == 0, np.uint64(1), v)
    return v


def gf31_mul(a, b) -> int:
    """(a * b) mod (2^31-1); operands must already be in [1, PRIME)."""
    return int((np.uint64(a) * np.uint64(b)) % PRIME)


def gf31_product(vals: np.ndarray) -> int:
    """Tree-reduce product mod 2^31-1 of already-mapped values."""
    v = np.asarray(vals, np.uint64)
    if v.size == 0:
        return 1
    while v.size > 1:
        if v.size & 1:
            v = np.concatenate([v, np.ones(1, np.uint64)])
        v = (v[0::2] * v[1::2]) % PRIME
    return int(v[0])


def gf31_segment_product(vals: np.ndarray, seg: np.ndarray,
                         nseg: int) -> np.ndarray:
    """Per-segment product mod 2^31-1 of already-mapped values.

    ``seg`` assigns each value to a segment id in [0, nseg).  Each segment
    is reduced with the log-depth tree; segment count (read groups) is
    small, value count (records) is large.
    """
    vals = np.asarray(vals, np.uint64)
    seg = np.asarray(seg)
    out = np.ones(nseg, np.uint64)
    for i in range(nseg):
        m = seg == i
        if m.any():
            out[i] = gf31_product(vals[m])
    return out
