"""Native classify_reads / census_checksum parity vs the numpy oracles.

The native walk (native/samtpu.cc samtpu_classify_reads) must agree with
ops/mpileup_device.classify_reads on every cigar shape the device kernel
routes: clean M, indels, soft/hard clips, N-skips, long cigars, edge
windows.
"""

import os

import numpy as np
import pytest

from samtools_tpu.io import native
from samtools_tpu.ops import mpileup_device as md
from samtools_tpu.sim import simulate_batch

pytestmark = pytest.mark.skipif(
    not (native.available() and native.has_classify()),
    reason="native library unavailable")


def _messy_batch(ref_len=1 << 17, seed=5):
    b = simulate_batch(ref_len=ref_len, coverage=8, read_len=100,
                       seed=seed, paired=False, err_rate=0.01)
    rng = np.random.default_rng(seed)
    M, I, D, N, S, H = 0, 1, 2, 3, 4, 5
    flat, off = [], [0]
    kind = rng.random(b.n)
    for i in range(b.n):
        L = int(b.seq_off[i + 1] - b.seq_off[i])
        k = kind[i]
        if k < 0.08:
            ops = [(L // 3, M), (3, I), (L - L // 3 - 3, M)]
        elif k < 0.16:
            ops = [(L // 2, M), (2, D), (L - L // 2, M)]
        elif k < 0.24:
            ops = [(8, S), (L - 8, M)]
        elif k < 0.28:
            ops = [(L - 6, M), (6, S)]
        elif k < 0.31:
            ops = [(L // 2, M), (40, N), (L - L // 2, M)]  # -> host
        elif k < 0.34:
            ops = [(2, H), (L, M), (1, H)]
        elif k < 0.38:  # many ops -> host (> MAXOPS)
            ops = [(10, M), (1, I)] * 5 + [(L - 55, M)]
        elif k < 0.41:  # wide deletion: band overflow -> host
            ops = [(L // 2, M), (30, D), (L - L // 2, M)]
        else:
            ops = [(L, M)]
        flat.extend((ln << 4) | op for ln, op in ops)
        off.append(len(flat))
    b.cigar = np.array(flat, np.uint32)
    b.cigar_off = np.array(off, np.int64)
    # a few quality sentinels
    idx = rng.integers(0, b.n, 20)
    b.qual[b.seq_off[idx]] = 0xFF
    return b


def test_classify_parity_messy():
    b = _messy_batch()
    sel = np.arange(b.n, dtype=np.int64)
    os.environ["SAMTPU_CLASSIFY_PY"] = "1"
    try:
        e1, l1, r1, c1 = md.classify_reads(b, sel, 100, 1 << 17)
    finally:
        del os.environ["SAMTPU_CLASSIFY_PY"]
    e2, l2, r2, c2 = native.classify_reads(
        b.pos, b.cigar, b.cigar_off, b.seq_off, b.qual, sel,
        100, 1 << 17, 7, md.MAXOPS)
    assert np.array_equal(e1, e2)
    assert np.array_equal(l1[e1], l2[e2])
    assert np.array_equal(r1[e1], r2[e2])
    assert np.array_equal(c1, c2)
    assert 0 < e1.sum() < b.n  # both classes exercised


def test_classify_parity_subset_sel():
    b = _messy_batch(seed=11)
    rng = np.random.default_rng(1)
    sel = np.sort(rng.choice(b.n, b.n // 3, replace=False)).astype(
        np.int64)
    os.environ["SAMTPU_CLASSIFY_PY"] = "1"
    try:
        e1, l1, r1, c1 = md.classify_reads(b, sel, 100, 1 << 17)
    finally:
        del os.environ["SAMTPU_CLASSIFY_PY"]
    e2, l2, r2, c2 = native.classify_reads(
        b.pos, b.cigar, b.cigar_off, b.seq_off, b.qual, sel,
        100, 1 << 17, 7, md.MAXOPS)
    assert np.array_equal(e1, e2)
    assert np.array_equal(l1[e1], l2[e2])
    assert np.array_equal(r1[e1], r2[e2])


def test_census_checksum_native_matches_numpy():
    rng = np.random.default_rng(7)
    census = rng.integers(0, 1 << 40, size=(6000, 5)).astype(np.int64)
    qsum = rng.integers(0, 1 << 40, size=6000).astype(np.int64)
    got = native.census_checksum(census, qsum)
    # numpy oracle (inline: the wrapper would route back to native)
    c = census.astype(np.uint32).ravel()
    q = qsum.astype(np.uint32).ravel()
    v = np.concatenate([c, q])
    idx = np.arange(v.size, dtype=np.uint32)
    with np.errstate(over="ignore"):
        w1 = idx * np.uint32(2654435761)
        w2 = (idx + np.uint32(0x9E3779B9)) * np.uint32(40503)
        want = (int((v * w1).sum(dtype=np.uint64) & 0xFFFFFFFF),
                int((v * w2).sum(dtype=np.uint64) & 0xFFFFFFFF))
    assert got == want
