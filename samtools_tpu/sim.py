"""Seeded read simulation (wgsim analog, /root/reference/misc/wgsim.c).

Columnar generation: all fields are built as whole numpy arrays, no
per-read loop.  ``simulate_batch`` produces a coordinate-sorted
ReadBatch over a random reference; ``simulate_reference`` the matching
FASTA bytes.  Used by bench.py (30x coverage workloads) and the E. coli
benchmark config; the ``wgsim``-compatible CLI semantics (paired ends,
error/mutation rates) layer on top of these primitives.
"""

from __future__ import annotations

import numpy as np

from .core.batch import ReadBatch
from .io.header import SamHeader

# nt16 codes for A,C,G,T
_ACGT16 = np.array([1, 2, 4, 8], np.uint8)


def simulate_reference(ref_len: int, seed: int = 0) -> np.ndarray:
    """uint8 ACGT ascii reference of the given length."""
    rng = np.random.RandomState(seed)
    return np.frombuffer(b"ACGT", np.uint8)[rng.randint(0, 4, ref_len)]


def make_header(ref_len: int, name: str = "sim1") -> SamHeader:
    text = f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:{name}\tLN:{ref_len}\n"
    return SamHeader.from_text(text)


def simulate_batch(ref_len: int = 8 << 20, coverage: float = 30.0,
                   read_len: int = 100, seed: int = 42,
                   paired: bool = True, err_rate: float = 0.01,
                   ref: np.ndarray | None = None) -> ReadBatch:
    """Coordinate-sorted single-contig ReadBatch at the given coverage.

    Reads are perfect copies of ``ref`` (or random bases if None) with
    ``err_rate`` random substitutions — enough structure for depth /
    pileup / consensus / sort / markdup benchmarks.
    """
    rng = np.random.RandomState(seed)
    n = int(ref_len * coverage / read_len)
    if paired:
        n &= ~1
    pos = np.sort(rng.randint(0, ref_len - read_len, n)).astype(np.int64)

    b = ReadBatch()
    b.n = n
    b.tid = np.zeros(n, np.int32)
    b.pos = pos
    b.mapq = rng.randint(20, 60, n).astype(np.uint8)
    flag = np.zeros(n, np.uint16)
    rev = rng.rand(n) < 0.5
    flag[rev] |= 0x10
    if paired:
        # mate = the read with the adjacent index after a seeded shuffle
        mate = rng.permutation(n)
        pairs = mate.reshape(-1, 2)
        mate_of = np.empty(n, np.int64)
        mate_of[pairs[:, 0]] = pairs[:, 1]
        mate_of[pairs[:, 1]] = pairs[:, 0]
        flag |= 0x1 | 0x2
        first = np.zeros(n, bool)
        first[pairs[:, 0]] = True
        flag[first] |= 0x40
        flag[~first] |= 0x80
        flag[rev[mate_of]] |= 0x20
        b.mtid = np.zeros(n, np.int32)
        b.mpos = pos[mate_of]
        b.tlen = np.where(b.mpos >= pos, b.mpos - pos + read_len,
                          -(pos - b.mpos + read_len))
    else:
        b.mtid = np.full(n, -1, np.int32)
        b.mpos = np.full(n, -1, np.int64)
        b.tlen = np.zeros(n, np.int64)
    b.flag = flag

    # qnames: "simN" with pair mates sharing N
    if paired:
        pair_id = np.empty(n, np.int64)
        pair_id[pairs[:, 0]] = np.arange(n // 2)
        pair_id[pairs[:, 1]] = np.arange(n // 2)
    else:
        pair_id = np.arange(n)
    # vectorized "simNNNNNNN" names: fixed-width zero-padded digits keep
    # the layout a dense [n, width] byte matrix (no per-name Python work)
    width = max(1, len(str(max(int(pair_id.max(initial=0)), 1))))
    mat = np.empty((n, 3 + width), np.uint8)
    mat[:, 0:3] = np.frombuffer(b"sim", np.uint8)
    v = pair_id.copy()
    for d in range(width - 1, -1, -1):
        mat[:, 3 + d] = 48 + (v % 10)
        v //= 10
    b.qname = mat.ravel()
    b.qname_off = np.arange(0, n * (3 + width) + 1, 3 + width,
                            dtype=np.int64)

    # CIGAR: one full-length match op per read
    b.cigar = np.full(n, (read_len << 4) | 0, np.uint32)
    b.cigar_off = np.arange(n + 1, dtype=np.int64)

    # sequence: reference bases + random substitutions
    if ref is None:
        codes = _ACGT16[rng.randint(0, 4, n * read_len)]
    else:
        idx = (pos[:, None] + np.arange(read_len)[None, :]).ravel()
        base_i = np.searchsorted(np.frombuffer(b"ACGT", np.uint8),
                                 np.sort(np.frombuffer(b"ACGT", np.uint8)))
        lut = np.zeros(256, np.uint8)
        lut[np.frombuffer(b"ACGT", np.uint8)] = _ACGT16
        codes = lut[ref[idx]]
    if err_rate > 0:
        errs = rng.rand(codes.size) < err_rate
        codes[errs] = _ACGT16[rng.randint(0, 4, int(errs.sum()))]
    b.seq = codes
    b.seq_off = np.arange(0, n * read_len + 1, read_len, dtype=np.int64)
    b.qual = rng.randint(2, 41, n * read_len).astype(np.uint8)
    b.aux = np.empty(0, np.uint8)
    b.aux_off = np.zeros(n + 1, np.int64)
    return b
