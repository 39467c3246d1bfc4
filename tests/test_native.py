"""Native C++ library (libsamtpu) parity vs the pure-Python fallbacks.

The native library accelerates BGZF scan/inflate/deflate and BAM record
framing (htslib bgzf.c + sam.c analogs); these tests pin its outputs to
the numpy/zlib reference paths on real fixtures.
"""

import zlib

import numpy as np
import pytest

from samtools_tpu.io import bam as bammod
from samtools_tpu.io import bgzf, native

REF = "/root/reference/test/mpileup/mpileup.1.bam"

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libsamtpu not built and no compiler")


@pytest.fixture(scope="module")
def bam_bytes():
    with open(REF, "rb") as f:
        return f.read()


def test_bgzf_scan_matches_python(bam_bytes):
    c_py, b_py = bgzf.scan_blocks(bam_bytes)
    c_n, b_n, isz = native.bgzf_scan(bam_bytes)
    assert np.array_equal(c_py, c_n)
    assert np.array_equal(b_py, b_n)
    # ISIZE sum equals total uncompressed length
    u = b"".join(bgzf._inflate_block(bam_bytes, int(o), int(b))
                 for o, b in zip(c_py, b_py))
    assert int(isz.sum()) == len(u)


def test_bgzf_inflate_matches_python(bam_bytes):
    c, b = bgzf.scan_blocks(bam_bytes)
    u_py = b"".join(bgzf._inflate_block(bam_bytes, int(o), int(s))
                    for o, s in zip(c, b))
    _, _, isz = native.bgzf_scan(bam_bytes)
    for threads in (1, 2, 4):
        got = native.bgzf_inflate(bam_bytes, c, b, int(isz.sum()), threads)
        assert got.tobytes() == u_py  # returns uint8 ndarray (zero-copy)


def test_bgzf_deflate_roundtrip(bam_bytes):
    c, b = bgzf.scan_blocks(bam_bytes)
    u = b"".join(bgzf._inflate_block(bam_bytes, int(o), int(s))
                 for o, s in zip(c, b))
    for level in (1, 6):
        for threads in (1, 3):
            comp = native.bgzf_deflate(u, level, 0xFF00, threads)
            # every member independently valid BGZF; full roundtrip
            c2, b2, isz2 = native.bgzf_scan(comp)
            assert int(isz2.sum()) == len(u)
            back = native.bgzf_inflate(comp, c2, b2, len(u), 2)
            assert back.tobytes() == u


def test_bgzf_deflate_empty():
    comp = native.bgzf_deflate(b"", 6, 0xFF00, 1)
    c, b, isz = native.bgzf_scan(comp)
    assert c.size == 1 and int(isz.sum()) == 0
    assert native.bgzf_inflate(comp, c, b, 0, 1).tobytes() == b""


def test_bam_offsets_match_python(bam_bytes):
    u = bgzf.decompress(bam_bytes)
    arr = np.frombuffer(u, np.uint8)
    _, off = bammod.decode_header(arr)
    got = native.bam_record_offsets(arr, off)
    # python fallback
    offs = []
    pos = off
    while pos + 4 <= arr.size:
        bs = int.from_bytes(u[pos:pos + 4], "little")
        offs.append(pos)
        pos += 4 + bs
    assert np.array_equal(got, np.array(offs, np.int64))


def test_bam_offsets_corrupt_raises(bam_bytes):
    u = bgzf.decompress(bam_bytes)
    arr = np.frombuffer(u[:-3], np.uint8).copy()
    _, off = bammod.decode_header(arr)
    with pytest.raises(ValueError):
        native.bam_record_offsets(arr, off)


def test_crc32_matches_zlib(bam_bytes):
    assert native.crc32(bam_bytes) == (zlib.crc32(bam_bytes) & 0xFFFFFFFF)
    assert (native.crc32(bam_bytes[1000:], native.crc32(bam_bytes[:1000]))
            == (zlib.crc32(bam_bytes) & 0xFFFFFFFF))


def test_bam_decode_columns_matches_numpy(bam_bytes):
    """Native columnar decoder vs the numpy reference path, field by
    field (the numpy path is the correctness oracle)."""
    u = bgzf.decompress(bam_bytes)
    arr = np.frombuffer(u, np.uint8)
    _, off = bammod.decode_header(arr)
    fast = bammod.decode_records(arr, off, threads=2)
    old = native.available
    native.available = lambda: False
    try:
        slow = bammod.decode_records(arr, off)
    finally:
        native.available = old
    for fld in ("tid", "pos", "mapq", "flag", "mtid", "mpos", "tlen",
                "qname", "qname_off", "cigar", "cigar_off", "seq",
                "seq_off", "qual", "aux", "aux_off"):
        assert np.array_equal(getattr(fast, fld), getattr(slow, fld)), fld


def test_bench_depth_matches_ops_depth(bam_bytes):
    """The C++ baseline depth loop must agree with ops.depth on default
    filters (it is the measured 'samtools' stand-in for bench.py)."""
    from samtools_tpu.io.files import read_alignments
    from samtools_tpu.ops import depth as dops
    import samtools_tpu.core.flags as F
    import tempfile, os
    u = bgzf.decompress(bam_bytes)
    arr = np.frombuffer(u, np.uint8)
    hdr, off = bammod.decode_header(arr)
    body = arr[off:]
    batch = bammod.decode_records(arr, off)
    tid0 = int(batch.tid[batch.tid >= 0][0])
    ref_len = hdr.ref_lens[tid0] or int(batch.end_pos().max()) + 1
    for mq in (0, 13):
        depth, cnt = native.bench_depth(body, tid0, ref_len, min_qual=mq)
        keep = ((batch.flag & (F.FUNMAP | F.FSECONDARY | F.FQCFAIL
                               | F.FDUP)) == 0) & (batch.tid == tid0)
        sel = np.nonzero(keep)[0]
        host = dops.depth_window(batch, sel, 0, ref_len, mq, False)
        assert np.array_equal(depth.astype(np.int64), host.astype(np.int64))
