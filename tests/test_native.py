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
        assert got == u_py


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
            assert back == u


def test_bgzf_deflate_empty():
    comp = native.bgzf_deflate(b"", 6, 0xFF00, 1)
    c, b, isz = native.bgzf_scan(comp)
    assert c.size == 1 and int(isz.sum()) == 0
    assert native.bgzf_inflate(comp, c, b, 0, 1) == b""


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
