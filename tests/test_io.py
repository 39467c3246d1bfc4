"""I/O layer tests: SAM/BAM round trips against the reference fixtures."""

import glob
import gzip
import os

import numpy as np
import pytest

from samtools_tpu.io import bgzf
from samtools_tpu.io.bam import (decode_header, decode_records, encode_header,
                                 encode_records, read_bam)
from samtools_tpu.io.files import read_alignments
from samtools_tpu.io.sam_text import format_records, parse_sam


def _norm_sam_body(text: str) -> list[str]:
    return [l for l in text.split("\n") if l and not l.startswith("@")]


def _upper_seq(text: str) -> str:
    """samtools (via the nt16 table) uppercases SEQ on round trip; normalize
    the expectation the same way."""
    out = []
    for line in text.split("\n"):
        if line and not line.startswith("@"):
            f = line.split("\t")
            if len(f) > 9:
                f[9] = f[9].upper()
            line = "\t".join(f)
        out.append(line)
    return "\n".join(out)


def test_bgzf_roundtrip():
    data = os.urandom(300000) + b"tail"
    comp = bgzf.compress(data, threads=2)
    assert bgzf.is_bgzf(comp)
    assert bgzf.decompress(comp, threads=2) == data
    assert comp.endswith(bgzf.BGZF_EOF)


def test_toy_sam_roundtrip(ref_dir):
    path = os.path.join(ref_dir, "examples", "toy.sam")
    text = open(path).read()
    header, batch = parse_sam(text)
    assert header.ref_names == ["ref", "ref2"]
    assert batch.n == 12
    out = header.text + format_records(header, batch)
    assert out == _upper_seq(text)


def test_toy_sam_bam_roundtrip(ref_dir):
    path = os.path.join(ref_dir, "examples", "toy.sam")
    text = open(path).read()
    header, batch = parse_sam(text)
    raw = encode_header(header) + encode_records(batch)
    arr = np.frombuffer(raw, np.uint8)
    h2, off = decode_header(arr)
    b2 = decode_records(arr, off)
    assert h2.ref_names == header.ref_names
    out = h2.text + format_records(h2, b2)
    assert out == _upper_seq(text)


def test_ex1_sam_gz_parse(ref_dir):
    path = os.path.join(ref_dir, "examples", "ex1.sam.gz")
    text = gzip.open(path, "rt").read()
    f = read_alignments(path)
    assert f.batch.n == len(_norm_sam_body(text)) == 3307
    assert f.header.ref_names == ["seq1", "seq2"]


@pytest.mark.parametrize("bam", sorted(
    glob.glob("/root/reference/test/mpileup/*.bam"))[:6])
def test_reference_bams_decode_and_reencode(bam):
    f = read_bam(bam)
    assert f.batch.n >= 1
    # re-encode records and re-decode: must be identical columns
    raw = encode_header(f.header) + encode_records(f.batch)
    arr = np.frombuffer(raw, np.uint8)
    h2, off = decode_header(arr)
    b2 = decode_records(arr, off)
    assert b2.n == f.batch.n
    np.testing.assert_array_equal(b2.pos, f.batch.pos)
    np.testing.assert_array_equal(b2.flag, f.batch.flag)
    np.testing.assert_array_equal(b2.cigar, f.batch.cigar)
    np.testing.assert_array_equal(b2.seq, f.batch.seq)
    np.testing.assert_array_equal(b2.qual, f.batch.qual)
    np.testing.assert_array_equal(b2.aux, f.batch.aux)
    np.testing.assert_array_equal(b2.qname, f.batch.qname)


def test_dat_sams_roundtrip(ref_dir):
    pats = sorted(glob.glob(os.path.join(ref_dir, "test", "dat", "*.sam")))
    tested = 0
    for p in pats[:20]:
        text = open(p).read()
        try:
            header, batch = parse_sam(text)
        except Exception:
            continue  # some dat fixtures are intentionally malformed
        got = header.text + format_records(header, batch)
        want_lines = [l for l in _upper_seq(text).split("\n") if l]
        got_lines = [l for l in got.split("\n") if l]
        assert got_lines == want_lines, p
        tested += 1
    assert tested >= 5


def test_take_and_concat(ref_dir):
    path = os.path.join(ref_dir, "examples", "toy.sam")
    header, batch = parse_sam(open(path).read())
    sub = batch.take(np.array([3, 0, 5]))
    assert sub.n == 3
    assert sub.qname_str(0) == batch.qname_str(3)
    assert sub.qname_str(1) == batch.qname_str(0)
    np.testing.assert_array_equal(sub.cigar_of(2), batch.cigar_of(5))
    from samtools_tpu.core.batch import ReadBatch
    cat = ReadBatch.concat([sub, batch])
    assert cat.n == batch.n + 3
    assert cat.qname_str(3) == batch.qname_str(0)


def test_http_url_input(tmp_path):
    """hfile analog: http:// inputs fetch through the URL cache and flow
    into the normal readers (served from a local http.server)."""
    import http.server
    import os
    import socketserver
    import subprocess
    import sys
    import threading

    src = "/root/reference/test/mpileup/mpileup.1.bam"
    serve = tmp_path / "www"
    serve.mkdir()
    (serve / "in.bam").write_bytes(open(src, "rb").read())

    class H(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **k):
            super().__init__(*a, directory=str(serve), **k)

        def log_message(self, *a):
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), H) as httpd:
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            repo = os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))
            env = dict(os.environ, PYTHONPATH=repo,
                       SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
                       SAMTPU_CACHE=str(tmp_path / "cache"))
            url = "http://127.0.0.1:%d/in.bam" % port
            p1 = subprocess.run(
                [sys.executable, "-m", "samtools_tpu", "flagstat", url],
                capture_output=True, env=env)
            p2 = subprocess.run(
                [sys.executable, "-m", "samtools_tpu", "flagstat", src],
                capture_output=True, env=env)
            assert p1.returncode == 0 and p1.stdout == p2.stdout
            # cached: second run hits the local copy
            p3 = subprocess.run(
                [sys.executable, "-m", "samtools_tpu", "view", "-c",
                 url], capture_output=True, env=env)
            assert p3.returncode == 0 and p3.stdout.strip() == b"569"
        finally:
            httpd.shutdown()
