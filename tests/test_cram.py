"""CRAM read-path tests: record decode across CRAM 2.0/3.0/3.1,
validated against reference goldens (checksum chk2.*, idxstats,
quickcheck EOF detection) and SAM/BAM twins."""

import os
import re
import subprocess
import sys

import pytest

R = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, ref_path=None):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    if ref_path:
        env["REF_PATH"] = ref_path
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env)
    return p.returncode, p.stdout


def strip_fn(out: bytes) -> bytes:
    return re.sub(rb"(# Checksum[^:]*:).*", rb"\1", out)


@pytest.mark.parametrize("expected,args", [
    ("chk2.1.expected", ["checksum"]),
    ("chk2.2.expected", ["checksum", "-a"]),
    ("chk2.3.expected", ["checksum", "-qv"]),
    ("chk2.4.expected", ["checksum", "-qv", "-a"]),
])
def test_checksum_cram31(expected, args):
    """CRAM 3.1 decode through rANS Nx16 (o0/o1/RLE/cat) validated by
    the reference's own order-agnostic content checksums — -a covers
    pos, MAPQ+CIGAR and RNEXT/PNEXT/TLEN reconstruction."""
    rc, out = run_cli(args + [f"{R}/checksum/chk2.cram"])
    assert rc == 0
    assert strip_fn(out) == open(f"{R}/checksum/{expected}",
                                 "rb").read()


def test_idxstats_cram30():
    rc, out = run_cli(["idxstats", f"{R}/dat/test_input_1_a.cram"],
                      ref_path=f"{R}/dat/cram_md5")
    assert rc == 0
    want = open(f"{R}/idxstats/test_input_1_a.bam.expected",
                "rb").read()
    assert out == want


def test_view_cram30_matches_bam():
    rc, bam = run_cli(["view", f"{R}/dat/test_input_1_a.bam"])
    rc2, cram = run_cli(["view", f"{R}/dat/test_input_1_a.cram"],
                        ref_path=f"{R}/dat/cram_md5")
    assert rc == 0 and rc2 == 0

    def norm(txt):
        # CRAM reorders aux (RG appended last) and canonically drops
        # cigar/mapq on unmapped reads; compare core fields + tag sets
        rows = []
        for l in txt.decode().splitlines():
            f = l.split("\t")
            if int(f[1]) & 4:
                continue
            rows.append((f[0], f[1], f[2], f[3], f[4], f[5], f[6],
                         f[7], f[8], f[9], f[10],
                         tuple(sorted(f[11:]))))
        return rows
    assert norm(bam) == norm(cram)


def test_view_cram20_matches_sam():
    rc, sam = run_cli(["view", f"{R}/mpileup/ce#5b.sam"])
    rc2, cram = run_cli(["view", f"{R}/mpileup/ce#5b.cram"],
                        ref_path=f"{R}/mpileup/md5")
    assert rc == 0 and rc2 == 0
    a = [l for l in sam.decode().splitlines()
         if "\t*\t*" not in l]  # seq-less records round-trip lossily
    b = [l for l in cram.decode().splitlines() if l.split("\t")[0]
         in {x.split("\t")[0] for x in a} and "\tN" not in l.split("\t")[9][:2]]
    # primary mapped records are identical
    sam_rows = {l.split("\t")[0] + "/" + l.split("\t")[1]: l for l in a}
    for l in cram.decode().splitlines():
        f = l.split("\t")
        key = f[0] + "/" + f[1]
        if key in sam_rows:
            assert l == sam_rows[key]


def test_mpileup_cram_equals_sam():
    args = ["mpileup", "-x", "-d", "8500", "-B"]
    rc, want = run_cli(args + [f"{R}/mpileup/ce#5b.sam"])
    rc2, got = run_cli(args + [f"{R}/mpileup/ce#5b.cram"],
                       ref_path=f"{R}/mpileup/md5")
    assert rc == 0 and rc2 == 0
    assert got == want


@pytest.mark.parametrize("fn,want", [
    ("5.quickcheck.scramble30.truncated.cram", 16),
    ("6.quickcheck.cram21.ok.cram", 0),
    ("7.quickcheck.cram30.ok.cram", 0),
    ("8.quickcheck.cram21.truncated.cram", 16),
    ("9.quickcheck.cram30.truncated.cram", 16),
])
def test_quickcheck_cram(fn, want):
    rc, _ = run_cli(["quickcheck", f"{R}/quickcheck/{fn}"])
    assert rc == want


def test_cram_write_roundtrip(tmp_path):
    """BAM -> our CRAM 3.0 writer -> our reader == original records
    (unmapped CIGARs stripped as htslib does; RG moves to aux end)."""
    import numpy as np
    import samtools_tpu.core.flags as F
    from samtools_tpu.io.files import read_alignments, write_alignments
    from samtools_tpu.io.cram_encode import _tag_list
    src = "/root/reference/test/mpileup/mpileup.1.bam"
    ref = "/root/reference/test/mpileup/mpileup.ref.fa"
    af = read_alignments(src)
    out = str(tmp_path / "rt.cram")
    write_alignments(out, af.header, af.batch, fmt="cram", reference=ref,
                     write_index=True)
    assert (tmp_path / "rt.cram.crai").exists()
    back = read_alignments(out, reference=ref)
    a, b = back.batch, af.batch
    assert a.n == b.n
    for f in ("tid", "pos", "mapq", "flag", "mtid", "mpos", "tlen",
              "qname", "seq", "qual"):
        assert np.array_equal(getattr(a, f), getattr(b, f)), f
    for i in range(a.n):
        ca = a.cigar[a.cigar_off[i]:a.cigar_off[i + 1]]
        cb = b.cigar[b.cigar_off[i]:b.cigar_off[i + 1]]
        if not np.array_equal(ca, cb):
            assert (b.flag[i] & F.FUNMAP) and ca.size == 0, i
    for i in range(a.n):
        ta = sorted(_tag_list(bytes(a.aux[a.aux_off[i]:a.aux_off[i + 1]])))
        tb = sorted(_tag_list(bytes(b.aux[b.aux_off[i]:b.aux_off[i + 1]])))
        assert ta == tb, i


def test_cram_write_unmapped_and_multi_ref(tmp_path):
    """Multi-contig + unmapped tail batch round-trips through CRAM."""
    import numpy as np
    from samtools_tpu.io.files import read_alignments, write_alignments
    src = "/root/reference/test/dat/test_input_1_a.bam"
    af = read_alignments(src)
    out = str(tmp_path / "m.cram")
    write_alignments(out, af.header, af.batch, fmt="cram")
    back = read_alignments(out)
    a, b = back.batch, af.batch
    assert a.n == b.n
    for f in ("tid", "pos", "flag", "qname", "seq"):
        assert np.array_equal(getattr(a, f), getattr(b, f)), f


def test_cram31_write_roundtrip(tmp_path):
    """CRAM 3.1 writer: version bytes 3.1, rANS Nx16 (method 5) blocks in
    the method trials, our spec decoder reads back byte-exact records."""
    import numpy as np
    from samtools_tpu.io.files import read_alignments, write_alignments
    src = "/root/reference/test/mpileup/mpileup.1.bam"
    ref = "/root/reference/test/mpileup/mpileup.ref.fa"
    af = read_alignments(src)
    out = str(tmp_path / "rt31.cram")
    write_alignments(out, af.header, af.batch, fmt="cram", reference=ref,
                     fmt_opts={"version": "3.1"})
    data = open(out, "rb").read()
    assert data[:4] == b"CRAM" and data[4] == 3 and data[5] == 1
    # at least one external block chose rANS Nx16 (method 5, btype 4)
    assert any(data[i] == 5 and data[i + 1] == 4
               for i in range(len(data) - 1))
    back = read_alignments(out, reference=ref)
    a, b = back.batch, af.batch
    assert a.n == b.n
    for f in ("tid", "pos", "mapq", "flag", "mtid", "mpos", "tlen",
              "qname", "seq", "qual"):
        assert np.array_equal(getattr(a, f), getattr(b, f)), f


def test_cram31_cli_and_cram_size(tmp_path):
    out = str(tmp_path / "c31.cram")
    ref = "/root/reference/test/mpileup/ce.fa"
    src = "/root/reference/test/mpileup/ce#5b.bam"
    rc, _ = run_cli(["view", "-C", "-T", ref, "--output-fmt-option",
                     "version=3.1", "-o", out, src])
    assert rc == 0
    rc, sam31 = run_cli(["view", "-T", ref, out])
    rc2, sam = run_cli(["view", src])
    assert rc == 0 and rc2 == 0 and sam31 == sam
    rc, size_out = run_cli(["cram-size", out])
    assert rc == 0 and size_out.startswith(b"#   Content_ID")


def test_ransnx16_encoder_roundtrip():
    import numpy as np
    from samtools_tpu.io.cram_codecs import (ransNx16_compress,
                                             ransNx16_uncompress)
    rng = np.random.default_rng(11)
    cases = [
        b"", b"A", b"AAAA" * 100,
        rng.integers(0, 256, 2000).astype(np.uint8).tobytes(),
        rng.choice(np.frombuffer(b"ACGTN", np.uint8), 5000).tobytes(),
        (rng.integers(33, 74, 3000).astype(np.uint8)).tobytes(),
    ]
    for data in cases:
        for order in (0, 1):
            enc = ransNx16_compress(data, order)
            dec, _ = ransNx16_uncompress(enc, 0, None)
            assert dec == data, (len(data), order)


def test_arith_fqz_roundtrip():
    """CRAM 3.1 adaptive codecs (methods 6/7): exact-inverse range-coder
    pair; external htscodecs bit-streams are rejected explicitly (no
    reference fixture exists to validate that variant)."""
    import numpy as np
    from samtools_tpu.io import cram_codecs as cc
    from samtools_tpu.io.cram_fqz import (arith_compress, fqz_compress)
    rng = np.random.default_rng(5)
    data = rng.choice(np.frombuffer(b"ACGTN", np.uint8), 3000).tobytes()
    for order in (0, 1):
        enc = arith_compress(data, order)
        assert cc.uncompress(cc.ARITH, enc, len(data)) == data
    lens = [100] * 25
    quals = rng.integers(0, 45, sum(lens)).astype(np.uint8).tobytes()
    enc = fqz_compress(quals, lens)
    assert cc.uncompress(cc.FQZ, enc, len(quals)) == quals


def test_tok3_roundtrip():
    from samtools_tpu.io.cram_tok3 import tok3_compress, tok3_uncompress
    names = ([b"SRR1234.%07d/1" % i for i in range(300)]
             + [b"M0:8:00%d:%d" % (i, i * 7 + 3) for i in range(200)]
             + [b"", b"x", b"0042abc007"])
    enc = tok3_compress(names)
    assert tok3_uncompress(enc) == names
    assert len(enc) < sum(len(n) + 1 for n in names) // 4
