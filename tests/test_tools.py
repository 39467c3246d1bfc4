"""Tool-level tests: CLI outputs vs reference expected files and internal
oracles (device kernel vs numpy reference)."""

import contextlib
import glob
import io
import os

import numpy as np
import pytest

from samtools_tpu.io.files import read_alignments
from samtools_tpu.ops import flagstat as fsops
from samtools_tpu.ops.filters import glibc_rand_first, fnv1a_hash_bytes
from samtools_tpu.tools.flags_cmd import flag2str, str2flag

REF = "/root/reference"


def run_tool(fn, argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = fn(argv)
    return rc, buf.getvalue()


# ------------------------------------------------------------------ flags

def test_flags_roundtrip():
    from samtools_tpu.tools.flags_cmd import main_flags
    rc, out = run_tool(main_flags, ["99", "0x63", "PAIRED,UNMAP"])
    assert rc == 0
    assert out.splitlines() == [
        "0x63\t99\tPAIRED,PROPER_PAIR,MREVERSE,READ1",
        "0x63\t99\tPAIRED,PROPER_PAIR,MREVERSE,READ1",
        "0x5\t5\tPAIRED,UNMAP",
    ]
    assert str2flag(flag2str(0xFFF)) == 0xFFF


# --------------------------------------------------------------- flagstat

@pytest.mark.parametrize("bam", sorted(
    glob.glob(f"{REF}/test/mpileup/*.bam"))[:4] + [
        f"{REF}/test/dat/test_input_1_a.bam"])
def test_flagstat_device_matches_numpy(bam):
    f = read_alignments(bam)
    dev = fsops.flagstat_counts(f.batch)
    ref = fsops.flagstat_numpy(f.batch)
    assert dev == ref


def test_flagstat_ex1():
    f = read_alignments(f"{REF}/examples/ex1.sam.gz")
    s = fsops.flagstat_numpy(f.batch)
    assert s["n_reads"] == (3307, 0)
    assert s["n_mapped"][0] + sum(
        1 for _ in ()) <= 3307


# --------------------------------------------------------------- idxstats

def test_idxstats_slow_matches_expected(capsys):
    from samtools_tpu.tools.idxstats_cmd import main_idxstats
    rc = main_idxstats([f"{REF}/test/dat/test_input_1_a.bam"])
    out = capsys.readouterr().out
    want = open(f"{REF}/test/idxstats/test_input_1_a.bam.expected").read()
    assert rc == 0 and out == want


def test_idxstats_index_path_matches_expected(tmp_path, capsys):
    import shutil
    from samtools_tpu.tools.idxstats_cmd import main_idxstats
    from samtools_tpu.tools.index_cmd import main_index
    bam = tmp_path / "a.bam"
    shutil.copy(f"{REF}/test/dat/test_input_1_a.bam", bam)
    assert main_index([str(bam)]) == 0
    assert (tmp_path / "a.bam.bai").exists()
    rc = main_idxstats([str(bam)])
    out = capsys.readouterr().out
    want = open(f"{REF}/test/idxstats/test_input_1_a.bam.expected").read()
    assert rc == 0 and out == want


# ------------------------------------------------------------------- view

def test_view_count_and_filters(capsys):
    from samtools_tpu.tools.view_cmd import main_view
    assert main_view(["-c", f"{REF}/examples/toy.sam"]) == 0
    assert capsys.readouterr().out.strip() == "12"
    assert main_view(["-c", "-f", "16", f"{REF}/examples/toy.sam"]) == 0
    assert capsys.readouterr().out.strip() == "2"
    # region query
    assert main_view(["-c", f"{REF}/examples/toy.sam", "ref2"]) == 0
    assert capsys.readouterr().out.strip() == "6"


def test_view_bam_roundtrip(tmp_path, capsys):
    from samtools_tpu.tools.view_cmd import main_view
    out = tmp_path / "toy.bam"
    assert main_view(["-b", "--no-PG", "-o", str(out),
                      f"{REF}/examples/toy.sam"]) == 0
    capsys.readouterr()
    assert main_view(["--no-PG", str(out)]) == 0
    got = capsys.readouterr().out
    want_lines = []
    for line in open(f"{REF}/examples/toy.sam"):
        if not line.startswith("@"):
            f = line.rstrip("\n").split("\t")
            f[9] = f[9].upper()
            want_lines.append("\t".join(f))
    assert got.splitlines() == want_lines


def test_view_expr(capsys):
    from samtools_tpu.tools.view_cmd import main_view
    assert main_view(["-c", "-e", "mapq >= 30",
                      f"{REF}/examples/toy.sam"]) == 0
    n_expr = int(capsys.readouterr().out)
    assert main_view(["-c", "-q", "30", f"{REF}/examples/toy.sam"]) == 0
    n_q = int(capsys.readouterr().out)
    assert n_expr == n_q > 0


# ------------------------------------------------------------ hash parity

def test_glibc_rand_known_values():
    # reference values from glibc srand(); rand()
    assert glibc_rand_first(42) == 71876166
    assert glibc_rand_first(1) == 1804289383
    assert glibc_rand_first(12345) == 383100999


def test_fnv1a():
    # FNV-1a 32-bit of empty string is the offset basis
    assert fnv1a_hash_bytes(b"") == 0x811C9DC5


# ------------------------------------------------------------- quickcheck

def test_quickcheck(tmp_path):
    from samtools_tpu.tools.quickcheck_cmd import main_quickcheck
    good = f"{REF}/test/dat/test_input_1_a.bam"
    assert main_quickcheck([good]) == 0
    bad = tmp_path / "trunc.bam"
    data = open(good, "rb").read()
    bad.write_bytes(data[:len(data) - 28 - 3])  # strip EOF block
    assert main_quickcheck(["-q", str(bad)]) != 0


def test_ace2sam_basic(tmp_path):
    """ACE -> SAM converter (misc/ace2sam.c behavior): pad flattening
    to M/D/I with surplus-P squeeze, padded mode, -c consensus line."""
    ace = tmp_path / "t.ace"
    ace.write_text(
        "AS 1 2\n\nCO ctg1 7 2 1 U\nCATG*AT\n\nBQ\n20 20 20 20 20 20\n"
        "\nAF read1 U 1\nAF read2 U 2\n\nRD read1 7 0 0\nCAT**AT\n\n"
        "QA 1 7 1 7\n\nRD read2 5 0 0\nATGCA\n\nQA 1 5 1 5\n")
    from samtools_tpu.tools.ace2sam_cmd import main_ace2sam
    rc, out = run_tool(main_ace2sam, ["-c", str(ace)])
    assert rc == 0
    lines = [l.split("\t") for l in out.splitlines()]
    assert lines[0][1] == "516" and lines[0][5] == "6M"
    assert lines[1][0] == "read1" and lines[1][5] == "3M1D2M"
    assert lines[2][0] == "read2" and lines[2][5] == "3M1I1M"
    rc, out = run_tool(main_ace2sam, ["-p", str(ace)])
    assert rc == 0
    lines = [l.split("\t") for l in out.splitlines()]
    assert lines[0][5] == "3M2D2M"
    assert lines[1][5] == "5M"
