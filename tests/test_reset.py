"""samtools reset golden tests (reference test.pl:test_reset).

Expected files were saved with hskip/ignore_pg (no @HD/@PG lines), so
comparisons strip those from both sides."""

import os
import subprocess
import sys

import pytest

R = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, stdin=None):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env, input=stdin)
    return p.returncode, p.stdout


def norm(text: str):
    return [l for l in text.splitlines()
            if not l.startswith(("@PG", "@HD"))]


def test_reset_view_roundtrip():
    rc, out = run_cli(["reset", "--dupflag", f"{R}/dat/mpileup.1.sam"])
    assert rc == 0
    rc, view = run_cli(["view", "-"], stdin=out)
    assert rc == 0
    want = open(f"{R}/reset/basic.1.mp.1.expected", "rb").read()
    assert view == want


CASES = [
    ("basic.output.mp.1.expected",
     ["--dupflag", f"{R}/dat/mpileup.1.sam"]),
    ("basic.bam.input.expected",
     ["--dupflag", f"{R}/dat/test_input_1_a.bam"]),
    ("output.nRG.1.expected",
     ["--dupflag", "--reject-PG", "bwa_index", f"{R}/dat/mpileup.1.sam",
      "--no-RG"]),
    ("output.nRG.2.expected",
     ["--dupflag", "--reject-PG", "bwa_index", f"{R}/dat/mpileup.1.sam",
      "--no-RG", "--keep-tag", "RG"]),
    ("output.keep.1.expected",
     ["--dupflag", "--reject-PG", "bwa_index", f"{R}/dat/mpileup.1.sam",
      "--no-RG", "--keep-tag", "X0,MD"]),
    ("output.keep.1.expected",
     ["--dupflag", "--reject-PG", "bwa_index", f"{R}/dat/mpileup.1.sam",
      "--no-RG", "--remove-tag", "X0,X1,MD", "--keep-tag", "X0,MD"]),
    ("output.keep.2.expected",
     ["--dupflag", "--reject-PG", "bwa_index", f"{R}/dat/mpileup.1.sam",
      "--no-RG", "--remove-tag", "X0,X1,MD"]),
    ("output.keep.2.expected",
     ["--dupflag", "--reject-PG", "bwa_index", f"{R}/dat/mpileup.1.sam",
      "--no-RG", "-x", "X0,X1,MD"]),
    ("output.keep.3.expected",
     ["--dupflag", "--reject-PG", "bwa_index", f"{R}/dat/mpileup.1.sam",
      "--no-RG", "--remove-tag", "^X0,MD", "--keep-tag", "X1"]),
    ("output.flg.1.expected", ["--dupflag", f"{R}/reset/seq.sam"]),
    ("output.flg.2.expected", [f"{R}/reset/seq.sam"]),
]


@pytest.mark.parametrize("expected,args", CASES,
                         ids=[str(i) for i in range(len(CASES))])
def test_reset_golden(tmp_path, expected, args):
    out = tmp_path / "out.sam"
    rc, _ = run_cli(["reset"] + args + ["-o", str(out)])
    assert rc == 0
    want = open(f"{R}/reset/{expected}").read()
    assert norm(out.read_text()) == norm(want)


def test_reset_reject_pg_first():
    rc, _ = run_cli(["reset", "--dupflag", "--reject-PG", "bwa_index",
                     f"{R}/dat/mpileup.1.sam", "-o", "/dev/null"])
    assert rc == 0


def test_reset_reject_pg_counts(tmp_path):
    """reject.1/reject.2 goldens (test.pl:4054-4057): the @PG entry is
    added per PG-chain end (htslib sam_hdr_add_pg), so the merged
    mpileup.1 header's 39 parallel chains yield 39 samtools entries —
    80 = 41 kept + 39."""
    out = tmp_path / "o.sam"
    rc, _ = run_cli(["reset", "--dupflag", "--reject-PG",
                     "sam_to_fixed_bam", f"{R}/dat/mpileup.1.sam",
                     "-o", str(out)])
    assert rc == 0
    n = sum(1 for l in out.read_text().splitlines()
            if l.startswith("@PG\tID:"))
    assert n == int(open(f"{R}/reset/reject.2.expected").read())
    rc, _ = run_cli(["reset", "--dupflag", "--reject-PG", "bwa_index",
                     f"{R}/dat/mpileup.1.sam", "-o", str(out)])
    assert rc == 0
    n = sum(1 for l in out.read_text().splitlines()
            if l.startswith("@PG\tID:samtools\tPN:samtools"))
    assert n == int(open(f"{R}/reset/reject.1.expected").read())
