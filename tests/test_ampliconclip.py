"""samtools ampliconclip golden tests (reference
test.pl:test_ampliconclip, /root/reference/test/test.pl:3989-4022)."""

import os
import subprocess
import sys

import pytest

A = "/root/reference/test/ampliconclip"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, stdin=None):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env, input=stdin)
    return p.returncode, p.stdout


CASES = [
    ("1_soft_clipped.expected.sam",
     ["--no-PG", "--keep-tag", "--output-fmt=sam", "-b",
      f"{A}/ac_test.bed", f"{A}/1_test_data.sam"]),
    ("1_hard_clipped.expected.sam",
     ["--no-PG", "--keep-tag", "--output-fmt=sam", "--hard-clip", "-b",
      f"{A}/ac_test.bed", f"{A}/1_test_data.sam"]),
    ("1_soft_clipped_strand.expected.sam",
     ["--no-PG", "--keep-tag", "--output-fmt=sam", "--strand", "-b",
      f"{A}/ac_test.bed", f"{A}/1_test_data.sam"]),
    ("1_filter.expected.sam",
     ["--no-PG", "--keep-tag", "--output-fmt=sam", "--strand",
      "--filter-len", "185", "-b", f"{A}/ac_test.bed",
      f"{A}/1_test_data.sam"]),
    ("1_fail.expected.sam",
     ["--no-PG", "--keep-tag", "--output-fmt=sam", "--strand",
      "--fail-len", "185", "-b", f"{A}/ac_test.bed",
      f"{A}/1_test_data.sam"]),
    ("1_original_tag.expected.sam",
     ["--no-PG", "--keep-tag", "--output-fmt=sam", "--original", "-b",
      f"{A}/ac_test.bed", f"{A}/1_test_data.sam"]),
    ("1_delete_tag.expected.sam",
     ["--no-PG", "--output-fmt=sam", "-b", f"{A}/ac_test.bed",
      f"{A}/1_test_data.sam"]),
    ("2_both_clipped.expected.sam",
     ["--no-PG", "--keep-tag", "--output-fmt=sam", "--strand",
      "--both-ends", "-b", f"{A}/ac_test.bed",
      f"{A}/2_both_test_data.sam"]),
    ("3_multi_ref_clip.expected.sam",
     ["--no-PG", "--output-fmt=sam", "--keep-tag", "-b",
      f"{A}/multi_ref.bed", f"{A}/3_multi_ref_data.sam"]),
    ("4_total_hc_data.expected.sam",
     ["--no-PG", "--output-fmt=sam", "--hard-clip", "-b",
      f"{A}/ac_test2.bed", f"{A}/4_total_hc_data.sam"]),
]


@pytest.mark.parametrize("expected,args", CASES,
                         ids=[c[0] for c in CASES])
def test_ampliconclip_golden(expected, args):
    rc, out = run_cli(["ampliconclip"] + args)
    assert rc == 0
    assert out == open(f"{A}/{expected}", "rb").read()


PC_CASES = [
    ("1_soft_clipped_primer_counts.expected.tsv", []),
    ("1_soft_clipped_strand_primer_counts.expected.tsv", ["--strand"]),
]


@pytest.mark.parametrize("expected,extra", PC_CASES,
                         ids=[c[0] for c in PC_CASES])
def test_ampliconclip_primer_counts(tmp_path, expected, extra):
    pc = f"{tmp_path}/pc.tsv"
    rc, _ = run_cli(["ampliconclip", "--no-PG", "--keep-tag",
                     "--output-fmt=sam", "--primer-counts", pc]
                    + extra + ["-b", f"{A}/ac_test.bed",
                               f"{A}/1_test_data.sam"])
    assert rc == 0
    assert open(pc, "rb").read() == open(f"{A}/{expected}", "rb").read()


def test_ampliconclip_multi_ref_primer_counts(tmp_path):
    pc = f"{tmp_path}/pc.tsv"
    rc, _ = run_cli(["ampliconclip", "--no-PG", "--output-fmt=sam",
                     "--keep-tag", "--primer-counts", pc, "-b",
                     f"{A}/multi_ref.bed", f"{A}/3_multi_ref_data.sam"])
    assert rc == 0
    want = open(f"{A}/3_multi_ref_data_primer_counts.expected.tsv",
                "rb").read()
    assert open(pc, "rb").read() == want
