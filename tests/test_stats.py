"""samtools stats golden parity tests (reference test.pl:3394-3441)."""

import os
import shutil
import subprocess
import sys

import pytest

R = "/root/reference/test"
S = f"{R}/stat"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd=None):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env, cwd=cwd)
    return p.returncode, p.stdout.decode("latin-1")


def tail4(text: str) -> str:
    return "\n".join(text.split("\n")[3:])


CASES = [
    ("1.stats.expected", ["-r", f"{S}/test.fa", f"{S}/1_map_cigar.sam"]),
    ("1.stats.large.expected", [f"{S}/1_map_cigar_large.sam"]),
    ("2.stats.expected",
     ["-r", f"{S}/test.fa", f"{S}/2_equal_cigar_full_seq.sam"]),
    ("2.stats.large.expected", [f"{S}/2_equal_cigar_full_seq_large.sam"]),
    ("3.stats.expected",
     ["-r", f"{S}/test.fa", f"{S}/3_map_cigar_equal_seq.sam"]),
    ("3.stats.large.expected", [f"{S}/3_map_cigar_equal_seq_large.sam"]),
    ("4.stats.expected",
     ["-r", f"{S}/test.fa", f"{S}/4_X_cigar_full_seq.sam"]),
    ("4.stats.large.expected", [f"{S}/4_X_cigar_full_seq_large.sam"]),
    ("5.stats.expected", ["-r", f"{S}/test.fa", f"{S}/5_insert_cigar.sam"]),
    ("5.stats.large.expected", [f"{S}/5_insert_cigar_large.sam"]),
    ("6.stats.expected",
     ["-r", f"{S}/test.fa", "-i", "0", f"{S}/5_insert_cigar.sam"]),
    ("7.stats.expected", ["-r", f"{S}/test.fa", f"{S}/7_supp.sam"]),
    ("7.stats.large.expected", [f"{S}/7_supp_large.sam"]),
    ("8.stats.expected", ["-r", f"{S}/test.fa", f"{S}/8_secondary.sam"]),
    ("8.stats.large.expected", [f"{S}/8_secondary_large.sam"]),
    ("11.stats.expected",
     ["-t", f"{S}/11.stats.targets", f"{S}/11_target.sam"]),
    ("11.stats.expected",
     [f"{S}/11_target.bam", "ref1:10-24", "ref1:30-46", "ref1:39-56"]),
    ("11.stats.g4.expected",
     ["-g", "4", "-t", f"{S}/11.stats.targets", f"{S}/11_target.sam"]),
    ("11.stats.g4.expected",
     ["-g", "4", f"{S}/11_target.bam", "ref1:10-24", "ref1:30-46",
      "ref1:39-56"]),
    ("12.3reads.overlap.expected",
     [f"{S}/12_overlaps.bam", "-t", f"{S}/12_3reads.bed"]),
    ("12.3reads.nooverlap.expected",
     [f"{S}/12_overlaps.bam", "-p", "-t", f"{S}/12_3reads.bed"]),
    ("12.2reads.overlap.expected",
     [f"{S}/12_overlaps.bam", "-t", f"{S}/12_2reads.bed"]),
    ("12.2reads.nooverlap.expected",
     [f"{S}/12_overlaps.bam", "-p", "-t", f"{S}/12_2reads.bed"]),
    ("13.barcodes.bc.ok.expected", [f"{S}/13_barcodes_ok.sam"]),
    ("13.barcodes.ox.ok.expected", [f"{S}/13_barcodes_ok_ox_bz.sam"]),
    ("14.rg.s1.expected", ["-I", "s1", f"{S}/11_target.bam"]),
    ("14.rg.grp2.expected", ["-I", "grp2", f"{S}/11_target.bam"]),
    ("14.rg.grp3.expected", ["-I", "grp3", f"{S}/11_target.bam"]),
    ("14.rg.Sample.expected", ["-I", "Sample", f"{S}/11_target.bam"]),
    ("15.stats.expected",
     ["-r", f"{R}/mpileup/ce.fa", f"{S}/15.big_del.sam"]),
]


@pytest.mark.parametrize("expected,args", CASES,
                         ids=[f"{i}-{c[0]}" for i, c in enumerate(CASES)])
def test_stats_golden(expected, args):
    rc, out = run_cli(["stats"] + args)
    assert rc == 0
    want = open(f"{S}/{expected}").read()
    assert tail4(out) == want


RFS_CASES = [
    ("16.stats.expected", ["--ref-stats", f"{S}/11_target.sam"]),
    ("17.stats.expected",
     ["--ref-stats", f"{S}/11_target.sam", "-r", f"{S}/test1.fa"]),
    ("17.stats.expected",
     ["--ref-stats", "--ref-stats-chunk", "-1", f"{S}/11_target.sam",
      "-r", f"{S}/test1.fa"]),
    ("18.stats.expected",
     ["--ref-stats", f"{S}/11_target.bam", "-r", f"{S}/test1.fa",
      "alpha:10-20"]),
]


@pytest.mark.parametrize("expected,args", RFS_CASES,
                         ids=[c[0] + ("-chunk" if "--ref-stats-chunk"
                                      in c[1] else "")
                              for c in RFS_CASES])
def test_stats_refstats(expected, args):
    rc, out = run_cli(["stats"] + args)
    assert rc == 0
    got = "\n".join(l for l in out.split("\n") if l.startswith("RFS"))
    want = open(f"{S}/{expected}").read().rstrip("\n")
    assert got == want


@pytest.mark.parametrize("sam,splits", [
    ("1_map_cigar.sam", ["s1_a_1"]),
    ("10_map_cigar.sam", ["s1_a_1", "s1_b_1"]),
])
def test_stats_split(tmp_path, sam, splits):
    shutil.copy(f"{S}/{sam}", tmp_path / sam)
    shutil.copy(f"{S}/test.fa", tmp_path / "test.fa")
    if os.path.exists(f"{S}/test.fa.fai"):
        shutil.copy(f"{S}/test.fa.fai", tmp_path / "test.fa.fai")
    rc, out = run_cli(["stats", "-S", "RG", "-r", "test.fa", sam],
                      cwd=str(tmp_path))
    assert rc == 0
    exp_main = "9.stats.expected" if sam == "1_map_cigar.sam" \
        else "10.stats.expected"
    assert tail4(out) == open(f"{S}/{exp_main}").read()
    for sp in splits:
        got = (tmp_path / f"{sam}_{sp}.bamstat").read_text()
        want = open(f"{S}/{sam}_{sp}.expected.bamstat").read()
        assert tail4(got) == want
