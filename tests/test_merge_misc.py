"""merge / dict / faidx / samples / cat golden + behavior tests."""

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
    return p.returncode, p.stdout.decode("latin-1")


def _no_pg(text: str):
    return [l for l in text.splitlines() if not l.startswith("@PG")]


MERGE_CASES = [
    ("2.merge.expected.sam",
     ["-s", "1", "-O", "sam", "-", f"{R}/dat/test_input_1_a.sam",
      f"{R}/dat/test_input_1_b.sam", f"{R}/dat/test_input_1_c.sam"]),
    ("4.merge.expected.sam",
     ["-s", "1", "-O", "sam", "-", f"{R}/dat/test_input_1_b.bam"]),
    ("5.merge.expected.sam",
     ["-r", "-s", "1", "-O", "sam", "-", f"{R}/dat/test_input_1_a.sam",
      f"{R}/dat/test_input_1_b.sam", f"{R}/dat/test_input_1_c.sam"]),
    ("6.merge.expected.sam",
     ["-cp", "-s", "1", "-O", "sam", "-", f"{R}/dat/test_input_1_a.sam",
      f"{R}/dat/test_input_1_b.sam"]),
    ("7.merge.expected.sam",
     ["-s", "1", "-O", "sam", "-", f"{R}/dat/test_input_1_a_regex.sam",
      f"{R}/dat/test_input_1_b_regex.sam"]),
    ("test_no_pg_rg_co.sam",
     ["--no-PG", "-O", "SAM", "-", f"{R}/merge/test_no_pg_rg_co.sam"]),
    ("rg_from_r_mode.expected.sam",
     ["--no-PG", "-r", "-O", "SAM", "-",
      f"{R}/merge/test_no_pg_rg_co.sam"]),
    ("test_template_coordinate.expected.sam",
     ["--no-PG", "-O", "SAM", "--template-coordinate", "-",
      f"{R}/merge/test_template_coordinate.1.sam",
      f"{R}/merge/test_template_coordinate.2.sam"]),
]


@pytest.mark.parametrize("name,args", MERGE_CASES,
                         ids=[c[0] for c in MERGE_CASES])
def test_merge_golden(name, args):
    rc, out = run_cli(["merge"] + args)
    want = open(f"{R}/merge/{name}").read()
    assert rc == 0
    assert _no_pg(out) == _no_pg(want)


def test_merge_bed(tmp_path):
    mb1 = tmp_path / "mb1.bam"
    mb2 = tmp_path / "mb2.bam"
    assert run_cli(["view", "-b", "--no-PG", "-o", str(mb1),
                    f"{R}/merge/merge.bed.1.sam"])[0] == 0
    assert run_cli(["view", "-b", "--no-PG", "-o", str(mb2),
                    f"{R}/merge/merge.bed.2.sam"])[0] == 0
    rc, out = run_cli(["merge", "--no-PG", "-O", "SAM", "-L",
                       f"{R}/merge/merge.bed", "-", str(mb1), str(mb2)])
    want = open(f"{R}/merge/merge.bed.expected.sam").read()
    assert rc == 0
    assert _no_pg(out) == _no_pg(want)


def test_merge_refuses_existing_output(tmp_path):
    out = tmp_path / "x.bam"
    out.write_bytes(b"")
    rc, _ = run_cli(["merge", str(out), f"{R}/dat/test_input_1_a.sam"])
    assert rc != 0


# ------------------------------------------------------------------- dict

def test_dict_ce():
    rc, out = run_cli(["dict", f"{R}/mpileup/ce.fa"])
    assert rc == 0
    lines = out.splitlines()
    assert lines[0] == "@HD\tVN:1.0\tSO:unsorted"
    assert lines[1].startswith("@SQ\tSN:CHROMOSOME_I\tLN:1009800\tM5:")


# ------------------------------------------------------------------ faidx

def test_faidx_index_and_fetch(tmp_path):
    import shutil
    fa = tmp_path / "ce.fa"
    shutil.copy(f"{R}/mpileup/ce.fa", fa)
    rc, _ = run_cli(["faidx", str(fa)])
    assert rc == 0
    assert (tmp_path / "ce.fa.fai").exists()
    first = (tmp_path / "ce.fa.fai").read_text().splitlines()[0].split("\t")
    assert first[0] == "CHROMOSOME_I" and first[1] == "1009800"
    rc, out = run_cli(["faidx", str(fa), "CHROMOSOME_I:1-10"])
    assert rc == 0
    assert out.splitlines()[0] == ">CHROMOSOME_I:1-10"
    assert len(out.splitlines()[1]) == 10


# ---------------------------------------------------------------- samples

def test_samples():
    rc, out = run_cli(["samples", f"{R}/mpileup/mpileup.1.bam"])
    assert rc == 0
    rows = out.splitlines()
    assert all("\t" in r for r in rows)
    assert any(r.split("\t")[0] != "." for r in rows)


# -------------------------------------------------------------------- cat

def test_cat(tmp_path):
    out = tmp_path / "cat.bam"
    rc, _ = run_cli(["cat", "-o", str(out), f"{R}/dat/test_input_1_a.bam",
                     f"{R}/dat/test_input_1_a.bam"])
    assert rc == 0
    rc, n1 = run_cli(["view", "-c", f"{R}/dat/test_input_1_a.bam"])
    rc2, n2 = run_cli(["view", "-c", str(out)])
    assert rc == rc2 == 0
    assert int(n2) == 2 * int(n1)


def test_cat_splice_preserves_records(tmp_path):
    """The zero-decode splice output decodes to exactly the concatenated
    record streams (bam_cat.c:700 parity model)."""
    import numpy as np
    from samtools_tpu.core.batch import ReadBatch
    from samtools_tpu.io.files import read_alignments
    p1 = "/root/reference/test/mpileup/mpileup.1.bam"
    p2 = "/root/reference/test/mpileup/mpileup.2.bam"
    out = tmp_path / "spliced.bam"
    rc, _ = run_cli(["cat", "--no-PG", "-o", str(out), p1, p2])
    assert rc == 0
    got = read_alignments(str(out)).batch
    want = ReadBatch.concat([read_alignments(p1).batch,
                             read_alignments(p2).batch])
    assert got.n == want.n
    for f in ("tid", "pos", "mapq", "flag", "mtid", "mpos", "tlen",
              "qname", "cigar", "seq", "qual", "aux"):
        assert np.array_equal(getattr(got, f), getattr(want, f)), f
    # splice really happened: the compressed record blocks of input 1
    # appear verbatim inside the output
    raw_in = open(p1, "rb").read()
    raw_out = open(out, "rb").read()
    probe = raw_in[len(raw_in) // 2: len(raw_in) // 2 + 200]
    assert probe in raw_out
