"""samtools fastq/fasta golden parity tests (reference
test.pl:test_bam2fq)."""

import os
import subprocess
import sys

import pytest

R = "/root/reference/test"
D = f"{R}/dat"
B = f"{R}/bam2fq"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env, cwd=cwd)
    return p.returncode, p.stdout.decode("latin-1")


# (stdout_expected | None, {outfile: expected}, args)
CASES = [
    (None, {"1.fq": "1.1.fq.expected", "2.fq": "1.2.fq.expected"},
     ["-1", "1.fq", "-2", "2.fq", f"{D}/bam2fq.001.sam"]),
    (None, {"1.fq": "2.1.fq.expected", "2.fq": "2.2.fq.expected",
            "s.fq": "2.s.fq.expected"},
     ["-s", "s.fq", "-1", "1.fq", "-2", "2.fq", f"{D}/bam2fq.001.sam"]),
    (None, {"1.fq": "3.1.fq.expected", "2.fq": "3.2.fq.expected",
            "s.fq": "3.s.fq.expected"},
     ["-s", "s.fq", "-1", "1.fq", "-2", "2.fq", f"{D}/bam2fq.002.sam"]),
    (None, {"1.fq": "4.1.fq.expected", "2.fq": "4.2.fq.expected",
            "s.fq": "4.s.fq.expected"},
     ["-s", "s.fq", "-1", "1.fq", "-2", "2.fq", f"{D}/bam2fq.003.sam"]),
    (None, {"1.fq": "4.1.fq.expected", "bc.fq": "bc.fq.expected"},
     ["--barcode-tag", "BC", "--index-format", "n2i2", "--i1", "bc.fq",
      "-s", "s.fq", "-1", "1.fq", "-2", "2.fq", f"{D}/bam2fq.004.sam"]),
    (None, {"1.fq": "10.1.fq.expected", "2.fq": "10.2.fq.expected",
            "s.fq": "10.s.fq.expected", "bc.fq": "bc10.fq.expected"},
     ["--barcode-tag", "BC", "-O", "--index-format", "n2i2", "--i1",
      "bc.fq", "-s", "s.fq", "-1", "1.fq", "-2", "2.fq",
      f"{D}/bam2fq.010.sam"]),
    (None, {"1.fq": "5.1.fq.expected", "2.fq": "5.2.fq.expected",
            "s.fq": "5.s.fq.expected",
            "bc_split.fq": "bc_split.fq.expected"},
     ["--barcode-tag", "BC", "-N", "--index-format", "n*i*", "--i1",
      "bc_split.fq", "-s", "s.fq", "-1", "1.fq", "-2", "2.fq",
      f"{D}/bam2fq.005.sam"]),
    (None, {"1.fq": "6.1.fq.expected", "2.fq": "6.2.fq.expected",
            "s.fq": "6.s.fq.expected"},
     ["-N", "-t", "-s", "s.fq", "-1", "1.fq", "-2", "2.fq",
      f"{D}/bam2fq.005.sam"]),
    (None, {"1.fq": "7.1.fq.expected", "2.fq": "7.2.fq.expected",
            "s.fq": "7.s.fq.expected"},
     ["-N", "-t", "-T", "MD,ia", "-s", "s.fq", "-1", "1.fq", "-2",
      "2.fq", f"{D}/bam2fq.005.sam"]),
    (None, {"1.fq": "8.1.fq.expected", "2.fq": "8.2.fq.expected",
            "s.fq": "8.s.fq.expected", "i.fq": "8.i.fq.expected"},
     ["--barcode-tag", "BC", "-i", "--index-format", "n2i2", "--i1",
      "i.fq", "-s", "s.fq", "-1", "1.fq", "-2", "2.fq",
      f"{D}/bam2fq.004.sam"]),
    (None, {"1.fq": "12.1.fq.expected", "2.fq": "12.2.fq.expected",
            "s.fq": "12.s.fq.expected", "i.fq": "12.i.fq.expected"},
     ["--barcode-tag", "BC", "-i", "--index-format", "i*i*", "--i1",
      "i.fq", "-s", "s.fq", "-1", "1.fq", "-2", "2.fq",
      f"{D}/bam2fq.005.sam"]),
    (None, {"1.fq": "9.1.fq.expected", "2.fq": "9.2.fq.expected"},
     ["-1", "1.fq", "-2", "2.fq", f"{D}/bam2fq.703.sam"]),
    (None, {"o.fq": "11.fq.expected"},
     ["-N", "-1", "o.fq", "-2", "o.fq", f"{D}/bam2fq.001.sam"]),
    (None, {"o.fq": "11.fq.expected"},
     ["-N", "-o", "o.fq", f"{D}/bam2fq.001.sam"]),
    ("11.fq.expected", {},
     ["-N", "-s", "ds.fq", "-0", "d0.fq", f"{D}/bam2fq.001.sam"]),
    ("13.fq.expected", {},
     ["-T", "ba,bb,bc,bd,be,bf,bg", f"{D}/bam2fq.013.sam"]),
    (None, {"0.fq": "14.0.fq.expected", "i1.fq": "14.i1.fq.expected",
            "i2.fq": "14.i2.fq.expected"},
     ["--index-format", "i8n1i8", "--i1", "i1.fq", "--i2", "i2.fq",
      "-0", "0.fq", f"{D}/bam2fq.014.sam"]),
    ("15.fq.expected", {}, ["-N", "-T", "", f"{D}/bam2fq.001.sam"]),
    ("15.fq.expected", {}, ["-N", "-t", "-T", "*", f"{D}/bam2fq.001.sam"]),
    ("16.fq.expected", {},
     ["-N", "-T", "*", "-d", "MD:10", f"{D}/bam2fq.001.sam"]),
    ("17.fq.expected", {},
     ["-N", "-T", "*", "-d", "NM:0", f"{D}/bam2fq.001.sam"]),
    ("18.fq.expected", {},
     ["-N", "-T", "*", "-d", "ia", f"{D}/bam2fq.001.sam"]),
    ("20.fq.expected", {},
     ["-d", "NM:13", "-d", "NM:14", f"{D}/bam2fq.001.sam"]),
    ("20.fq.expected", {},
     ["-D", f"NM:{D}/bam2fq.NM-D", f"{D}/bam2fq.001.sam"]),
    ("19.fq.expected", {},
     ["-D", f"MD:{D}/bam2fq.MD-D", f"{D}/bam2fq.001.sam"]),
    ("21.fq.expected", {},
     ["-O", "--no-sc", "--no-sc-bkp", "-T", "s0", f"{D}/bam2fq.sc.sam"]),
    ("22.fq.expected", {},
     ["-O", "--no-sc", "-T", "s0", f"{D}/bam2fq.sc.sam"]),
    ("23.fq.expected", {}, ["-O", "--no-sc", f"{D}/bam2fq.sc.sam"]),
    ("24.fq.expected", {},
     ["-O", "--no-sc", "--sc-aux", "s1", "-T", "s0,s1",
      f"{D}/bam2fq.sc.sam"]),
    ("UMI.fq.expected", {}, ["-U", f"{R}/import/UMI.expected.sam"]),
    ("UMI.fq.expected", {},
     ["-U", "--UMI-tag", "RX,OX", f"{R}/import/UMI-OX.expected.sam"]),
]


@pytest.mark.parametrize("stdout_exp,out_map,args", CASES,
                         ids=[f"{i}" for i in range(len(CASES))])
def test_fastq_golden(tmp_path, stdout_exp, out_map, args):
    rc, out = run_cli(["fastq"] + args, cwd=str(tmp_path))
    assert rc == 0
    if stdout_exp is not None:
        assert out == open(f"{B}/{stdout_exp}").read()
    for fn, exp in out_map.items():
        assert (tmp_path / fn).read_text() == open(f"{B}/{exp}").read()


def test_fasta_golden(tmp_path):
    rc, _ = run_cli(["fasta", "-N", "-1", "o.fa", "-2", "o.fa",
                     f"{D}/bam2fq.001.sam"], cwd=str(tmp_path))
    assert rc == 0
    assert (tmp_path / "o.fa").read_text() \
        == open(f"{B}/11.fa.expected").read()


def test_fastq_gz_output(tmp_path):
    rc, _ = run_cli(["fastq", "-N", "-o", "o.fq.gz",
                     f"{D}/bam2fq.001.sam"], cwd=str(tmp_path))
    assert rc == 0
    import gzip
    got = gzip.open(tmp_path / "o.fq.gz", "rt").read()
    assert got == open(f"{B}/11.fq.expected").read()
