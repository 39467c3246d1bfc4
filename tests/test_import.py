"""samtools import golden + roundtrip tests (reference
test.pl:test_import)."""

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


SAM_CASES = [
    ("1.expected.sam",
     [f"{R}/bam2fq/1.1.fq.expected", f"{R}/bam2fq/1.2.fq.expected",
      "-R", "rgid"]),
    ("1.expected.sam",
     [f"{R}/bam2fq/1.1.fq.expected", f"{R}/bam2fq/1.2.fq.expected",
      "-r", "ID:rgid"]),
    ("1.expected.sam",
     [f"{R}/bam2fq/1.1.fq.expected", f"{R}/bam2fq/1.2.fq.expected",
      "-r", "@RG\tID:rgid"]),
    ("2.expected.sam", [f"{R}/import/2.interleaved.fq", "-T", ""]),
    ("3.expected.sam", [f"{R}/import/3.interleaved.fq", "-i"]),
    ("4.expected.sam", [f"{R}/import/4.aux.fq", "-T", "*"]),
    ("4.expected.sam", [f"{R}/import/4.aux.fq", "-T", ""]),
    ("4.expected-XZ,XA,AA.sam",
     [f"{R}/import/4.aux.fq", "-T", "XZ,XA,AA"]),
    ("5-BC.expected.sam",
     ["--i1", f"{R}/import/5-i1.fq", "--i2", f"{R}/import/5-i2.fq",
      "--r1", f"{R}/import/5-r1.fq", "--r2", f"{R}/import/5-r2.fq"]),
    ("5-OX.expected.sam",
     ["--i1", f"{R}/import/5-i1.fq", "--i2", f"{R}/import/5-i2.fq",
      "--r1", f"{R}/import/5-r1.fq", "--r2", f"{R}/import/5-r2.fq",
      "--barcode-tag", "OX", "--quality-tag", "BZ"]),
    ("UMI.expected.sam", ["-U", f"{R}/bam2fq/UMI.fq.expected"]),
    ("UMI-OX.expected.sam",
     ["-U", "--UMI-tag", "OX", f"{R}/bam2fq/UMI.fq.expected"]),
]


@pytest.mark.parametrize("expected,args", SAM_CASES,
                         ids=[f"{i}-{c[0]}" for i, c in
                              enumerate(SAM_CASES)])
def test_import_golden(expected, args):
    rc, out = run_cli(["import", "--no-PG"] + args)
    assert rc == 0
    assert out == open(f"{R}/import/{expected}", "rb").read()


ROUNDTRIPS = [
    (["-0", f"{R}/bam2fq/1.1.fq.expected"], ["-0"],
     ["1.1.fq.expected"]),
    (["-s", f"{R}/bam2fq/1.1.fq.expected"], ["-0"],
     ["1.1.fq.expected"]),
    (["-s", f"{R}/bam2fq/5.s.fq.expected"], ["-s"],
     ["5.s.fq.expected"]),
    ([f"{R}/bam2fq/1.1.fq.expected", f"{R}/bam2fq/1.2.fq.expected"],
     ["-1", "-2"], ["1.1.fq.expected", "1.2.fq.expected"]),
    (["-i", "-1", f"{R}/bam2fq/12.1.fq.expected", "-2",
      f"{R}/bam2fq/12.2.fq.expected"],
     ["-i", "--index-format", "i*i*", "-1", "-2"],
     ["12.1.fq.expected", "12.2.fq.expected"]),
]


@pytest.mark.parametrize("imp_args,fq_flags,expected", ROUNDTRIPS,
                         ids=[str(i) for i in range(len(ROUNDTRIPS))])
def test_import_fastq_roundtrip(tmp_path, imp_args, fq_flags, expected):
    rc, sam = run_cli(["import", "--no-PG"] + imp_args)
    assert rc == 0
    outs = []
    fq_args = []
    i = 0
    while i < len(fq_flags):
        fl = fq_flags[i]
        if fl in ("-0", "-1", "-2", "-s"):
            p = tmp_path / f"o{len(outs)}.fq"
            outs.append(p)
            fq_args += [fl, str(p)]
            i += 1
        else:
            fq_args.append(fl)
            if fl == "--index-format":
                fq_args.append(fq_flags[i + 1])
                i += 2
            else:
                i += 1
    rc, _ = run_cli(["fastq"] + fq_args + ["-"], stdin=sam)
    assert rc == 0
    for p, exp in zip(outs, expected):
        assert p.read_text() == open(f"{R}/bam2fq/{exp}").read()
