"""samtools reference golden tests (reference test.pl:test_reference,
/root/reference/test/test.pl:3625-3652).

The reference's tests drive a CRAM with embedded refs; until CRAM lands
we exercise the MD:Z mode on the same filtered record set (the CRAM was
itself built from `view -e 'pos<1000||pos>1200' mpileup.1.sam`), which
yields byte-identical FASTA."""

import os
import shutil
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


@pytest.fixture(scope="module")
def filtered_sam(tmp_path_factory):
    path = tmp_path_factory.mktemp("ref") / "in.sam"
    rc, out = run_cli(["view", "-h", "-e", "pos<1000||pos>1200",
                       f"{R}/dat/mpileup.1.sam"])
    assert rc == 0
    path.write_bytes(out)
    return str(path)


def test_reference_md_mode(filtered_sam):
    rc, out = run_cli(["reference", filtered_sam])
    assert rc == 0
    want = open(f"{R}/reference/mpileup.MD.fa.expected", "rb").read()
    assert out == want


def test_reference_region(filtered_sam, tmp_path):
    rc, out = run_cli(["reference", "-r", "17:1000-1500", filtered_sam])
    assert rc == 0
    fa = f"{tmp_path}/md.fa"
    shutil.copy(f"{R}/reference/mpileup.MD.fa.expected", fa)
    rc, want = run_cli(["faidx", fa, "17:1000-1500"])
    assert rc == 0
    assert out == want


def test_reference_quiet_no_stderr(filtered_sam):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu",
                        "reference", "-q", filtered_sam],
                       capture_output=True, env=env)
    assert p.returncode == 0
    assert b"Dump ref" not in p.stderr
