"""samtools depad golden tests (reference test.pl:test_depad,
/root/reference/test/test.pl:3326-3386).

The reference harness (sam_compare) strips @SQ M5 tags before
comparison; we do the same here.
"""

import os
import re
import subprocess
import sys

import pytest

D = "/root/reference/test/dat"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, stdin=None):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env, input=stdin)
    return p.returncode, p.stdout


def norm(text: bytes):
    out = []
    for l in text.split(b"\n"):
        if l.startswith(b"@PG"):
            continue
        if l.startswith(b"@SQ"):
            l = re.sub(rb"\tM5:[0-9a-f]+", b"", l)
        out.append(l)
    return out


def test_depad_sam_input():
    rc, out = run_cli(["depad", "-T", f"{D}/depad.001.fa", "-s",
                       f"{D}/depad.001p.sam", "--no-PG"])
    assert rc == 0
    want = open(f"{D}/depad.001u.sam", "rb").read()
    assert norm(out) == norm(want)


def test_depad_bam_roundtrip(tmp_path):
    bam = f"{tmp_path}/p.bam"
    rc, out = run_cli(["view", "-b", "--no-PG", "-o", bam,
                       f"{D}/depad.001p.sam"])
    assert rc == 0
    for fmt_args in ([], ["-u"], ["-1"]):
        rc, out = run_cli(["depad", "-T", f"{D}/depad.001.fa"]
                          + fmt_args + [bam, "--no-PG"])
        assert rc == 0
        rc, sam = run_cli(["view", "-h", "-"], stdin=out)
        assert rc == 0
        want = open(f"{D}/depad.001u.sam", "rb").read()
        assert norm(sam) == norm(want)
