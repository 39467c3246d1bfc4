"""samtools cram-size golden tests (reference
test/cram_size/cram_size.reg)."""

import os
import subprocess
import sys

R = "/root/reference/test/cram_size"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env)
    return p.returncode, p.stdout


def test_cram_size_normal():
    rc, out = run_cli(["cram-size", f"{R}/mpileup.1.cram"])
    assert rc == 0
    assert out == open(f"{R}/expected/normal.out", "rb").read()


def test_cram_size_verbose():
    rc, out = run_cli(["cram-size", "-v", f"{R}/mpileup.1.cram"])
    assert rc == 0
    assert out == open(f"{R}/expected/verbose.out", "rb").read()


def test_cram_size_encodings():
    """Data-series lines byte-exact; tag lines compared as sets (the
    reference iterates an htslib-internal hash order for tags —
    KNOWN_ISSUES)."""
    rc, out = run_cli(["cram-size", "-e", f"{R}/mpileup.1.cram"])
    assert rc == 0
    want = open(f"{R}/expected/encodings.out", "rb").read()
    tag3 = {b"SMc", b"XCc", b"AMc", b"BQZ", b"MQc", b"X0c", b"X1c",
            b"XTA", b"XAZ"}

    def split(txt):
        fixed, tags = [], []
        for l in txt.split(b"\n"):
            if l.startswith(b"\t") and l.split(b"\t")[1] in tag3:
                tags.append(l)
            else:
                fixed.append(l)
        return fixed, sorted(tags)

    assert split(out) == split(want)
