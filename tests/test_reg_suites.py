"""Reference .reg regression suites run against our CLI (byte-parity).

These shell out per command (each ~0.5 s of interpreter+numpy startup), so
they are the slow end of the suite; keep each suite scoped to what the
framework supports and widen the filters as tools land.
"""

import sys

import pytest

sys.path.insert(0, "tests")
from reg_harness import run_reg  # noqa: E402

MPILEUP_DIR = "/root/reference/test/mpileup"


def _assert_clean(res):
    msg = "\n".join(
        f"FAIL: {f[0]} ({f[1] if len(f) > 1 else ''})" for f in res.failed)
    assert not res.failed, f"{res.summary()}\n{msg}"


def test_depth_reg(tmp_path):
    res = run_reg(f"{MPILEUP_DIR}/depth.reg", str(tmp_path))
    _assert_clean(res)
    assert len(res.passed) >= 55


# failures tracked in KNOWN_ISSUES.md: BAQ read-start numerics and
# overlap-tweak orientation.  7 literal-.bam commands + the -E/-Q40
# $fmt-swept commands under both bam and cram = 11 in the dual sweep.
KNOWN_MPILEUP_FAILS = 11


def test_mpileup_reg(tmp_path):
    res = run_reg(f"{MPILEUP_DIR}/mpileup.reg", str(tmp_path),
                  formats=("bam", "cram"))
    assert len(res.passed) >= 105, res.summary()
    assert len(res.failed) <= KNOWN_MPILEUP_FAILS, "\n".join(
        f[0] for f in res.failed)
