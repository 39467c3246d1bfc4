"""samtools ampliconstats golden tests (reference
test.pl:test_ampliconstats, /root/reference/test/test.pl:4024-4040)."""

import os
import re
import subprocess
import sys

import pytest

A = "/root/reference/test/ampliconclip"
AS = "/root/reference/test/ampliconstats"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env)
    return p.returncode, p.stdout


def strip_version(out: bytes) -> bytes:
    return b"".join(l for l in out.splitlines(keepends=True)
                    if not re.search(rb"Samtools version|Command line", l))


def test_ampliconstats_main():
    inputs = [f"{A}/1_hard_clipped.expected.sam",
              f"{A}/1_soft_clipped.expected.sam",
              f"{A}/1_soft_clipped_strand.expected.sam",
              f"{A}/2_both_clipped.expected.sam"]
    rc, out = run_cli(["ampliconstats", "-S", "-t", "50", "-d", "1,20,100",
                       f"{A}/ac_test.bed"] + inputs)
    assert rc == 0
    want = open(f"{AS}/stats.expected.txt", "rb").read()
    assert strip_version(out) == want


def test_ampliconstats_mixed_multi_ref():
    rc, out = run_cli(["ampliconstats", "-c", "0", f"{A}/multi_ref.bed",
                       f"{AS}/mixed_clipped.sam"])
    assert rc == 0
    want = open(f"{AS}/stats_mixed.expected.txt", "rb").read()
    assert strip_version(out) == want


def test_ampliconstats_partial_bed():
    rc, out = run_cli(["ampliconstats", "-c", "0", f"{A}/ac_test.bed",
                       f"{AS}/mixed_clipped.sam"])
    assert rc == 0
    want = open(f"{AS}/stats_partial.expected.txt", "rb").read()
    assert strip_version(out) == want
