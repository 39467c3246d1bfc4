"""samtools checksum golden tests (reference test.pl:test_checksum,
/root/reference/test/test.pl:4086-4140).

CRAM fixtures (chk2.*) are covered indirectly by the -a self-consistency
test until CRAM decode lands (KNOWN_ISSUES #3).
"""

import os
import re
import subprocess
import sys

import pytest

R = "/root/reference/test/checksum"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, stdin=None):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env, input=stdin)
    return p.returncode, p.stdout


def strip_fn(out: bytes) -> bytes:
    return re.sub(rb"(# Checksum[^:]*:).*", rb"\1", out)


def golden(name: str) -> bytes:
    return open(f"{R}/{name}", "rb").read()


def test_checksum_basic():
    rc, out = run_cli(["checksum", f"{R}/chk1.bam"])
    assert rc == 0
    assert strip_fn(out) == golden("chk1.1.expected")


def test_checksum_bamseqchksum():
    rc, out = run_cli(["checksum", "-B", f"{R}/chk1.bam"])
    assert rc == 0
    assert out == golden("chk1.4.expected")


def test_checksum_bamseqchksum_no_rg():
    rc, sam = run_cli(["view", "-h", f"{R}/chk1.bam"])
    assert rc == 0
    lines = [l for l in sam.split(b"\n") if not l.startswith(b"@RG")]
    sam = b"\n".join(re.sub(rb"\tRG:Z:[0-9a-zA-Z]*", b"", l)
                     for l in lines)
    rc, out = run_cli(["checksum", "-B", "-"], stdin=sam)
    assert rc == 0
    assert out == golden("chk1.5.expected")


def test_checksum_merge_self():
    rc, out = run_cli(["checksum", "-B", "-m", f"{R}/chk1.4.expected"])
    assert rc == 0
    assert out == golden("chk1.4.expected")


def test_checksum_merge_two_bamseqchksum():
    rc, out = run_cli(["checksum", "-B", "-m", f"{R}/chk1.4.expected",
                       f"{R}/chk1.5.expected"])
    assert rc == 0
    assert out == golden("chk1.6.expected")


def test_checksum_merge_mixed_types():
    rc, out = run_cli(["checksum", "-m", f"{R}/chk1.1.expected",
                       f"{R}/chk1.4.expected"])
    assert rc == 0
    assert out == golden("chk1.7.expected")
    rc, out = run_cli(["checksum", "-B", "-m", f"{R}/chk1.1.expected",
                       f"{R}/chk1.4.expected"])
    assert rc == 0
    assert out == golden("chk1.8.expected")


def test_checksum_split_merge_roundtrip(tmp_path):
    rc, _ = run_cli(["split", "-f", f"{tmp_path}/chk1-%!.tmp",
                     f"{R}/chk1.bam"])
    assert rc == 0
    chks = []
    for rg in ("ERR013140", "ERR016352", "ERR156632"):
        chk = f"{tmp_path}/chk1-{rg}.chk"
        rc, _ = run_cli(["checksum", f"{tmp_path}/chk1-{rg}.tmp",
                         "-o", chk])
        assert rc == 0
        chks.append(chk)
    rc, out = run_cli(["checksum", "-m"] + chks)
    assert rc == 0
    assert strip_fn(out) == golden("chk1.1.expected")


def test_checksum_merge_tag_mismatch_fails(tmp_path):
    chk = f"{tmp_path}/am.chk"
    rc, _ = run_cli(["checksum", "-t", "AM", f"{R}/chk1.bam", "-o", chk])
    assert rc == 0
    rc, out = run_cli(["checksum", "-m", f"{R}/chk1.1.expected", chk])
    assert rc != 0
    assert out == b""


def test_checksum_all_mode_split_consistency(tmp_path):
    """-a whole-file result == GF(2^31-1) merge of per-RG results: the
    commutative-combine property (bam_checksum.c:188-202) that makes the
    reduction shardable across devices."""
    rc, whole = run_cli(["checksum", "-a", f"{R}/chk1.bam"])
    assert rc == 0
    rc, _ = run_cli(["split", "-f", f"{tmp_path}/s-%!.tmp",
                     f"{R}/chk1.bam"])
    assert rc == 0
    chks = []
    for rg in ("ERR013140", "ERR016352", "ERR156632"):
        chk = f"{tmp_path}/s-{rg}.chk"
        rc, _ = run_cli(["checksum", "-a", f"{tmp_path}/s-{rg}.tmp",
                         "-o", chk])
        assert rc == 0
        chks.append(chk)
    rc, merged = run_cli(["checksum", "-m"] + chks)
    assert rc == 0
    assert strip_fn(merged) == strip_fn(whole)


def test_checksum_qc_rows():
    """-qv adds pass/fail rows whose counts sum to the all row."""
    rc, out = run_cli(["checksum", "-qv", f"{R}/chk1.bam"])
    assert rc == 0
    lines = [l.split() for l in out.decode().splitlines()
             if l.startswith("all")]
    assert len(lines) == 3
    assert int(lines[0][2]) == int(lines[1][2]) + int(lines[2][2])
