"""bedcov golden parity + coverage/census device-vs-host equality."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEDDIR = "/root/reference/test/bedcov"


def run_cli(args, env_extra=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    if env_extra:
        env.update(env_extra)
    r = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr.decode()[-800:]
    return r.stdout


@pytest.mark.parametrize("opts,bed,expected", [
    ([], "bedcov.bed", "bedcov.expected"),
    (["-j"], "bedcov.bed", "bedcov_j.expected"),
    (["-g512", "-G2048"], "bedcov_gG.bed", "bedcov_gG.expected"),
    (["-c"], "bedcov_gG.bed", "bedcov_c.expected"),
])
def test_bedcov_golden(opts, bed, expected):
    got = run_cli(["bedcov"] + opts + [f"{BEDDIR}/{bed}",
                                       f"{BEDDIR}/bedcov.bam"])
    assert got == open(f"{BEDDIR}/{expected}", "rb").read()


def test_bedcov_min_depth_matches_bruteforce():
    """-d counts positions visited by any entry with M-depth >= d."""
    from samtools_tpu.io.files import read_alignments
    from samtools_tpu.core import flags as F
    got = run_cli(["bedcov", "-d", "2", f"{BEDDIR}/bedcov.bed",
                   f"{BEDDIR}/bedcov.bam"]).decode()
    f = read_alignments(f"{BEDDIR}/bedcov.bam")
    b = f.batch
    from samtools_tpu.ops.pileup import build_pileup
    for line in got.strip().split("\n"):
        p = line.split("\t")
        chrom, beg, end = p[0], int(p[1]), int(p[2])
        want_d = int(p[-1])
        tid = f.header.tid(chrom)
        fl = b.flag.astype(np.int64)
        sel = np.nonzero((b.tid == tid)
                         & ((fl & 0x704) == 0))[0]
        pl = build_pileup(b.take(sel))
        L = end - beg
        inreg = (pl.pos >= beg) & (pl.pos < end)
        real = inreg & ~(pl.is_del | pl.is_refskip)
        vis = np.bincount((pl.pos[inreg] - beg).astype(np.int64),
                          minlength=L) > 0
        pd = np.bincount((pl.pos[real] - beg).astype(np.int64),
                         minlength=L)
        assert want_d == int((vis & (pd >= 2)).sum()), line
        del F


def test_coverage_device_matches_host():
    bam = "/root/reference/test/mpileup/mpileup.1.bam"
    host = run_cli(["coverage", bam], {"SAMTPU_DEVICE": "0"})
    dev = run_cli(["coverage", bam], {"SAMTPU_DEVICE": "1",
                                      "JAX_PLATFORMS": "cpu"})
    assert host == dev
    assert b"covbases" in host


def test_device_census_pipeline_matches_native(tmp_path):
    """Streamed device BAQ + census == single-core native reference."""
    from samtools_tpu.sim import (make_header, simulate_batch,
                                  simulate_reference)
    from samtools_tpu.io.bam import write_bam, decode_header
    from samtools_tpu.io import native
    from samtools_tpu.io.stream import BamStream
    from samtools_tpu.ops.mpileup_device import DeviceCensusPipeline
    if not native.available():
        pytest.skip("native library unavailable")
    REF_LEN = 1 << 17
    ref = simulate_reference(REF_LEN, seed=7)
    batch = simulate_batch(ref_len=REF_LEN, coverage=8.0, read_len=100,
                           seed=3, paired=False, err_rate=0.01, ref=ref)
    path = str(tmp_path / "w.bam")
    write_bam(path, make_header(REF_LEN), batch, threads=2)
    lut = np.full(256, 4, np.uint8)
    for i, c in enumerate(b"ACGT"):
        lut[c] = i
    ref_int = lut[ref]
    raw = open(path, "rb").read()
    coffs, bsizes, isizes = native.bgzf_scan(raw)
    body = native.bgzf_inflate(raw, coffs, bsizes, int(isizes.sum()), 2)
    _, off = decode_header(body)
    cb, qb, nrec = native.bench_baq_census(body[off:], 0, ref_int)
    pipe = DeviceCensusPipeline(ref_int, REF_LEN)
    with BamStream(path, threads=2) as st:
        for bt in st.batches(fields=2 | 4 | 8):
            pipe.add_batch(bt)
    co, qo = pipe.finish()
    assert pipe.n_reads == nrec
    assert np.array_equal(co, cb.astype(np.int64))
    assert np.array_equal(qo, qb)


def test_mpileup_device_baq_matches_host(tmp_path):
    """The mpileup tool's device pair-HMM route (forced via
    SAMTPU_DEVICE=1) is byte-identical to the host f64 path on a
    simulated reference+reads workload."""
    from samtools_tpu.sim import (make_header, simulate_batch,
                                  simulate_reference)
    from samtools_tpu.io.bam import write_bam
    REF_LEN = 1 << 16
    ref = simulate_reference(REF_LEN, seed=3)
    b = simulate_batch(ref_len=REF_LEN, coverage=6.0, read_len=100,
                       seed=5, paired=False, err_rate=0.01, ref=ref)
    bam = str(tmp_path / "dv.bam")
    fa = str(tmp_path / "dv.fa")
    write_bam(bam, make_header(REF_LEN), b, threads=1)
    with open(fa, "w") as f:
        f.write(">sim1\n")
        s = ref.tobytes().decode()
        for i in range(0, len(s), 60):
            f.write(s[i:i + 60] + "\n")
    host = run_cli(["mpileup", "-x", "-f", fa, bam],
                   {"SAMTPU_DEVICE": "0"})
    dev = run_cli(["mpileup", "-x", "-f", fa, bam],
                  {"SAMTPU_DEVICE": "1", "JAX_PLATFORMS": "cpu"})
    assert host == dev and host
