"""The mpileup TOOL riding the device pipeline (VERDICT r4 #1/#2).

The tool's windowed loop consumes ops/mpileup_device.DeviceCensusPipeline
as its BAQ+census engine under SAMTPU_DEVICE=1: fused device BAQ+census
per window (messy indel/soft-clip reads included via the generalized
kernel), quals fetched for the host text writer, per-window census
checksums written via --census-out.  Contracts:

* tool stdout byte-identical device vs host on a messy workload
  (/root/reference/bam_plcmd.c:451,607 semantics);
* the tool's census-out checksums equal the single-core native C
  census (samtpu_bench_baq_census) over the same windows.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _messy_batch(ref, ref_len, coverage=6.0, seed=3):
    from samtools_tpu.sim import simulate_batch
    b = simulate_batch(ref_len=ref_len, coverage=coverage, read_len=100,
                       seed=seed, paired=False, err_rate=0.01, ref=ref)
    rng = np.random.default_rng(11)
    n = b.n
    kind = rng.random(n)
    flat = []
    off = np.zeros(n + 1, np.int64)
    for i in range(n):
        L = int(b.seq_off[i + 1] - b.seq_off[i])
        k = kind[i]
        if k < 0.10:
            a = L // 3
            o = [(a, 0), (3, 1), (L - a - 3, 0)]
        elif k < 0.18:
            a = L // 2
            o = [(a, 0), (2, 2), (L - a, 0)]
        elif k < 0.33:
            o = [(8, 4), (L - 8, 0)]
        elif k < 0.38:
            o = [(L - 6, 0), (6, 4)]
        else:
            o = [(L, 0)]
        for ln, op in o:
            flat.append((ln << 4) | op)
        off[i + 1] = len(flat)
    b.cigar = np.array(flat, np.uint32)
    b.cigar_off = off
    return b


@pytest.fixture(scope="module")
def messy_workload(tmp_path_factory):
    from samtools_tpu.sim import make_header, simulate_reference
    from samtools_tpu.io.bam import write_bam
    d = tmp_path_factory.mktemp("mpdev")
    ref_len = 1 << 17
    ref = simulate_reference(ref_len, seed=7)
    b = _messy_batch(ref, ref_len)
    bam = str(d / "m.bam")
    fa = str(d / "m.fa")
    write_bam(bam, make_header(ref_len), b, threads=2)
    with open(fa, "w") as f:
        f.write(">sim1\n")
        s = ref.tobytes().decode()
        for i in range(0, len(s), 60):
            f.write(s[i:i + 60] + "\n")
    return bam, fa, ref, ref_len, str(d)


def _run_tool(args, extra_env):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
               **extra_env)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env, cwd=REPO)
    assert p.returncode == 0, p.stderr.decode()[-2000:]
    return p.stdout


def test_tool_device_parity_messy(messy_workload):
    bam, fa, ref, ref_len, d = messy_workload
    census = os.path.join(d, "census.json")
    host = _run_tool(["mpileup", "-f", fa, bam],
                     {"SAMTPU_DEVICE": "0"})
    dev = _run_tool(["mpileup", "-f", fa, bam, "--census-out", census],
                    {"SAMTPU_DEVICE": "1"})
    assert host == dev
    rec = json.load(open(census))
    assert rec["device_windows"] >= 1
    assert rec["reads"] > 0
    # messy workload: device path must absorb the vast majority
    assert rec["host_reads"] / rec["reads"] < 0.12


def test_tool_census_matches_native(messy_workload):
    """--census-out checksums == the single-core C BAQ+census loop."""
    from samtools_tpu.io import native
    from samtools_tpu.io.bam import decode_header
    from samtools_tpu.ops.mpileup_device import census_checksum
    if not native.available():
        pytest.skip("native library unavailable")
    bam, fa, ref, ref_len, d = messy_workload
    census = os.path.join(d, "census2.json")
    _run_tool(["mpileup", "-f", fa, bam, "--census-out", census],
              {"SAMTPU_DEVICE": "1"})
    rec = json.load(open(census))
    lut = np.full(256, 4, np.uint8)
    for i, c in enumerate(b"ACGT"):
        lut[c] = i
    ref_int = lut[ref]
    raw = open(bam, "rb").read()
    coffs, bsizes, isizes = native.bgzf_scan(raw)
    body = native.bgzf_inflate(raw, coffs, bsizes, int(isizes.sum()), 2)
    _, off = decode_header(body)
    cb, qb, nrec = native.bench_baq_census(body[off:], 0, ref_int)
    assert sum(w["reads"] for w in rec["windows"]) == nrec
    for w in rec["windows"]:
        want = census_checksum(cb[w["beg"]:w["end"]].astype(np.int64),
                               qb[w["beg"]:w["end"]])
        assert tuple(w["checksum"]) == want, w
