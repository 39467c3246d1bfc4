"""Batch (vectorized/native/device) stats path vs the per-record oracle.

The reference validates stats behaviorally against golden outputs
(test.pl:3394); the batch rebuild additionally asserts the vectorized
path is byte-identical to the oracle on adversarial fixtures the goldens
don't cover: realloc-triggering read-length growth mid-file, unsorted
input, messy CIGARs, missing quals, secondary/supplementary/dup flags.
"""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
S = "/root/reference/test/stat"


def run_cli(args, scalar=False, cwd=None, extra_env=None):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    if scalar:
        env["SAMTPU_STATS_SCALAR"] = "1"
    else:
        env.pop("SAMTPU_STATS_SCALAR", None)
    if extra_env:
        env.update(extra_env)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env, cwd=cwd)
    return p.returncode, p.stdout, p.stderr


def _messy_sam(tmp_path, seed=0, n=400, unsorted=False, long_reads=False):
    """Randomized fixture: paired reads with indel/clip cigars, variable
    lengths (crossing the 300bp realloc threshold when long_reads),
    reverse strands, secondary/supp/dup/qcfail records, NM tags."""
    rng = np.random.default_rng(seed)
    ref_len = 8000
    lines = ["@HD\tVN:1.6\tSO:%s" % ("unsorted" if unsorted
                                     else "coordinate"),
             "@SQ\tSN:ref1\tLN:%d" % ref_len,
             "@RG\tID:rg1\tSM:s1"]
    pos = 10
    for i in range(n):
        if long_reads:
            ln = int(rng.integers(30, 500))
        else:
            ln = int(rng.integers(20, 120))
        seq = "".join(rng.choice(list("ACGTN"), ln))
        qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 42, ln))
        flag = 0
        r = rng.random()
        if r < 0.45:
            flag |= 0x1 | 0x40
        elif r < 0.9:
            flag |= 0x1 | 0x80
        if rng.random() < 0.5:
            flag |= 0x10
        if rng.random() < 0.25:
            flag |= 0x20
        if rng.random() < 0.06:
            flag |= 0x100
        if rng.random() < 0.06:
            flag |= 0x800
        if rng.random() < 0.08:
            flag |= 0x400
        if rng.random() < 0.05:
            flag |= 0x200
        if rng.random() < 0.06:
            flag |= 0x4
        kind = rng.random()
        if flag & 0x4:
            cig = "*"
        elif kind < 0.4:
            cig = "%dM" % ln
        elif kind < 0.6 and ln > 20:
            a = int(rng.integers(5, ln - 10))
            cig = "%dS%dM%dS" % (a // 2, ln - a, a - a // 2)
        elif kind < 0.8 and ln > 30:
            a = ln // 3
            d = int(rng.integers(1, 9))
            cig = "%dM%dD%dM%dI%dM" % (a, d, a, ln - 2 * a - (ln - 2 * a)
                                       // 2, (ln - 2 * a) // 2)
            # ensure query length consistency
            m3 = ln - 2 * a - (ln - 2 * a) // 2
            ins = (ln - 2 * a) // 2
            if m3 <= 0 or ins <= 0:
                cig = "%dM" % ln
        else:
            h = int(rng.integers(1, 10))
            cig = "%dH%dM%dH" % (h, ln, h + 1)
        if unsorted:
            p = int(rng.integers(1, ref_len - 600))
        else:
            pos += int(rng.integers(0, 25))
            p = pos
        mpos = p + int(rng.integers(-200, 200))
        mpos = max(1, mpos)
        tlen = mpos - p + (ln if mpos >= p else -ln)
        if flag & 0x1 and rng.random() < 0.1:
            flag |= 0x8
        lines.append("\t".join([
            "r%04d" % (i // 2), str(flag), "ref1" if not (flag & 0x4)
            else "*", str(p if not (flag & 0x4) else 0),
            str(int(rng.integers(0, 61))), cig,
            "=" if flag & 0x1 else "*",
            str(mpos if flag & 0x1 else 0),
            str(tlen if flag & 0x1 else 0), seq, qual,
            "NM:i:%d" % int(rng.integers(0, 5)), "RG:Z:rg1"]))
    path = tmp_path / ("messy%d.sam" % seed)
    path.write_text("\n".join(lines) + "\n")
    return str(path)


@pytest.mark.parametrize("seed,unsorted,long_reads", [
    (1, False, False),
    (2, False, True),      # realloc triggers mid-file
    (3, True, False),      # unsorted detection
    (4, True, True),
])
def test_messy_batch_equals_scalar(tmp_path, seed, unsorted, long_reads):
    sam = _messy_sam(tmp_path, seed=seed, unsorted=unsorted,
                     long_reads=long_reads)
    rc_b, out_b, err_b = run_cli(["stats", sam])
    rc_s, out_s, err_s = run_cli(["stats", sam], scalar=True)
    assert rc_b == rc_s
    assert out_b == out_s
    assert err_b == err_s


def test_messy_batch_equals_scalar_options(tmp_path):
    sam = _messy_sam(tmp_path, seed=5, long_reads=True)
    for extra in (["-q", "15"], ["-f", "0x2"], ["-F", "0x400"],
                  ["-d"], ["-i", "100"], ["-l", "100"]):
        rc_b, out_b, _ = run_cli(["stats"] + extra + [sam])
        rc_s, out_s, _ = run_cli(["stats"] + extra + [sam], scalar=True)
        assert rc_b == rc_s and out_b == out_s, extra


def test_fai_batch_equals_scalar():
    args = ["stats", "-r", f"{S}/test.fa", f"{S}/1_map_cigar.sam"]
    rc_b, out_b, _ = run_cli(args)
    rc_s, out_s, _ = run_cli(args, scalar=True)
    assert rc_b == rc_s == 0
    assert out_b == out_s


def test_device_kernels_equal_numpy():
    from samtools_tpu.ops import stats_kernels as K
    rng = np.random.default_rng(0)
    n = 5000
    nbases = 151
    cycle = rng.integers(0, nbases, n).astype(np.int32)
    qual = rng.integers(0, 94, n).astype(np.uint8)
    col = rng.integers(0, 6, n).astype(np.uint8)
    order = rng.integers(0, 3, n).astype(np.int8)
    rev = rng.random(n) < 0.5
    a = K.base_hists_numpy(nbases, cycle, qual, col, order, rev)
    b = K.base_hists_device(nbases, cycle, qual, col, order, rev)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_native_hists_equal_numpy():
    from samtools_tpu.io import native
    from samtools_tpu.ops import stats_kernels as K
    if not native.has_stats_native():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(1)
    nreads = 200
    lens = rng.integers(1, 160, nreads)
    off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    total = int(off[-1])
    seq = rng.choice(np.array([1, 2, 4, 8, 15], np.uint8), total)
    qual = rng.integers(0, 94, total).astype(np.uint8)
    order = rng.integers(0, 3, nreads).astype(np.uint8)
    rev = (rng.random(nreads) < 0.5)
    oidx = np.arange(nreads, dtype=np.int64)
    nbases = 200
    q1 = np.zeros((nbases, 257), np.int64)
    q2 = np.zeros((nbases, 257), np.int64)
    a1 = np.zeros((nbases, 6), np.int64)
    a2 = np.zeros((nbases, 6), np.int64)
    ar = np.zeros((nbases, 6), np.int64)
    gc, qs, mq = native.stats_orig_hists(
        seq, qual, off, oidx, order, rev.astype(np.uint8), nbases,
        q1, q2, a1, a2, ar)
    # numpy reference
    seg = np.repeat(np.arange(nreads), lens)
    local = np.arange(total) - off[:-1][seg]
    cycle = np.where(rev[seg], lens[seg] - 1 - local, local).astype(
        np.int32)
    col = np.zeros(16, np.uint8)
    col[:] = 5
    col[1], col[2], col[4], col[8], col[15] = 0, 1, 2, 3, 4
    colb = col[seq]
    nq1, nq2, na1, na2, nar = K.base_hists_numpy(
        nbases, cycle, qual, colb, order[seg].astype(np.int8), rev[seg])
    np.testing.assert_array_equal(q1, nq1[:nbases])
    np.testing.assert_array_equal(q2, nq2[:nbases])
    np.testing.assert_array_equal(a1, na1)
    np.testing.assert_array_equal(a2, na2)
    np.testing.assert_array_equal(ar, nar)
    # per-read gc / qual sums
    isgc = (seq == 2) | (seq == 4)
    np.testing.assert_array_equal(
        gc, np.add.reduceat(isgc, off[:-1]).astype(np.int64))
    q12 = (order == 1) | (order == 2)
    want_qs = np.add.reduceat(qual.astype(np.int64), off[:-1])
    np.testing.assert_array_equal(qs[q12], want_qs[q12])


def test_stats_hists_psum_over_mesh():
    """Device histograms are psum-ready: shard the flat base stream over
    the 8-device CPU mesh, scatter-add per shard, psum, compare."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from samtools_tpu.ops import stats_kernels as K

    devs = np.array(jax.devices()[:8])
    if devs.size < 8:
        pytest.skip("need 8 virtual devices")
    mesh = Mesh(devs, ("d",))
    rng = np.random.default_rng(2)
    n = 8 * 1024
    nbases = 100
    cycle = rng.integers(0, nbases, n).astype(np.int32)
    qual = rng.integers(0, 94, n).astype(np.int32)
    order = rng.integers(1, 3, n).astype(np.int32)

    def shard_fn(cy, qu, od):
        one = jnp.ones_like(cy)
        row = jnp.where(od == 1, cy, nbases)
        h = jnp.zeros((nbases + 1, 257), jnp.int32).at[row, qu].add(one)
        return jax.lax.psum(h, "d")

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P("d"), P("d"), P("d")),
                   out_specs=P())
    got = np.asarray(fn(cycle, qual, order))[:nbases]
    m = order == 1
    want = np.bincount(cycle[m] * 257 + qual[m],
                       minlength=nbases * 257).reshape(nbases, 257)
    np.testing.assert_array_equal(got, want)
