"""Device pileup engine tests.

Three layers, mirroring the reference's threads=>2 golden re-runs
(/root/reference/test/test.pl): (1) engine-vs-host parity on real
fixtures, (2) the full depth.reg golden suite executed with the device
path forced on (SAMTPU_DEVICE=1), (3) the Pallas kernel itself in
interpreter mode on small shapes.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from reg_harness import run_reg  # noqa: E402

MPILEUP_DIR = "/root/reference/test/mpileup"
BAM1 = f"{MPILEUP_DIR}/mpileup.1.bam"


def _load(path):
    from samtools_tpu.io.files import read_alignments
    return read_alignments(path).batch


@pytest.fixture(scope="module")
def batch_sel():
    import samtools_tpu.core.flags as F
    batch = _load(BAM1)
    keep = (batch.flag & (F.FUNMAP | F.FSECONDARY | F.FQCFAIL | F.FDUP)) == 0
    sel = np.nonzero(keep)[0]
    tid0 = batch.tid[sel][0]
    sel = sel[batch.tid[sel] == tid0]
    sel = sel[np.argsort(batch.pos[sel], kind="stable")]
    return batch, sel


@pytest.mark.parametrize("min_qual,count_del", [(0, False), (13, False),
                                                (0, True), (20, True)])
def test_depth_window_device_parity(batch_sel, min_qual, count_del):
    from samtools_tpu.ops import depth as hd
    from samtools_tpu.ops.pileup_engine import depth_window_device
    batch, sel = batch_sel
    wbeg = int(batch.pos[sel].min())
    wend = int(batch.end_pos()[sel].max())
    dev = depth_window_device(batch, sel, wbeg, wend, min_qual, count_del)
    host = hd.depth_window(batch, sel, wbeg, wend, min_qual, count_del)
    assert np.array_equal(dev, host)


def test_depth_window_device_with_clips(batch_sel):
    from samtools_tpu.ops import depth as hd
    from samtools_tpu.ops.pileup_engine import depth_window_device
    batch, sel = batch_sel
    clips = hd.overlap_clips(batch, sel)
    wbeg = int(batch.pos[sel].min())
    wend = int(batch.end_pos()[sel].max())
    for mq in (0, 13):
        dev = depth_window_device(batch, sel, wbeg, wend, mq, False, clips)
        host = hd.depth_window(batch, sel, wbeg, wend, mq, False, clips)
        assert np.array_equal(dev, host)


def test_depth_window_device_subwindow(batch_sel):
    """Window narrower than the read span: clipping at both edges."""
    from samtools_tpu.ops import depth as hd
    from samtools_tpu.ops.pileup_engine import depth_window_device
    batch, sel = batch_sel
    wbeg = int(batch.pos[sel].min()) + 137
    wend = wbeg + 611
    dev = depth_window_device(batch, sel, wbeg, wend, 0, True)
    host = hd.depth_window(batch, sel, wbeg, wend, 0, True)
    assert np.array_equal(dev, host)


def test_census_counts_match_pileup(batch_sel):
    """Per-position census totals must equal the ragged pileup's
    per-position base counts (non-del, non-refskip entries)."""
    from samtools_tpu.ops.pileup import build_pileup
    from samtools_tpu.ops.pileup_engine import pileup_census
    batch, sel = batch_sel
    wbeg = int(batch.pos[sel].min())
    wend = int(batch.end_pos()[sel].max())
    census = pileup_census(batch, sel, wbeg, wend, 0)
    p = build_pileup(batch.take(sel))
    keep = ~(p.is_del | p.is_refskip)
    host = np.zeros(wend - wbeg, np.int64)
    np.add.at(host, p.pos[keep] - wbeg, 1)
    assert np.array_equal(census.sum(axis=1).astype(np.int64), host)


def test_depth_reg_device(tmp_path):
    """Full depth.reg golden suite with the device engine forced on —
    byte-parity through the XLA engine path."""
    res = run_reg(f"{MPILEUP_DIR}/depth.reg", str(tmp_path),
                  env_extra={"SAMTPU_DEVICE": "1", "SAMTPU_PALLAS": "0"})
    msg = "\n".join(f"FAIL: {f[0]}" for f in res.failed)
    assert not res.failed, f"{res.summary()}\n{msg}"
    assert len(res.passed) >= 55


def test_pallas_kernel_interpret(monkeypatch):
    """Pallas kernel vs numpy on small random cases (interpreter mode)."""
    monkeypatch.setenv("SAMTPU_PALLAS", "interpret")
    from samtools_tpu.ops import pileup_pallas as pp
    rng = np.random.RandomState(7)
    n, K, wlen = 700, 5, 300
    n_tiles = (wlen + pp.TILE - 1) // pp.TILE
    pos = np.sort(rng.randint(0, wlen, n)).astype(np.int32)
    W = rng.randint(-2, 3, (n, K)).astype(np.int8)
    # slices: tile t owns items within [t*TILE, (t+1)*TILE)
    lo = np.searchsorted(pos, np.arange(n_tiles) * pp.TILE).astype(np.int32)
    hi = np.searchsorted(pos, (np.arange(n_tiles) + 1) * pp.TILE)
    hi = hi.astype(np.int32)
    out = np.asarray(pp.segment_matmul_pallas(pos, W, lo, hi, 0, n_tiles,
                                              int((hi - lo).max())))
    ref = np.zeros((n_tiles * pp.TILE, K), np.int64)
    np.add.at(ref, pos, W.astype(np.int64))
    assert np.array_equal(out[:wlen].astype(np.int64), ref[:wlen])


def test_pallas_kernel_multipass(monkeypatch):
    """Slices wider than one padded block force the multi-pass loop."""
    monkeypatch.setenv("SAMTPU_PALLAS", "interpret")
    from samtools_tpu.ops import pileup_pallas as pp
    rng = np.random.RandomState(3)
    n = 3 * pp.KB + 17
    pos = np.zeros(n, np.int32)  # all items in tile 0
    W = rng.randint(0, 2, (n, 1)).astype(np.int8)
    lo = np.array([0], np.int32)
    hi = np.array([n], np.int32)
    out = np.asarray(pp.segment_matmul_pallas(pos, W, lo, hi, 0, 1, pp.KB))
    assert int(out[0, 0]) == int(W.sum())


MPILEUP_DEVICE_FIXTURES = ["ce#5b.bam", "c1#clip.bam", "c1#pad1.bam",
                           "mpileup.1.bam"]


@pytest.mark.parametrize("fixture", MPILEUP_DEVICE_FIXTURES)
def test_mpileup_device_pileup_sort_parity(fixture):
    """mpileup -B with the device pileup sort forced on == host path
    (the pileup table construction is the shared device hook for
    mpileup/consensus/bedcov/coverage)."""
    import os
    import subprocess
    path = f"{MPILEUP_DIR}/{fixture}"
    outs = {}
    for dev in ("1", "0"):
        env = dict(os.environ, SAMTPU_PLATFORM="cpu", SAMTPU_DEVICE=dev)
        p = subprocess.run([sys.executable, "-m", "samtools_tpu",
                            "mpileup", "-B", path],
                           capture_output=True, env=env)
        assert p.returncode == 0, p.stderr.decode()[-2000:]
        outs[dev] = p.stdout
    assert outs["1"] == outs["0"]
