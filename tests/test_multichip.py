"""Multi-device correctness: N-chip == 1-chip goldens on real fixtures.

The analog of the reference's threads=>2 re-runs (test/test.pl): the
same tool compute, run sharded over the 8 virtual CPU devices the
conftest provisions, must equal the single-device / host result
exactly.
"""

import numpy as np
import pytest

BAM1 = "/root/reference/test/mpileup/mpileup.1.bam"


@pytest.fixture(scope="module")
def mesh8():
    import jax
    from samtools_tpu.parallel.mesh import make_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(n_data=4, n_region=2)


@pytest.fixture(scope="module")
def batch_sel():
    import samtools_tpu.core.flags as F
    from samtools_tpu.io.files import read_alignments
    batch = read_alignments(BAM1).batch
    keep = (batch.flag & (F.FUNMAP | F.FSECONDARY | F.FQCFAIL
                          | F.FDUP)) == 0
    sel = np.nonzero(keep)[0]
    tid0 = batch.tid[sel][0]
    sel = sel[batch.tid[sel] == tid0]
    sel = sel[np.argsort(batch.pos[sel], kind="stable")]
    return batch, sel


def test_flagstat_sharded_equals_host(mesh8):
    from samtools_tpu.io.files import read_alignments
    from samtools_tpu.ops import flagstat as fsops
    from samtools_tpu.parallel.mesh import flagstat_sharded, \
        shard_batch_arrays
    b = read_alignments(BAM1).batch
    host = fsops.flagstat_numpy(b)
    valid = np.ones(b.n, bool)
    args = shard_batch_arrays(mesh8, b.flag, b.mapq,
                              b.tid.astype(np.int32),
                              b.mtid.astype(np.int32), valid)
    out = np.asarray(flagstat_sharded(mesh8, *args))
    dev = fsops.matrix_to_counts(out) if hasattr(fsops, "matrix_to_counts") \
        else None
    if dev is None:
        # compare via the device count matrix of the single-device path
        single = np.asarray(fsops.flagstat_device(
            b.flag, b.mapq, b.tid.astype(np.int32),
            b.mtid.astype(np.int32), valid))
        assert np.array_equal(out, single)
    else:
        assert dev == host


@pytest.mark.parametrize("min_qual,count_del", [(0, False), (13, True)])
def test_depth_sharded_equals_host(mesh8, batch_sel, min_qual, count_del):
    from samtools_tpu.ops import depth as hd
    from samtools_tpu.parallel.mesh import depth_window_sharded
    batch, sel = batch_sel
    wbeg = int(batch.pos[sel].min())
    wend = int(batch.end_pos()[sel].max())
    dev = depth_window_sharded(mesh8, batch, sel, wbeg, wend, min_qual,
                               count_del)
    host = hd.depth_window(batch, sel, wbeg, wend, min_qual, count_del)
    assert np.array_equal(np.asarray(dev, np.int64),
                          host.astype(np.int64))


def test_segment_matmul_sharded_random(mesh8):
    """Sharded contraction vs plain numpy scatter on random weights."""
    from samtools_tpu.ops.pileup_engine import tile_plan
    from samtools_tpu.parallel.mesh import segment_matmul_sharded
    rng = np.random.RandomState(5)
    wlen = 2048
    n_reads, span = 300, 40
    rpos = np.sort(rng.randint(0, wlen - span, n_reads)).astype(np.int64)
    rend = rpos + span
    items_per = 7
    pos = (rpos[:, None] + rng.randint(0, span, (n_reads, items_per))
           ).ravel()
    W = rng.randint(-3, 4, (pos.size, 5)).astype(np.int8)
    off = np.arange(0, pos.size + 1, items_per, dtype=np.int64)
    plan = tile_plan(rpos, rend + 1, off, 0, wlen, tile=128)
    out = segment_matmul_sharded(mesh8, pos, W, plan)
    ref = np.zeros((plan.n_tiles * 128, 5), np.int64)
    np.add.at(ref, pos, W.astype(np.int64))
    assert np.array_equal(np.asarray(out[:wlen], np.int64), ref[:wlen])


def test_checksum_combine_across_shards():
    """The GF(2^31-1) checksum combine is order-agnostic across shards
    (the cross-host validation primitive, bam_checksum.c:188-202)."""
    from samtools_tpu.ops import checksum as ck
    rng = np.random.RandomState(9)
    crcs = rng.randint(1, 2**31 - 2, 1000).astype(np.uint64)
    whole = ck.gf31_product(crcs)
    parts = [ck.gf31_product(c) for c in np.array_split(crcs, 8)]
    merged = ck.gf31_product(np.array(parts, np.uint64))
    assert whole == merged


def _run_cli_env(args, env):
    """In-process CLI run with temporary env overrides; returns stdout."""
    import contextlib
    import io
    import os

    from samtools_tpu.cli import main as cli_main
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli_main(args)
        assert rc == 0
        return buf.getvalue()
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_flagstat_cli_mesh_equals_host():
    """The flagstat TOOL sharded over 8 devices == the host run —
    N-chip stdout equality at the CLI level (test.pl threads=>2
    analog)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    host = _run_cli_env(["flagstat", BAM1], {"SAMTPU_SHARDS": "1"})
    sharded = _run_cli_env(["flagstat", BAM1], {"SAMTPU_SHARDS": "all"})
    assert host == sharded and host


def test_flagstat_cli_mesh_json_tsv():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    for fmt in ("json", "tsv"):
        host = _run_cli_env(["flagstat", "-O", fmt, BAM1],
                            {"SAMTPU_SHARDS": "1"})
        sharded = _run_cli_env(["flagstat", "-O", fmt, BAM1],
                               {"SAMTPU_SHARDS": "8"})
        assert host == sharded and host
