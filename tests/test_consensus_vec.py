"""Bitwise differential tests: vectorized gap5 consensus scorer
(ops/consensus_vec) vs the scalar oracle (tools/consensus_cmd
calculate_consensus_gap5[m]), which is itself goldens-validated."""

import numpy as np
import pytest

from samtools_tpu.ops import consensus_vec as V
from samtools_tpu.tools import consensus_cmd as C


class FakeRead:
    """Minimal PRead stand-in for calculate_consensus_gap5."""

    def __init__(self, base4, qual, mapq, nm10, poly, ref_skip=False,
                 q0_255=False):
        self.base4 = base4
        self.qual = qual
        self.mapq = mapq
        self.ref_skip = ref_skip
        self.l_qseq = 2
        self.qual_arr = np.array([255 if q0_255 else 30, 30], np.uint8)
        self.rpos = 0
        self.seq_offset = 0
        self.cd = [0, (int(nm10) & ((1 << 24) - 1)) | (int(poly) << 24)]


def make_opts(mode=None, ambig=0, min_depth=1, cutoff=10):
    o = C.Opts()
    if mode is not None:
        o.mode = mode
    o.ambig = ambig
    o.min_depth = min_depth
    o.cons_cutoff = cutoff
    o.cp_recall = C.ConsProbs(o.P_het, o.P_indel, o.het_scale,
                              o.homopoly_redux * 10, o.qcal, o.mode)
    o.cp_precise = C.ConsProbs(o.P_het, o.P_indel, 1.0,
                               o.homopoly_redux * 10, o.qcal, o.mode)
    return o


def random_columns(rng, ncols, with_mqual=True):
    cols = []
    for _ in range(ncols):
        depth = int(rng.integers(0, 40))
        plist = []
        for _ in range(depth):
            base4 = int(rng.choice([1, 2, 4, 8, 15, 16, 16]))
            qual = int(rng.choice([0, 1, 5, 13, 30, 40, 93, 255]))
            mapq = int(rng.integers(0, 61))
            nm10 = int(rng.integers(0, 300))
            poly = int(rng.integers(0, 8))
            rs = bool(rng.random() < 0.05)
            q0 = bool(rng.random() < 0.05)
            plist.append(FakeRead(base4, qual, mapq, nm10, poly, rs, q0))
        cols.append(plist)
    return cols


def vec_from_cols(cols, opts, cp, use_mqual):
    ents = []
    col_off = [0]
    for plist in cols:
        for p in plist:
            nm = p.cd[1] & ((1 << 24) - 1)
            ents.append((p.base4, p.qual, p.mapq, nm / 10.0,
                         p.cd[1] >> 24, len(plist), p.ref_skip,
                         p.qual_arr[0] == 255))
        col_off.append(len(ents))
    col_off = np.array(col_off, np.int64)
    if ents:
        base4, qual, mapq, nm, poly, td, rs, q0 = map(
            np.array, zip(*ents))
    else:
        base4 = qual = mapq = nm = poly = td = rs = q0 = \
            np.empty(0, np.int64)
    b6, q, q2 = V.entry_quals(qual, base4, mapq, nm, poly, td, opts,
                              use_mqual, np.asarray(q0, bool)
                              & (np.asarray(qual) == 0))
    keep = (np.asarray(qual, np.int64) >= opts.min_qual) \
        & ~np.asarray(rs, bool)
    # NB: scalar min_qual compares the RAW p.qual (pre-255 rule)
    S, counts, depth = V.gap5_scores(col_off, b6, q, q2, keep, cp)
    return V.gap5_finalize(S, counts, depth, cp)


@pytest.mark.parametrize("use_mqual", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_gap5_vec_matches_scalar(seed, use_mqual):
    rng = np.random.default_rng(seed)
    opts = make_opts()
    opts.use_mqual = 1 if use_mqual else 0
    cols = random_columns(rng, 300)
    flags = C.CONS_MQUAL if use_mqual else 0
    got = vec_from_cols(cols, opts, opts.cp_recall, use_mqual)
    for i, plist in enumerate(cols):
        want = C.calculate_consensus_gap5(0, flags, len(plist), plist,
                                          opts, opts.cp_recall)
        assert got[0][i] == want.call, (i, "call")
        assert got[1][i] == want.phred, (i, "phred", got[1][i],
                                         want.phred)
        assert got[2][i] == want.het_call, (i, "het")
        assert got[3][i] == want.het_logodd, (i, "logodd", got[3][i],
                                              want.het_logodd)
        assert got[4][i] == want.depth, (i, "depth")


@pytest.mark.parametrize("seed", [3, 4])
def test_gap5_mixed_blend_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    opts = make_opts(mode=C.MODE_MIXED)
    opts.use_mqual = 1
    cols = random_columns(rng, 300)
    P = vec_from_cols(cols, opts, opts.cp_precise, True)
    R = vec_from_cols(cols, opts, opts.cp_recall, True)
    got = V.gap5m_blend(P, R)
    for i, plist in enumerate(cols):
        want = C.calculate_consensus_gap5m(0, C.CONS_MQUAL, len(plist),
                                           plist, opts)
        assert got[0][i] == want.call, (i, "call")
        assert got[1][i] == want.phred, (i, "phred")
        assert got[2][i] == want.het_call, (i, "het")
        assert got[3][i] == want.het_logodd, (i, "logodd")


def test_consensus_base_vec_matches_scalar():
    rng = np.random.default_rng(7)
    for ambig in (0, 1):
        for min_depth, cutoff in ((1, 10), (5, 10), (1, 25)):
            opts = make_opts(ambig=ambig, min_depth=min_depth,
                             cutoff=cutoff)
            opts.use_mqual = 1
            cols = random_columns(rng, 200)
            cons = vec_from_cols(cols, opts, opts.cp_recall, True)
            cb, cq = V.consensus_base_vec(cons, opts)
            for i, plist in enumerate(cols):
                wb, wq = C.consensus_base(opts, plist, 0, len(plist))
                assert cb[i] == wb, (i, chr(cb[i]), chr(wb))
                assert cq[i] == wq, (i, cq[i], wq)


def test_native_nm_init_matches_python():
    """Native nm_init_batch vs the Python per-read oracle."""
    from samtools_tpu.io import native
    if not native.has_nm_init():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(11)
    for homopoly in (0.0, 0.3):
        reads = []
        for _ in range(200):
            L = int(rng.integers(1, 150))
            seq = rng.choice([1, 2, 4, 8], L).astype(np.uint8)
            qual = rng.integers(0, 60, L).astype(np.uint8)
            nops = rng.integers(1, 4)
            cig = []
            rem = L
            for k in range(nops - 1):
                take = int(rng.integers(0, rem // 2 + 1))
                op = int(rng.choice([0, 4, 1]))
                if take:
                    cig.append((take << 4) | op)
                    rem -= take
            cig.append((rem << 4) | 0)
            md = b""
            if rng.random() < 0.7:
                md = str(rng.integers(0, L)).encode() + b"A" \
                    + str(rng.integers(0, L)).encode()
            reads.append((seq, qual, np.array(cig, np.uint32), md))
        # flats
        seq_off = np.zeros(len(reads) + 1, np.int64)
        cig_off = np.zeros(len(reads) + 1, np.int64)
        md_off = np.zeros(len(reads) + 1, np.int64)
        for i, (s, q, cg, md) in enumerate(reads):
            seq_off[i + 1] = seq_off[i] + len(s)
            cig_off[i + 1] = cig_off[i] + len(cg)
            md_off[i + 1] = md_off[i] + len(md)
        seq = np.concatenate([r[0] for r in reads])
        qual = np.concatenate([r[1] for r in reads]).copy()
        cig = np.concatenate([r[2] for r in reads])
        mdf = np.frombuffer(b"".join(r[3] for r in reads),
                            np.uint8).copy()
        opts = make_opts()
        opts.homopoly_fix = homopoly
        out, mq = native.nm_init_batch(
            qual.copy(), seq, seq_off, cig, cig_off, mdf, md_off,
            1, opts.adj_qual, 0, homopoly, opts.nm_halo, opts.sc_cost)
        # python oracle per read
        for i, (s, q, cg, md) in enumerate(reads):
            class P:
                pass
            p = P()
            p.l_qseq = len(s)
            p.qual_arr = q.copy()
            p.seq = s
            p.cigar = cg
            p.md = md.decode() if md else None
            p.cd = None
            C.nm_init(type("cl", (), {"opts": opts})(), p)
            want = np.array(p.cd, np.int64)
            got = out[seq_off[i]:seq_off[i + 1]].astype(np.int64)
            assert np.array_equal(got, want), (i, homopoly)
            if homopoly:
                assert np.array_equal(mq[seq_off[i]:seq_off[i + 1]],
                                      p.qual_arr), (i, "qualfix")


def test_sharded_consensus_matches_serial(tmp_path):
    """SAMTPU_SHARDS span workers + seam stitching == serial output
    (pileup_loop_parallel analog, bam_consensus.c:2626)."""
    import os
    import subprocess
    import sys
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = "/root/reference/test/consensus/consen2.sam"
    bam = str(tmp_path / "in.bam")
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    subprocess.run([sys.executable, "-m", "samtools_tpu", "view", "-b",
                    "--write-index", "-o", bam, src], env=env, check=True)
    outs = []
    for shards in ("1", "3"):
        e = dict(env, SAMTPU_SHARDS=shards)
        p = subprocess.run([sys.executable, "-m", "samtools_tpu",
                            "consensus", bam], capture_output=True,
                           env=e)
        assert p.returncode == 0, p.stderr.decode()
        outs.append(p.stdout)
    assert outs[0] == outs[1]


def test_sharded_mpileup_matches_serial(tmp_path):
    import os
    import subprocess
    import sys
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    R = "/root/reference/test/mpileup"
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    outs = []
    for shards in ("1", "4"):
        e = dict(env, SAMTPU_SHARDS=shards)
        p = subprocess.run([sys.executable, "-m", "samtools_tpu",
                            "mpileup", "-B", "-f", f"{R}/c1.fa",
                            f"{R}/c1#pad2.bam"], capture_output=True,
                           env=e)
        assert p.returncode == 0, p.stderr.decode()
        outs.append(p.stdout)
    assert outs[0] == outs[1]


def test_device_scores_with_risky_gating_match_exact():
    """Device (f32 segment-sum) scorer + risky gating + exact host
    recompute of flagged columns == the exact host engine, bit for
    bit (cpu jax backend)."""
    rng = np.random.default_rng(21)
    opts = make_opts()
    opts.use_mqual = 1
    cols = random_columns(rng, 800)
    cp = opts.cp_recall
    # exact
    exact = vec_from_cols(cols, opts, cp, True)
    # device path
    ents = []
    col_off = [0]
    for plist in cols:
        for p in plist:
            nm = p.cd[1] & ((1 << 24) - 1)
            ents.append((p.base4, p.qual, p.mapq, nm / 10.0,
                         p.cd[1] >> 24, len(plist), p.ref_skip,
                         p.qual_arr[0] == 255))
        col_off.append(len(ents))
    col_off = np.array(col_off, np.int64)
    base4, qual, mapq, nm, poly, td, rs, q0 = map(np.array, zip(*ents))
    b6, q, q2 = V.entry_quals(qual, base4, mapq, nm, poly, td, opts,
                              True, np.asarray(q0, bool)
                              & (np.asarray(qual) == 0))
    keep = (np.asarray(qual, np.int64) >= opts.min_qual) \
        & ~np.asarray(rs, bool)
    S32, counts, depth = V.gap5_scores_device(col_off, b6, q, q2, keep,
                                              cp)
    fin, risky = V.finalize_risky(S32, counts, depth, cp)
    fin = [a.copy() for a in fin]
    sel = np.nonzero(risky)[0]
    if sel.size:
        # exact recompute of the flagged columns
        ent_sel = np.concatenate(
            [np.arange(col_off[c], col_off[c + 1]) for c in sel]) \
            if sel.size else np.empty(0, np.int64)
        off2 = np.zeros(sel.size + 1, np.int64)
        np.cumsum(col_off[sel + 1] - col_off[sel], out=off2[1:])
        S2, c2, d2 = V.gap5_scores(off2, b6[ent_sel], q[ent_sel],
                                   q2[ent_sel], keep[ent_sel], cp)
        fix = V.gap5_finalize(S2, c2, d2, cp)
        for k in range(5):
            fin[k][sel] = fix[k]
    for k in range(5):
        assert np.array_equal(fin[k], exact[k]), (k, "field mismatch",
                                                  int(risky.sum()))


def test_consensus_reg_device_forced():
    """consensus.reg gap5 commands with the device scorer forced
    (SAMTPU_DEVICE=1, cpu jax backend) — byte parity must hold through
    the f32 segment-sum + risky-gating path."""
    import os
    import sys
    import tempfile
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reg_harness import run_reg
    old = os.environ.get("SAMTPU_DEVICE")
    os.environ["SAMTPU_DEVICE"] = "1"
    try:
        with tempfile.TemporaryDirectory() as d:
            res = run_reg("/root/reference/test/consensus/consensus.reg",
                          d, env_extra={"SAMTPU_DEVICE": "1"},
                          cmd_filter=lambda cmd: "-m simple" not in cmd
                          and "--mode simple" not in cmd
                          # bed-region output order is the documented
                          # khash-iteration quirk (KNOWN_ISSUES), and
                          # the main suite compares it
                          # order-insensitively
                          and "--regions-file" not in cmd)
    finally:
        if old is None:
            os.environ.pop("SAMTPU_DEVICE", None)
        else:
            os.environ["SAMTPU_DEVICE"] = old
    assert not res.failed, res.failed[:5]
