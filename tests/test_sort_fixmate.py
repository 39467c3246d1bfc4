"""sort/fixmate golden parity (test.pl-style, @PG lines ignored)."""

import contextlib
import io
import os
import subprocess
import sys

import pytest

R = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env)
    return p.returncode, p.stdout.decode("latin-1")


def _no_pg(text: str):
    return [l for l in text.splitlines() if not l.startswith("@PG")]


SORT_CASES = [
    ("pos", ["-m", "10M", f"{R}/dat/test_input_1_a.bam"]),
    ("name", ["-n", "-m", "10M", f"{R}/dat/test_input_1_a.bam"]),
    ("name2", ["-N", "-m", "10M", f"{R}/dat/test_input_1_b.bam"]),
    ("name3", ["-n", "-m", "10M", f"{R}/dat/sort_name_input_1.sam"]),
    ("tag.rg", ["-t", "RG", "-m", "10M", f"{R}/dat/test_input_1_a.bam"]),
    ("tag.rg.n", ["-n", "-t", "RG", "-m", "10M",
                  f"{R}/dat/test_input_1_a.bam"]),
    ("tag.as", ["-t", "AS", "-m", "10M", f"{R}/dat/test_input_1_d.sam"]),
    ("tag.fi", ["-t", "FI", "-m", "10M", f"{R}/dat/test_input_1_d.sam"]),
    ("template-coordinate", ["--template-coordinate", "-m", "10M",
                             f"{R}/sort/template-coordinate.sort.sam"]),
    ("template-coordinate.cell-barcode",
     ["--template-coordinate", "-m", "10M",
      f"{R}/sort/template-coordinate.cell-barcode.sort.sam"]),
    ("template-coordinate-hardclip",
     ["--template-coordinate", "-m", "10M",
      f"{R}/sort/template-coordinate-hardclip.sort.sam"]),
]


@pytest.mark.parametrize("name,args", SORT_CASES,
                         ids=[c[0] for c in SORT_CASES])
def test_sort_golden(name, args):
    rc, out = run_cli(["sort"] + args + ["-O", "SAM", "-o", "-"])
    want = open(f"{R}/sort/{name}.sort.expected.sam").read()
    assert rc == 0
    assert _no_pg(out) == _no_pg(want)


def test_sort_obsolete_invocation_fails():
    rc, _ = run_cli(["sort", f"{R}/dat/test_input_1_a.bam", "/tmp/prefix"])
    assert rc != 0


FIXMATE_CASES = [
    ("2_isize_overflow", ["-z", "off"]),
    ("3_reverse_read_pp_lt", []),
    ("4_reverse_read_pp_equal", []),
    ("5_ct", ["-c"]),
    ("6_ct_replace", ["-c"]),
    ("7_two_read_mapped", ["-z", "off"]),
    ("sanitize", []),
]


@pytest.mark.parametrize("name,extra", FIXMATE_CASES,
                         ids=[c[0] for c in FIXMATE_CASES])
def test_fixmate_golden(name, extra):
    rc, out = run_cli(["fixmate"] + extra
                      + ["-O", "sam", f"{R}/fixmate/{name}.sam", "-"])
    want = open(f"{R}/fixmate/{name}.sam.expected").read()
    assert rc == 0
    assert _no_pg(out) == _no_pg(want)


def test_fixmate_rejects_coord_sorted():
    rc, _ = run_cli(["fixmate", "-O", "sam",
                     f"{R}/fixmate/1_coord_sort.sam", "-"])
    assert rc != 0


MINHASH_CASES = [
    ("minimiser-basic", ["-M", "-K10"]),
    ("minimiser-indexed", ["-M", "-K10", "-I", f"{R}/dat/mpileup.ref.fa"]),
    ("minimiser-indexed-poly",
     ["-M", "-H", "-K10", "-I", f"{R}/dat/mpileup.ref.fa"]),
]


@pytest.fixture(scope="module")
def minhash_input(tmp_path_factory):
    """test.pl:3552 pipeline: mpileup.1.sam -> bam -> reset --dupflag."""
    d = tmp_path_factory.mktemp("minhash")
    bam = str(d / "auto_indexed.bam")
    rst = str(d / "reset.bam")
    rc, _ = run_cli(["view", "-b", "-o", bam, f"{R}/dat/mpileup.1.sam"])
    assert rc == 0
    rc, _ = run_cli(["reset", "--dupflag", "-O", "bam", "-o", rst, bam])
    assert rc == 0
    return rst


@pytest.mark.parametrize("name,extra", MINHASH_CASES,
                         ids=[c[0] for c in MINHASH_CASES])
def test_sort_minhash_golden(name, extra, minhash_input):
    rc, out = run_cli(["sort", "-m", "10M"] + extra
                      + ["-O", "SAM", "-o", "-", minhash_input])
    want = open(f"{R}/sort/{name}.sam").read()
    assert rc == 0
    assert _no_pg(out) == _no_pg(want)


@pytest.mark.parametrize("extra", [[], ["-n"], ["-N"], ["-t", "RG"]],
                         ids=["coord", "name-nat", "name-lex", "tag-rg"])
def test_sort_external_spill_matches_in_memory(extra, tmp_path):
    """bam_sort.c:3490 arena/spill/k-way-merge analog: a tiny -m budget
    forces multiple spill runs; the batched merge must reproduce the
    in-memory sort byte-for-byte (stability = file idx, record idx)."""
    src = f"{R}/mpileup/mpileup.1.bam"
    rc, mem = run_cli(["sort"] + extra + ["-O", "SAM", "-o", "-", src])
    assert rc == 0
    rc, ext = run_cli(["sort"] + extra
                      + ["-m", "60K", "-T", str(tmp_path / "sp"),
                         "-O", "SAM", "-o", "-", src])
    assert rc == 0
    assert _no_pg(ext) == _no_pg(mem)
    assert not list(tmp_path.iterdir())  # spill runs cleaned up


def test_sort_external_packed_merge_stress(tmp_path):
    """Many spill runs through the packed-key incremental merge: a
    shuffled simulated batch (with unmapped and reverse reads) sorted
    under a tiny arena must match the in-memory sort byte-for-byte."""
    import numpy as np
    from samtools_tpu.sim import make_header, simulate_batch
    from samtools_tpu.io.bam import write_bam
    b = simulate_batch(ref_len=1 << 16, coverage=40.0, read_len=50,
                       seed=9, paired=True)
    rng = np.random.RandomState(1)
    perm = rng.permutation(b.n)
    b = b.take(perm)
    # park some reads unmapped (tid -1 sorts last)
    unm = rng.choice(b.n, 50, replace=False)
    b.tid[unm] = -1
    b.flag[unm] |= 0x4
    src = str(tmp_path / "in.bam")
    write_bam(src, make_header(1 << 16), b, threads=1)
    rc, mem = run_cli(["sort", "-O", "SAM", "-o", "-", src])
    assert rc == 0
    rc, ext = run_cli(["sort", "-m", "200K", "-T",
                       str(tmp_path / "sp"), "-O", "SAM", "-o", "-", src])
    assert rc == 0
    assert _no_pg(ext) == _no_pg(mem)


def test_fixmate_streamed_chunks_match_single(tmp_path):
    """Chunked streaming fixmate (template-run carry across windows)
    must equal the single-chunk result."""
    import subprocess
    src = f"{R}/dat/test_input_1_a.sam"
    nsort = str(tmp_path / "n.bam")
    rc, _ = run_cli(["sort", "-n", "-o", nsort, src])
    assert rc == 0
    outs = []
    for win in (None, "2048"):
        env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
                   PYTHONPATH=REPO)
        if win:
            env["SAMTPU_STREAM_WINDOW"] = win
        p = subprocess.run(
            [sys.executable, "-m", "samtools_tpu", "fixmate", "-m",
             "-O", "sam", "--no-PG", nsort, "-"],
            capture_output=True, env=env)
        assert p.returncode == 0, p.stderr.decode()
        outs.append(p.stdout)
    assert outs[0] == outs[1]
