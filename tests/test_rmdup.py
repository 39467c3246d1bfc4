"""rmdup behavioral tests (no reference goldens exist; validated
against the documented bam_rmdup.c semantics: best-by-sum-qual per
(pos,isize) key, mate removal via name set, library-scoped keys)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HDR = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:c1\tLN:1000\n"


def pair(name, pos, mpos, qual_char, flag1=99, flag2=147):
    tlen = mpos + 10 - pos
    q = qual_char * 10
    return (
        f"{name}\t{flag1}\tc1\t{pos}\t60\t10M\t=\t{mpos}\t{tlen}\t"
        f"ACGTACGTAC\t{q}\n"
        f"{name}\t{flag2}\tc1\t{mpos}\t60\t10M\t=\t{pos}\t{-tlen}\t"
        f"ACGTACGTAC\t{q}\n")


def run_cli(args, stdin=None):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env, input=stdin)
    return p.returncode, p.stdout


def sort_sam(text: str, tmp_path) -> str:
    inp = f"{tmp_path}/in.sam"
    open(inp, "w").write(text)
    out = f"{tmp_path}/srt.sam"
    rc, _ = run_cli(["sort", "-O", "sam", "-o", out, inp])
    assert rc == 0
    return out


def test_rmdup_pe_keeps_best(tmp_path):
    # two duplicate pairs at same (pos, isize); r_hi has better quals
    sam = HDR + pair("r_lo", 100, 200, "#") + pair("r_hi", 100, 200, "I")
    srt = sort_sam(sam, tmp_path)
    out = f"{tmp_path}/out.sam"
    rc, _ = run_cli(["rmdup", srt, out])
    assert rc == 0
    rc, view = run_cli(["view", out])
    names = {l.split("\t")[0] for l in view.decode().splitlines()}
    assert names == {"r_hi"}


def test_rmdup_pe_distinct_positions_kept(tmp_path):
    sam = HDR + pair("a", 100, 200, "I") + pair("b", 150, 260, "I")
    srt = sort_sam(sam, tmp_path)
    out = f"{tmp_path}/out.sam"
    rc, _ = run_cli(["rmdup", srt, out])
    assert rc == 0
    rc, view = run_cli(["view", out])
    names = sorted({l.split("\t")[0] for l in view.decode().splitlines()})
    assert names == ["a", "b"]


def test_rmdup_se_mode(tmp_path):
    # single-end duplicates at the same start position
    sam = HDR
    for name, q in (("s_lo", "#"), ("s_hi", "I"), ("s_other", "I")):
        pos = 100 if name != "s_other" else 300
        sam += (f"{name}\t0\tc1\t{pos}\t60\t10M\t*\t0\t0\t"
                f"ACGTACGTAC\t{q * 10}\n")
    srt = sort_sam(sam, tmp_path)
    out = f"{tmp_path}/out.sam"
    rc, _ = run_cli(["rmdup", "-s", srt, out])
    assert rc == 0
    rc, view = run_cli(["view", out])
    names = sorted({l.split("\t")[0] for l in view.decode().splitlines()})
    assert names == ["s_hi", "s_other"]


def test_rmdup_no_dups_is_identity(tmp_path):
    srt = f"{tmp_path}/ex1.bam"
    rc, _ = run_cli(["sort", "-o", srt,
                     "/root/reference/examples/ex1.sam.gz"])
    assert rc == 0
    out = f"{tmp_path}/rm.bam"
    rc, _ = run_cli(["rmdup", srt, out])
    assert rc == 0
    rc, c1 = run_cli(["view", "-c", srt])
    rc, c2 = run_cli(["view", "-c", out])
    assert int(c1) == int(c2)
