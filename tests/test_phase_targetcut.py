"""phase and targetcut behavioral tests.

The reference test suite has no goldens for these tools
(test.pl covers neither), so these validate output structure and
internal consistency against the documented formats
(/root/reference/phase.c:704-716, /root/reference/cut_target.c:131).
"""

import os
import subprocess
import sys

R = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, stdin=None):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env, input=stdin)
    return p.returncode, p.stdout


def test_targetcut_basic():
    rc, out = run_cli(["targetcut", f"{R}/dat/mpileup.1.sam"])
    assert rc == 0
    lines = out.decode().splitlines()
    assert lines, "expected at least one consensus segment"
    for l in lines:
        f = l.split("\t")
        # SAM-like: name region, flag 0, chr, 1-based pos, mapq 60, CIGAR
        assert f[1] == "0" and f[4] == "60"
        name_chr, name_range = f[0].split(":")
        assert name_chr == f[2]
        beg, end = map(int, name_range.split("-"))
        assert int(f[3]) == beg
        assert f[5] == "%dM" % (end - beg + 1)
        assert len(f[9]) == end - beg + 1   # seq length matches
        assert len(f[10]) == len(f[9])      # qual length matches


def test_targetcut_min_quality_shrinks_segments():
    rc, out_lo = run_cli(["targetcut", "-Q", "0",
                          f"{R}/dat/mpileup.1.sam"])
    rc2, out_hi = run_cli(["targetcut", "-Q", "45",
                           f"{R}/dat/mpileup.1.sam"])
    assert rc == 0 and rc2 == 0
    cov_lo = sum(len(l.split("\t")[9])
                 for l in out_lo.decode().splitlines())
    cov_hi = sum(len(l.split("\t")[9])
                 for l in out_hi.decode().splitlines())
    assert cov_lo >= cov_hi


def test_phase_report_structure():
    rc, out = run_cli(["phase", f"{R}/dat/mpileup.1.sam"])
    assert rc == 0
    lines = out.decode().splitlines()
    assert lines[0] == "CC"
    kinds = {l.split("\t")[0] for l in lines if "\t" in l}
    # phase sets + markers emitted for this het-rich fixture
    assert "PS" in kinds
    assert any(k.startswith("M") for k in kinds)
    # every PS opens a block terminated by //
    assert lines.count("//") == sum(
        1 for l in lines if l.startswith("PS\t"))
    # M lines have 11 columns and valid alleles
    for l in lines:
        if l.startswith(("M0", "M1", "M2")):
            f = l.split("\t")
            assert len(f) == 11
            assert f[4] in "ACGTX" and f[5] in "ACGTX"


def test_phase_b_outputs(tmp_path):
    pre = f"{tmp_path}/ph"
    rc, _ = run_cli(["phase", "-b", pre, f"{R}/dat/mpileup.1.sam"])
    assert rc == 0
    total = 0
    for mid in ("0", "1", "chimera"):
        path = f"{pre}.{mid}.bam"
        assert os.path.exists(path)
        rc, out = run_cli(["view", "-c", path])
        assert rc == 0
        total += int(out)
    rc, out = run_cli(["view", "-c", "-F", "0x704",
                       f"{R}/dat/mpileup.1.sam"])
    # all primary, QC-pass, non-dup mapped reads are routed somewhere
    assert total == int(out)


def test_phase_deterministic(tmp_path):
    rc1, out1 = run_cli(["phase", f"{R}/dat/mpileup.1.sam"])
    rc2, out2 = run_cli(["phase", f"{R}/dat/mpileup.1.sam"])
    assert rc1 == rc2 == 0
    assert out1 == out2
