"""addreplacerg + reheader golden tests (reference
test.pl:test_addrprg/test_reheader)."""

import os
import subprocess
import sys

import pytest

R = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, stdin=None):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env, input=stdin)
    return p.returncode, p.stdout


def no_pg(text: str):
    return [l for l in text.splitlines() if not l.startswith("@PG")]


ADDRPRG_CASES = [
    ("1_fixup.sam.expected", 0,
     ["-O", "sam", "-m", "overwrite_all", f"{R}/addrprg/1_fixup.sam"]),
    ("2_fixup_orphan.sam.expected", 0,
     ["-O", "sam", "-m", "orphan_only",
      f"{R}/addrprg/2_fixup_orphan.sam"]),
    ("3_fixup.sam.expected", 1,
     ["-O", "sam", "-R", "1#9", f"{R}/addrprg/1_fixup.sam"]),
    ("4_fixup_norg.sam.expected", 0,
     ["-O", "sam", "-r", "@RG\\tID:1#8\\tCN:SC",
      f"{R}/addrprg/4_fixup_norg.sam"]),
    ("1_fixup.sam.expected", 0,
     ["-O", "sam", "-m", "overwrite_all", "-R", "1#8",
      f"{R}/addrprg/1_fixup.sam"]),
    ("4_fixup_norg.sam.expected", 0,
     ["-O", "sam", "-r", "ID:1#8", "-r", "CN:SC",
      f"{R}/addrprg/4_fixup_norg.sam"]),
    ("5_editrg.sam.expected", 0,
     ["-O", "sam", "-w", "-r",
      "@RG\\tID:1#8\\tCN:Sanger\\tDS:Testing the editing code.",
      f"{R}/addrprg/1_fixup.sam"]),
]


@pytest.mark.parametrize("expected,want_rc,args", ADDRPRG_CASES,
                         ids=[str(i) for i in range(len(ADDRPRG_CASES))])
def test_addreplacerg_golden(expected, want_rc, args):
    rc, out = run_cli(["addreplacerg"] + args)
    assert rc == want_rc
    want = open(f"{R}/addrprg/{expected}").read()
    assert no_pg(out.decode("latin-1")) == no_pg(want)


def _norm(text: str):
    hdr, rec = [], []
    for line in text.splitlines():
        (hdr if line.startswith("@") else rec).append(line)
    return sorted(hdr), rec


def _strip_vn(text: str) -> str:
    import re
    return re.sub(r"\tVN:.*", "", text)


def test_reheader_golden(tmp_path):
    bam = tmp_path / "v.bam"
    rc, out = run_cli(["view", "-b", "--no-PG", "-o", str(bam),
                       f"{R}/dat/view.001.sam"])
    assert rc == 0
    rc, out = run_cli(["reheader", f"{R}/reheader/hdr.sam", str(bam)])
    assert rc == 0
    rc, sam = run_cli(["view", "-h", "--no-PG", "-"], stdin=out)
    assert rc == 0
    got = _strip_vn(sam.decode("latin-1"))
    want = open(f"{R}/reheader/1_view1.sam.expected").read()
    assert _norm(got) == _norm(want)


def test_reheader_command(tmp_path):
    bam = tmp_path / "v.bam"
    rc, _ = run_cli(["view", "-b", "--no-PG", "-o", str(bam),
                     f"{R}/dat/view.001.sam"])
    assert rc == 0
    rc, out = run_cli(["reheader", "-c",
                       "sed 's/2014 Genome/2019 Genome/g'", str(bam)])
    assert rc == 0
    rc, sam = run_cli(["view", "-h", "--no-PG", "-"], stdin=out)
    assert rc == 0
    got = _strip_vn(sam.decode("latin-1"))
    want = open(f"{R}/reheader/4_view1.sam.expected").read()
    assert _norm(got) == _norm(want)
