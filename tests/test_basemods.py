"""Base-modification (MM/ML) decoding and mpileup -M output parity.

Golden contract: /root/reference/test/mpileup/mpileup.reg lines 190-192
(mp2.out, mp2-noins.out) on the mod1.sam fixture.
"""

import subprocess
import sys

import pytest

from samtools_tpu.ops.basemods import format_mods, parse_mm

MPD = "/root/reference/test/mpileup"


def run_cli(args):
    r = subprocess.run(
        [sys.executable, "-m", "samtools_tpu"] + args,
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    return r.stdout


def test_parse_mm_forward():
    # C+m with deltas over C bases; N matches any base
    seq = "AGCTCTCCAGAGTCGNACGCCATYCGCGCGCCACCA"
    mods = parse_mm(seq, False, "C+m,2,2,1,4,1;N+n,15,2;",
                    [128, 153, 179, 204, 230, 215, 240])
    assert mods[6] == [("+", "m", 128)]
    assert mods[17] == [("+", "m", 153)]
    assert mods[20] == [("+", "m", 179)]
    assert mods[31] == [("+", "m", 204)]
    assert mods[34] == [("+", "m", 230)]
    assert mods[15] == [("+", "n", 215)]  # N matches all; 16th base
    assert mods[18] == [("+", "n", 240)]


def test_parse_mm_reverse_complement_walk():
    # reverse read: walk from stored 3' end with complemented bases
    seq = "AGCTCTCCAGAGTCGNACGCCATYCGCGCGCCACCA"
    mods = parse_mm(seq, True, "G-m,0,1,4,1,2;",
                    [230, 204, 179, 153, 128])
    # original = revcomp(seq); first G in original = stored C at qpos 34
    assert mods[34] == [("-", "m", 230)]
    assert mods[31] == [("-", "m", 204)]


def test_parse_mm_multi_code_position_major():
    # C+mh: ML is position-major, code-minor
    seq = "CCCC"
    mods = parse_mm(seq, False, "C+mh,0,0;", [10, 20, 30, 40])
    assert mods[0] == [("+", "m", 10), ("+", "h", 20)]
    assert mods[1] == [("+", "m", 30), ("+", "h", 40)]


def test_parse_mm_chebi_and_missing_ml():
    mods = parse_mm("ACGT", False, "C+76792,0;", None)
    assert mods[1] == [("+", 76792, -1)]
    assert format_mods(mods[1]) == "[+(76792)]"


def test_format_mods():
    assert format_mods([("+", "m", 128)]) == "[+m128]"
    assert format_mods([("+", "m", 0), ("+", "h", 159)]) == "[+m0+h159]"
    assert format_mods([("-", "m", 230), ("-", "h", 6)]) == "[-m230-h6]"


@pytest.mark.parametrize("extra,golden", [
    ([], "mp2.out"),
    (["--no-output-ins-mods"], "mp2-noins.out"),
])
def test_mpileup_mods_golden(extra, golden):
    out = run_cli(["mpileup", "-x", "-Q0", "--output-mods"] + extra
                  + [f"{MPD}/mod1.sam"])
    exp = open(f"{MPD}/expected/{golden}").read()
    assert out == exp
