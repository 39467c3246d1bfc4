"""markdup / collate golden parity."""

import os
import subprocess
import sys

import pytest

R = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, outfile=None):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env)
    return p.returncode, p.stdout.decode("latin-1")


def _no_pg(text: str):
    return [l for l in text.splitlines() if not l.startswith("@PG")]


MARKDUP_CASES = [
    ("5_markdup", []),
    ("6_remove_dups", ["-r"]),
    ("7_mark_supp_dup", ["-S"]),
    ("8_optical_dup", ["-S", "-d", "100", "--mode", "s", "-t"]),
    ("9_optical_dup_qcfail", ["-S", "-d", "2500", "--mode", "s", "-t",
                              "--include-fails"]),
    ("10_optical_chain", ["-S", "-d", "2500", "--mode", "s", "-t", "-S"]),
    ("11_optical_dup_regex",
     ["-S", "-d", "100", "--mode", "s", "-t", "--read-coords",
      "^([0-9]+):([0-9]+):([[:print:]]+)", "--coords-order", "xyt"]),
    ("12_optical_chain_regex",
     ["-S", "-d", "2500", "--mode", "s", "-t", "--read-coords",
      "([[:digit:]]+):([[:digit:]]+)$", "--coords-order", "xy"]),
    ("13_optical_barcode_tag",
     ["-S", "-d", "100", "--mode", "s", "-t", "--barcode-tag", "BX"]),
    ("14_optical_barcode_name",
     ["-S", "-d", "100", "--mode", "s", "-t", "--barcode-name"]),
    ("17_read_group",
     ["-d", "100", "--mode", "s", "-t", "--use-read-groups"]),
    ("18_primary_duplicate_count",
     ["--mode", "t", "-t", "--duplicate-count", "--barcode-tag", "BC",
      "-S"]),
    ("19_move_umi_to_tag", ["--barcode-name", "--move-umi-to-tag"]),
    ("20_move_umi_in_middle",
     ["--barcode-rgx", ":([A-Z]{7}):", "--umi-separator", ":",
      "--move-umi-to-tag"]),
]


@pytest.mark.parametrize("name,extra", MARKDUP_CASES,
                         ids=[c[0] for c in MARKDUP_CASES])
def test_markdup_golden(name, extra):
    rc, out = run_cli(["markdup"] + extra
                      + ["-O", "sam", "--no-PG",
                         f"{R}/markdup/{name}.sam", "-"])
    want = open(f"{R}/markdup/{name}.expected.sam").read()
    assert rc == 0
    assert _no_pg(out) == _no_pg(want)


def test_markdup_rejects_name_sorted():
    rc, _ = run_cli(["markdup", "-O", "sam", "--no-PG",
                     f"{R}/markdup/1_name_sort.sam", "-"])
    assert rc != 0


def test_markdup_rejects_bad_order():
    rc, _ = run_cli(["markdup", "-O", "sam", "--no-PG",
                     f"{R}/markdup/2_bad_order.sam", "-"])
    assert rc != 0


def test_collate_golden():
    rc, out = run_cli(["collate", "--output-fmt=sam", "-O",
                       f"{R}/dat/test_input_1_d.sam"])
    want = open(f"{R}/collate/collate.expected.sam").read()
    assert rc == 0
    assert _no_pg(out) == _no_pg(want)


@pytest.mark.parametrize("name,extra", [
    ("1_fast_collate.sam.expected", ["-f"]),
    ("2_fast_collate_with_tmp_used.sam.expected", ["-f", "-r", "4"]),
])
def test_collate_fast(tmp_path, name, extra):
    out_path = tmp_path / "out.sam"
    rc, _ = run_cli(["collate", "--output-fmt=sam"] + extra
                    + [f"{R}/collate/fast_collate.sam", "-o",
                       str(out_path)])
    want = open(f"{R}/collate/{name}").read()
    assert rc == 0
    assert _no_pg(out_path.read_text()) == _no_pg(want)


@pytest.mark.parametrize("extra", [[], ["-S"], ["-t", "-d", "100"],
                                   ["-r"], ["--duplicate-count"]],
                         ids=["plain", "supp", "optical", "remove", "dc"])
def test_markdup_streamed_chunks_match_single(tmp_path, extra):
    """The bounded-memory chunked stream (BamStream windows + flush)
    must produce byte-identical output to the single-chunk path.
    Forcing a tiny decode window makes every golden fixture span many
    chunks (reference analog: the klist window + tmp_file second pass,
    bam_markdup.c:1700)."""
    src = f"{R}/markdup/5_markdup.sam"
    bam = str(tmp_path / "in.bam")
    rc, _ = run_cli(["view", "-b", "-o", bam, src])
    assert rc == 0
    outs = []
    for win in (None, "2048"):
        env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
                   PYTHONPATH=REPO)
        if win:
            env["SAMTPU_MARKDUP_WINDOW"] = win
        p = subprocess.run(
            [sys.executable, "-m", "samtools_tpu", "markdup", "-O", "sam",
             "--no-PG"] + extra + [bam, "-"],
            capture_output=True, env=env)
        assert p.returncode == 0, p.stderr.decode()
        outs.append(p.stdout)
    assert outs[0] == outs[1]


@pytest.mark.parametrize("extra", [[], ["-f"], ["-f", "-r", "2"],
                                   ["-n", "4"]],
                         ids=["plain", "fast", "tiny-ring", "4bins"])
def test_collate_streamed_matches_inmem(tmp_path, extra):
    """Streamed scatter-to-buckets collate must equal the in-memory
    path (bamshuf.c temp-file architecture vs single batch)."""
    src = f"{R}/dat/test_input_1_a.sam"
    bam = str(tmp_path / "in.bam")
    rc, _ = run_cli(["view", "-b", "-o", bam, src])
    assert rc == 0
    outs = []
    for inp in (bam, src):  # bam input streams; sam input is in-memory
        rc, out = run_cli(["collate"] + extra
                          + ["-O", "-O", "--output-fmt", "sam", "--no-PG",
                             inp])
        assert rc == 0
        outs.append(out)
    assert _no_pg(outs[0]) == _no_pg(outs[1])
