"""samtools split golden tests (reference test.pl:test_split).

Comparison mirrors test.pl's ignore_pg_header + reorder_header: @PG
lines dropped, header lines sorted, records compared verbatim."""

import os
import subprocess
import sys

import pytest

R = "/root/reference/test/split"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd):
    env = dict(os.environ, SAMTPU_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    p = subprocess.run([sys.executable, "-m", "samtools_tpu"] + args,
                       capture_output=True, env=env, cwd=cwd)
    return p.returncode


def norm(path):
    hdr, rec = [], []
    for line in open(path):
        line = line.rstrip("\n")
        if line.startswith("@PG"):
            continue
        (hdr if line.startswith("@") else rec).append(line)
    return sorted(hdr), rec


CASES = [
    (["--output-fmt", "sam", "-u", "unk.sam", "-f", "split.tmp.%#.%."],
     "split.sam",
     {"split.tmp.0.sam": "split.expected.grp1.sam",
      "split.tmp.1.sam": "split.expected.grp2.sam",
      "unk.sam": "split.expected.unk.sam"}),
    (["--output-fmt", "sam", "-u", "unk.sam", "-p", "5", "-f",
      "split.tmp.%#.%."], "split.sam",
     {"split.tmp.00000.sam": "split.expected.grp1.sam",
      "split.tmp.00001.sam": "split.expected.grp2.sam",
      "unk.sam": "split.expected.unk.sam"}),
    (["--output-fmt", "sam", "-u", "unk.sam", "-f", "split.tmp.%!.%."],
     "split.sam",
     {"split.tmp.grp1.sam": "split.expected.grp1.sam",
      "split.tmp.grp2.sam": "split.expected.grp2.sam",
      "unk.sam": "split.expected.unk.sam"}),
    (["--output-fmt", "sam", "-d", "RG", "-u", "unk.sam", "-f",
      "split.tmp.%!.%."], "split.sam",
     {"split.tmp.grp1.sam": "split.expected.grp1.sam",
      "split.tmp.grp2.sam": "split.expected.grp2.sam",
      "split.tmp.grp3.sam": "split.expected_d_RG.grp3.sam",
      "unk.sam": "split.expected_d_RG.unk.sam"}),
    (["--output-fmt", "sam", "-d", "an", "-u", "unk.sam", "-f",
      "split.tmp.%!.%."], "split.sam",
     {"split.tmp.aardvark.sam": "split.expected_d_an.aardvark.sam",
      "split.tmp.badger.sam": "split.expected_d_an.badger.sam",
      "split.tmp.cat.sam": "split.expected_d_an.cat.sam",
      "split.tmp.dog.sam": "split.expected_d_an.dog.sam",
      "unk.sam": "split.expected_d_an.unk.sam"}),
    (["--output-fmt", "sam", "-d", "an", "-M", "3", "-u", "unk.sam",
      "-f", "split.tmp.%!.%."], "split.sam",
     {"split.tmp.badger.sam": "split.expected_d_an.badger.sam",
      "split.tmp.cat.sam": "split.expected_d_an.cat.sam",
      "split.tmp.dog.sam": "split.expected_d_an.dog.sam",
      "unk.sam": "split.expected_d_an_M_3.unk.sam"}),
    (["--output-fmt", "sam", "-f", "split.tmp.%!.%.", "-d", "nn", "-u",
      "unk.sam"], "split_d_nn.sam",
     {"split.tmp.-2.sam": "split.expected_d_nn.-2.sam",
      "split.tmp.-1.sam": "split.expected_d_nn.-1.sam",
      "split.tmp.1.sam": "split.expected_d_nn.1.sam",
      "split.tmp.2.sam": "split.expected_d_nn.2.sam",
      "unk.sam": "split.expected_d_nn.unk.sam"}),
    (["--output-fmt", "sam", "-f", "split.tmp.%!.%.", "-p", "4", "-d",
      "nn", "-u", "unk.sam"], "split_d_nn.sam",
     {"split.tmp.-0002.sam": "split.expected_d_nn.-2.sam",
      "split.tmp.-0001.sam": "split.expected_d_nn.-1.sam",
      "split.tmp.0001.sam": "split.expected_d_nn.1.sam",
      "split.tmp.0002.sam": "split.expected_d_nn.2.sam",
      "unk.sam": "split.expected_d_nn.unk.sam"}),
]


@pytest.mark.parametrize("args,inp,out_map", CASES,
                         ids=[str(i) for i in range(len(CASES))])
def test_split_golden(tmp_path, args, inp, out_map):
    rc = run_cli(["split"] + args + [f"{R}/{inp}"], cwd=str(tmp_path))
    assert rc == 0
    for fn, exp in out_map.items():
        assert norm(tmp_path / fn) == norm(f"{R}/{exp}"), fn
