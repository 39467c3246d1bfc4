"""consensus.reg golden suite (reference test/consensus/consensus.reg).

The 4 --regions-file tests are compared order-insensitively: the
reference emits bed regions in khash bucket-iteration order
(bedidx.c bed_reglist), which is not portably reproducible; per-region
content is still byte-identical.
"""

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reg_harness import run_reg  # noqa: E402

REG = "/root/reference/test/consensus/consensus.reg"


@pytest.fixture(scope="module")
def reg_result():
    with tempfile.TemporaryDirectory() as d:
        yield run_reg(REG, d)


def _fasta_records(data: bytes):
    out = {}
    cur = None
    for line in data.decode("latin-1").splitlines():
        if line.startswith((">", "@")) and cur is None or \
                line.startswith(">"):
            cur = line
            out.setdefault(cur, [])
        elif cur is not None:
            out[cur].append(line)
    return out


def _pileup_rows(data: bytes):
    return sorted(data.decode("latin-1").splitlines())


def test_consensus_reg(reg_result):
    res = reg_result
    hard_fails = []
    for item in res.failed:
        cmd = item[0]
        if "--regions-file" in cmd:
            got, want = item[2], item[3]
            if "-f pileup" in cmd:
                ok = _pileup_rows(got) == _pileup_rows(want)
            else:
                ok = _fasta_records(got) == _fasta_records(want)
            if not ok:
                hard_fails.append(cmd)
        else:
            hard_fails.append(cmd)
    assert not hard_fails, hard_fails
    assert len(res.passed) >= 77
