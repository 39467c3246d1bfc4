"""Streaming + index-driven I/O (io/stream.py).

Parity model: a streamed/index-queried read must equal the whole-file
read + in-memory filter (the reference's sam_itr_querys vs full scan).
"""

import subprocess
import sys

import numpy as np
import pytest

BAM1 = "/root/reference/test/mpileup/mpileup.1.bam"

FIELDS = ("tid", "pos", "mapq", "flag", "mtid", "mpos", "tlen", "qname",
          "qname_off", "cigar", "cigar_off", "seq", "seq_off", "qual",
          "aux", "aux_off")


def _eq(a, b, fields=FIELDS):
    assert a.n == b.n
    for f in fields:
        assert np.array_equal(getattr(a, f), getattr(b, f)), f


@pytest.fixture(scope="module")
def whole():
    from samtools_tpu.io.files import read_alignments
    return read_alignments(BAM1)


def test_batches_concat_equals_whole(whole):
    from samtools_tpu.core.batch import ReadBatch
    from samtools_tpu.io.stream import BamStream
    # tiny window forces many chunks and leftover-record carry
    with BamStream(BAM1, window_bytes=1 << 15) as st:
        assert st.header.text == whole.header.text
        parts = list(st.batches())
    assert len(parts) >= 1
    got = parts[0] if len(parts) == 1 else ReadBatch.concat(parts)
    _eq(got, whole.batch)


def test_batches_fields_mask(whole):
    from samtools_tpu.io.stream import BamStream
    from samtools_tpu.io.native import FIELD_CIGAR
    from samtools_tpu.core.batch import ReadBatch
    with BamStream(BAM1, window_bytes=1 << 15) as st:
        parts = list(st.batches(fields=FIELD_CIGAR))
    got = parts[0] if len(parts) == 1 else ReadBatch.concat(parts)
    _eq(got, whole.batch, fields=("tid", "pos", "flag", "cigar",
                                  "cigar_off"))


def test_query_equals_filtered_whole(whole):
    from samtools_tpu.io.stream import BamStream
    b = whole.batch
    end = b.end_pos()
    with BamStream(BAM1) as st:
        assert st.index() is not None
        for tid, beg, stop in [(0, 100, 600), (0, 0, 1 << 29),
                               (0, 2000, 2001), (0, 10**7, 10**7 + 10)]:
            got = st.query(tid, beg, stop)
            keep = (b.tid == tid) & (b.pos < stop) & (end > beg)
            want = b.take(np.nonzero(keep)[0])
            _eq(got, want)


def test_query_without_index(tmp_path, whole):
    """No index file -> query returns None (caller falls back)."""
    import shutil
    from samtools_tpu.io.stream import BamStream
    p = tmp_path / "noindex.bam"
    shutil.copy(BAM1, p)
    with BamStream(str(p)) as st:
        assert st.query(0, 0, 1000) is None


def test_streaming_large_synthetic_bounded(tmp_path):
    """A synthetic multi-window BAM streams chunk by chunk; batch sizes
    stay bounded by the window."""
    from samtools_tpu.sim import make_header, simulate_batch
    from samtools_tpu.io.bam import write_bam
    from samtools_tpu.io.stream import BamStream
    batch = simulate_batch(ref_len=1 << 20, coverage=10, read_len=100,
                           seed=1, paired=False)
    p = str(tmp_path / "big.bam")
    write_bam(p, make_header(1 << 20), batch)
    total = 0
    with BamStream(p, window_bytes=1 << 18) as st:
        nb = 0
        for part in st.batches():
            total += part.n
            nb += 1
    assert total == batch.n
    assert nb > 3  # actually chunked


def test_query_on_built_index(tmp_path):
    """Index built by our own `index` tool drives query correctly."""
    from samtools_tpu.sim import make_header, simulate_batch
    from samtools_tpu.io.bam import write_bam
    from samtools_tpu.io.stream import BamStream
    batch = simulate_batch(ref_len=1 << 20, coverage=5, read_len=100,
                           seed=2, paired=False)
    p = str(tmp_path / "q.bam")
    write_bam(p, make_header(1 << 20), batch)
    r = subprocess.run([sys.executable, "-m", "samtools_tpu", "index", p],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    with BamStream(p) as st:
        got = st.query(0, 4000, 9000)
        end = batch.end_pos()
        keep = (batch.pos < 9000) & (end > 4000)
        want = batch.take(np.nonzero(keep)[0])
        _eq(got, want)


def test_mpileup_streaming_windows_match_golden():
    """Streamed windowed mpileup (halo-carried reads, per-window BAQ,
    overlap tweak) is byte-identical to the golden even when windows
    are far smaller than a read (span-block correctness seams)."""
    import contextlib
    import io
    import os
    import samtools_tpu.tools.mpileup_cmd as mp
    from samtools_tpu.cli import main

    d = "/root/reference/test/mpileup"
    cwd = os.getcwd()
    os.chdir(d)
    old = mp.WINDOW_COLS
    try:
        def run():
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                rc = main(["mpileup", "-x", "-f", "mpileup.ref.fa",
                           "mpileup.1.bam"])
            assert rc == 0
            return buf.getvalue()

        golden = open(f"{d}/expected/16.out").read()
        assert run() == golden
        mp.WINDOW_COLS = 1 << 6
        assert run() == golden
    finally:
        mp.WINDOW_COLS = old
        os.chdir(cwd)


def test_mpileup_checkpoint_resume(tmp_path):
    """Kill-and-restart: a resumed run (truncated output + saved window
    state) reproduces the uninterrupted output byte-for-byte."""
    import json
    import os
    import samtools_tpu.tools.mpileup_cmd as mp
    from samtools_tpu.cli import main

    d = "/root/reference/test/mpileup"
    cwd = os.getcwd()
    os.chdir(d)
    old = mp.WINDOW_COLS
    mp.WINDOW_COLS = 1 << 9
    try:
        full = str(tmp_path / "full.out")
        assert main(["mpileup", "-x", "mpileup.1.bam", "-o", full]) == 0
        truth = open(full).read()
        ck = str(tmp_path / "mp.ck")
        out = str(tmp_path / "ck.out")
        states = []
        orig = os.replace

        def spy(a, b):
            orig(a, b)
            if b == ck:
                states.append(json.load(open(ck)))
        os.replace = spy
        try:
            assert main(["mpileup", "-x", "mpileup.1.bam", "-o", out,
                         "--checkpoint", ck]) == 0
        finally:
            os.replace = orig
        assert open(out).read() == truth
        assert len(states) >= 3
        mid = states[len(states) // 2]
        json.dump(mid, open(ck, "w"))
        with open(out, "r+") as f:
            f.truncate(mid["out_off"])
            f.seek(mid["out_off"])
            f.write("PARTIAL###")  # crash mid-line
        assert main(["mpileup", "-x", "mpileup.1.bam", "-o", out,
                     "--checkpoint", ck]) == 0
        assert open(out).read() == truth
    finally:
        mp.WINDOW_COLS = old
        os.chdir(cwd)
