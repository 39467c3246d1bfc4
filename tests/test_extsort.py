"""Unit tests for the batched external-merge machinery (io/extsort.py).

Covers the bounded-memory heap-style merge: a source whose coordinates lie
entirely ahead of the merge frontier (per-chromosome merges, spill runs from
nearly-sorted input) must not be buffered wholesale before emission starts
(reference behavior: bam_sort.c:1849 k-way heap holds one record per source).
"""

import numpy as np
import pytest

from samtools_tpu.core.batch import ReadBatch
from samtools_tpu.io.extsort import merge_packed_iters


def mkbatch(pos, tid=0):
    pos = np.asarray(pos, np.int64)
    n = len(pos)
    qname = np.frombuffer(b"r" * n, np.uint8).copy()
    b = ReadBatch(
        n=n,
        tid=np.full(n, tid, np.int32),
        pos=pos,
        mapq=np.zeros(n, np.uint8),
        flag=np.full(n, 4, np.uint16),
        mtid=np.full(n, -1, np.int32),
        mpos=np.full(n, -1, np.int64),
        tlen=np.zeros(n, np.int64),
        qname=qname,
        qname_off=np.arange(n + 1, dtype=np.int64),
        cigar_off=np.zeros(n + 1, np.int64),
        seq_off=np.zeros(n + 1, np.int64),
        aux_off=np.zeros(n + 1, np.int64),
    )
    return b


def pack_pos(batch):
    return batch.pos.astype(np.uint64)


def batched(arr, size):
    for s in range(0, len(arr), size):
        yield mkbatch(arr[s:s + size])


def merged_positions(iters, max_chunk=None):
    out = []
    for chunk in merge_packed_iters(iters, pack_pos):
        if max_chunk is not None:
            assert chunk.n <= max_chunk, (
                f"emitted chunk of {chunk.n} rows exceeds bound {max_chunk}")
        out.append(chunk.pos)
    return np.concatenate(out) if out else np.empty(0, np.int64)


def test_interleaved_merge_sorted():
    a = np.arange(0, 4000, 2)
    b = np.arange(1, 4000, 2)
    got = merged_positions([batched(a, 128), batched(b, 128)])
    assert np.array_equal(got, np.sort(np.concatenate([a, b])))


def test_disjoint_merge_bounded():
    """A 2-source disjoint merge must stream, not slurp source 1.

    With batches of 100 rows the pool cap is 400 rows, so no emitted
    chunk (nor any internal pool) may approach the 12000-row second
    source; the old implementation emitted it as one chunk."""
    a = np.arange(0, 3000)
    b = np.arange(10000, 22000)
    got = merged_positions([batched(a, 100), batched(b, 100)],
                           max_chunk=2 * 4 * 100 + 200)
    assert np.array_equal(got, np.concatenate([a, b]))


def test_disjoint_reverse_order_sources():
    a = np.arange(10000, 16000)
    b = np.arange(0, 3000)
    got = merged_positions([batched(a, 100), batched(b, 100)],
                           max_chunk=2 * 4 * 100 + 200)
    assert np.array_equal(got, np.concatenate([b, a]))


def test_tie_stability_by_source_then_sequence():
    """Equal keys must come out in (source index, record index) order —
    the reference's heap_lt tie rule (bam_sort.c:227-273)."""
    a = np.zeros(500, np.int64)
    b = np.zeros(500, np.int64)
    chunks = list(merge_packed_iters(
        [batched(a, 64), batched(b, 64)], pack_pos))
    # re-derive source of each emitted row via a marker in mapq
    src_iters = []
    for s, arr in enumerate((a, b)):
        def gen(arr=arr, s=s):
            for st in range(0, len(arr), 64):
                bb = mkbatch(arr[st:st + 64])
                bb.mapq = np.full(bb.n, s, np.uint8)
                yield bb
        src_iters.append(gen())
    marks = np.concatenate(
        [c.mapq for c in merge_packed_iters(src_iters, pack_pos)])
    assert len(marks) == 1000
    # all of source 0 before any of source 1
    assert np.array_equal(marks, np.r_[np.zeros(500), np.ones(500)]
                          .astype(np.uint8))


def test_empty_batches_are_skipped():
    def gen_with_empties(arr):
        for st in range(0, len(arr), 50):
            yield mkbatch(np.empty(0, np.int64))
            yield mkbatch(arr[st:st + 50])
        yield mkbatch(np.empty(0, np.int64))
    a = np.arange(0, 300)
    b = np.arange(150, 450)
    got = merged_positions([gen_with_empties(a), gen_with_empties(b)])
    assert np.array_equal(got, np.sort(np.concatenate([a, b])))


def test_none_key_raises_clear_error():
    def bad_pack(batch):
        return None
    with pytest.raises(ValueError, match="packed sort key"):
        list(merge_packed_iters([batched(np.arange(10), 5)], bad_pack))


def test_single_source_passthrough():
    a = np.arange(0, 1000)
    got = merged_positions([batched(a, 100)])
    assert np.array_equal(got, a)


def test_generic_merge_disjoint_bounded(tmp_path):
    """SpillSorter generic-key path on disjoint runs stays streaming."""
    from samtools_tpu.io.extsort import SpillSorter
    from samtools_tpu.io.header import SamHeader

    hdr = SamHeader.from_text("@SQ\tSN:c1\tLN:1000000\n")
    key_fn = lambda b: (b.pos,)
    sorter = SpillSorter(hdr, key_fn, "lex", mem_bytes=1 << 16,
                         tmpprefix=str(tmp_path / "t"))
    rng = np.random.default_rng(0)
    allpos = []
    # nearly-sorted input: ascending blocks => disjoint spill runs
    for blk in range(6):
        pos = np.sort(rng.integers(blk * 100000, (blk + 1) * 100000, 2000))
        allpos.append(pos)
        sorter.add(mkbatch(pos))
    kind, it = sorter.finish()
    assert kind == "spill"
    got = []
    biggest = 0
    for chunk in it:
        biggest = max(biggest, chunk.n)
        got.append(chunk.pos)
    got = np.concatenate(got)
    assert np.array_equal(got, np.sort(np.concatenate(allpos)))
    # old behavior buffered nearly everything and emitted one huge chunk
    assert biggest < 11000
