"""samtools idxstats — per-contig mapped/unmapped counts.

Byte-parity target: bam_idxstats (/root/reference/bam_index.c:231-310):
index meta-bin fast path for BAM with .bai/.csi, full-scan fallback
otherwise; output rows ``name\\tlen\\tmapped\\tunmapped`` + ``*`` row.
"""

from __future__ import annotations

import sys

import numpy as np

from ..core.flags import FUNMAP
from ..io import index as idxmod
from ..io.files import detect_format, read_alignments
from .common import (GlobalArgs, UsageError, gnu_getopt, handle_global_opt,
                     print_error, print_error_errno)


def usage(fp):
    fp.write("Usage: samtools idxstats [options] <in.bam>\n"
             "  -X           Include customized index file\n")


def slow_counts(path: str, threads: int):
    """Full-scan fallback (reference slow_idxstats, bam_index.c:173-221).
    Vectorized: bincount over tids split by FUNMAP."""
    f = read_alignments(path, threads=threads)
    b = f.batch
    n_ref = f.header.n_refs
    tid = b.tid.astype(np.int64)
    # position-sorted check as the reference does
    if b.n:
        t = tid.copy()
        changes = np.nonzero(np.diff(t) != 0)[0]
        seen = t[np.concatenate([[0], changes + 1])] if b.n else []
        vals, first = np.unique(seen, return_index=True)
        if len(vals) != len(seen):
            print_error("idxstats", "file is not position sorted")
            return None, None
    unmapped = (b.flag & FUNMAP) != 0
    shifted = tid + 1  # -1 -> 0
    m = np.bincount(shifted[~unmapped], minlength=n_ref + 1)
    u = np.bincount(shifted[unmapped], minlength=n_ref + 1)
    return f.header, np.stack([m, u], axis=1)


def main_idxstats(argv: list[str]) -> int:
    ga = GlobalArgs()
    index_file = None
    has_index_file = False
    try:
        opts, args = gnu_getopt(argv, "@:X", [])
    except UsageError:
        usage(sys.stderr)
        return 1
    for o, v in opts:
        if o == "-X":
            has_index_file = True
        elif not handle_global_opt(ga, o, v):
            usage(sys.stderr)
            return 1
    want = 2 if has_index_file else 1
    if len(args) != want:
        usage(sys.stdout if not args else sys.stderr)
        return 0 if not args else 1
    path = args[0]
    if has_index_file:
        index_file = args[1]
    try:
        fmt = detect_format(path)
    except OSError as e:
        print_error_errno("idxstats", 'failed to open "%s"', path, exc=e)
        return 1

    idx = None
    if fmt == "bam":
        idx_path = index_file or idxmod.find_index_file(path)
        if idx_path:
            try:
                idx = idxmod.read_bai(idx_path)
            except Exception:
                idx = None
        if idx is None:
            print_error("idxstats",
                        'fail to load index for "%s", '
                        "reverting to slow method", path)

    if idx is not None:
        # header needed for names/lengths
        from ..io.bam import decode_header
        from ..io import bgzf
        data = np.frombuffer(bgzf.read_file(path, threads=ga.nthreads),
                             np.uint8)
        header, _ = decode_header(data)
        for i in range(header.n_refs):
            m, u = idx.stat(i)
            print(f"{header.ref_names[i]}\t{header.ref_lens[i]}\t{m}\t{u}")
        print(f"*\t0\t0\t{idx.n_no_coor}")
        return 0

    header, counts = slow_counts(path, ga.nthreads)
    if header is None:
        print_error("idxstats", 'failed to process "%s"', path)
        return 1
    for i in range(header.n_refs):
        print(f"{header.ref_names[i]}\t{header.ref_lens[i]}"
              f"\t{counts[i + 1, 0]}\t{counts[i + 1, 1]}")
    print(f"*\t0\t{counts[0, 0]}\t{counts[0, 1]}")
    return 0
