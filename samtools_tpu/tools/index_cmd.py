"""samtools index — build BAI/CSI for a BAM.

Byte-parity target for CLI behavior: /root/reference/bam_index.c:36-160
(-b/-c/-m/-M/-o options).  The index we write is a valid BAI/CSI that both
this framework and htslib-based tools can consume (chunk layout may differ
from htslib's hash-ordered emission; semantics are identical).
"""

from __future__ import annotations

import sys

from ..io import index as idxmod
from ..io.bam import read_bam_indexed, reg2bin_vec
from ..io.files import detect_format
from .common import (GlobalArgs, UsageError, gnu_getopt, handle_global_opt,
                     print_error, print_error_errno)
from ..core.flags import FUNMAP

import numpy as np


def usage(fp):
    fp.write(
        "Usage: samtools index -M [-bc] [-m INT] <in1.bam> <in2.bam>...\n"
        "   or: samtools index [-bc] [-m INT] <in.bam> [out.index]\n"
        "Options:\n"
        "  -b, --bai            Generate BAI-format index for BAM files [default]\n"
        "  -c, --csi            Generate CSI-format index for BAM files\n"
        "  -m, --min-shift INT  Set minimum interval size for CSI indices to 2^INT [14]\n"
        "  -M                   Interpret all filename arguments as files to be indexed\n"
        "  -o, --output FILE    Write index to FILE [alternative to <out.index> as an argument]\n"
        "  -@ INT               Sets the number of threads [none]\n")


def build_index_for(path: str, out_path: str | None, csi: bool,
                    min_shift: int, threads: int) -> int:
    fmt = detect_format(path)
    if fmt == "cram":
        return _build_crai(path, out_path)
    if fmt not in ("bam",):
        print_error("index",
                    '"%s" is in a format that cannot be usefully indexed',
                    path)
        return 1
    f, vstart, vend = read_bam_indexed(path, threads=threads)
    b = f.batch
    end = b.end_pos()
    if csi:
        depth = 5
        # grow depth until max contig len fits (hts_idx_init behavior)
        max_len = max(f.header.ref_lens + [0])
        while max_len > (1 << (min_shift + depth * 3)):
            depth += 1
        bins = _reg2bin_csi(b.pos, end, min_shift, depth)
        idx = idxmod.build_index(b.tid, b.pos, end, vstart, vend, bins,
                                 (b.flag & FUNMAP) == 0, f.header.n_refs,
                                 min_shift=min_shift, depth=depth)
        if out_path is None:
            out_path = path + ".csi"
        idxmod.write_csi(out_path, idx)
    else:
        if (np.asarray(f.header.ref_lens, np.int64) > (1 << 29)).any():
            # BAI cannot address >2^29; auto-switch as htslib does
            return build_index_for(path, out_path and out_path + ".csi",
                                   True, 14, threads)
        bins = reg2bin_vec(b.pos.astype(np.int64), end.astype(np.int64))
        idx = idxmod.build_index(b.tid, b.pos, end, vstart, vend, bins,
                                 (b.flag & FUNMAP) == 0, f.header.n_refs)
        if out_path is None:
            out_path = path + ".bai"
        idxmod.write_bai(out_path, idx)
    return 0


def _reg2bin_csi(beg, end, min_shift: int, depth: int) -> np.ndarray:
    """Vectorized reg2bin for arbitrary min_shift/depth (CSI)."""
    beg = beg.astype(np.int64)
    e = end.astype(np.int64) - 1
    out = np.zeros(beg.shape, np.int64)
    done = np.zeros(beg.shape, bool)
    for level in range(depth, 0, -1):
        s = min_shift + (depth - level) * 3
        t = ((1 << (level * 3)) - 1) // 7
        hit = (~done) & ((beg >> s) == (e >> s))
        out[hit] = t + (beg[hit] >> s)
        done |= hit
    return out.astype(np.uint32)


def main_index(argv: list[str]) -> int:
    ga = GlobalArgs()
    csi = False
    min_shift = 14
    multiple = False
    out_path = None
    try:
        opts, args = gnu_getopt(argv, "bcm:Mo:@:",
                                ["bai", "csi", "min-shift=", "output="])
    except UsageError:
        usage(sys.stderr)
        return 1
    for o, v in opts:
        if o in ("-b", "--bai"):
            csi = False
        elif o in ("-c", "--csi"):
            csi = True
        elif o in ("-m", "--min-shift"):
            csi = True
            min_shift = int(v)
        elif o == "-M":
            multiple = True
        elif o in ("-o", "--output"):
            out_path = v
        elif not handle_global_opt(ga, o, v):
            usage(sys.stderr)
            return 1
    if not args:
        usage(sys.stdout)
        return 1
    if not multiple and len(args) == 2:
        out_path = args[1]
        args = args[:1]
    elif len(args) > 1 and not multiple:
        print_error("index",
                    "too many files to index. Use -M to index multiple files")
        return 1
    for path in args:
        try:
            r = build_index_for(path, out_path if len(args) == 1 else None,
                                csi, min_shift, ga.nthreads)
        except OSError as e:
            print_error_errno("index", 'failed to open "%s"', path, exc=e)
            return 1
        if r:
            return 1
    return 0


def _build_crai(path: str, out_path: str | None) -> int:
    """CRAI from CRAM container/slice headers (htslib cram_index_build):
    one line per slice: seq_id, start, span, container offset, slice
    header offset within the container, slice byte size."""
    from ..io.cram import CramReader, parse_block, parse_slice_header
    from ..io.cram_encode import write_crai
    data = open(path, "rb").read()
    rd = CramReader(data)
    lines = []
    for cont, i in rd.containers():
        cstart = rd.pos  # container header offset (pos advances on resume)
        if rd.is_eof_container(cont):
            break
        if cont.n_records == 0 and cont.n_bases == 0:
            continue
        body_start = i
        for lm in cont.landmarks:
            sl_start = body_start + lm
            blk, j = parse_block(data, sl_start, rd.major)
            sh = parse_slice_header(blk.data(), rd.major)
            for _ in range(sh.n_blocks):
                _b, j = parse_block(data, j, rd.major)
            lines.append((sh.ref_seq_id, sh.ref_start, sh.ref_span,
                          cstart, lm, j - sl_start))
    write_crai(out_path or (path + ".crai"), lines)
    return 0
