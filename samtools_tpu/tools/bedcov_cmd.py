"""samtools bedcov — summed depth per BED region.

Byte-parity target: /root/reference/bedcov.c — per region, the sum over
positions of the mpileup depth (pileup entries include deletions and ref
skips unless -j), optional -d per-position threshold counts and -c read
counts.  Vectorized: the per-region sum is just a count of pileup entries
inside the region.
"""

from __future__ import annotations

import sys

import numpy as np

from ..core import flags as F
from ..io.files import read_alignments
from ..ops.pileup import build_pileup
from .common import (GlobalArgs, UsageError, gnu_getopt, handle_global_opt,
                     print_error, print_error_errno)
from .flags_cmd import str2flag

DEFAULT_FLAGS = F.FUNMAP | F.FSECONDARY | F.FQCFAIL | F.FDUP
BEDCOLS = ["chrom", "chromStart", "chromEnd", "name", "score", "strand",
           "thickStart", "thickEnd", "itemRgb", "blockCount", "blockSizes",
           "blockStarts"]


def usage(fp):
    fp.write(
        "Usage: samtools bedcov [options] <in.bed> <in1.bam> [...]\n\n"
        "Options:\n"
        "      -Q, --min-MQ <int>  mapping quality threshold [0]\n"
        "      -X                  use customized index files\n"
        "      -g <flags>          remove the specified flags from the set "
        "used to filter out reads\n"
        "      -G <flags>          add the specified flags to the set used "
        "to filter out reads\n"
        "                          The default set is "
        "UNMAP,SECONDARY,QCFAIL,DUP or 0x704\n"
        "      -j                  do not include deletions (D) and ref "
        "skips (N) in bedcov computation\n"
        "      --max-depth <int>   sets the maximum depth used in the "
        "mpileup algorithm\n"
        "      -d <int>            depth threshold\n"
        "      -c                  add an additional column showing read "
        "count\n"
        "      -H                  print a comment/header line with column "
        "information.\n")


def main_bedcov(argv: list[str]) -> int:
    ga = GlobalArgs()
    min_mapq = 0
    flags = DEFAULT_FLAGS
    skip_dn = False
    min_depth = -1
    do_rcount = False
    print_header = False
    has_index_file = False
    try:
        opts, args = gnu_getopt(argv, "Q:Xg:G:jd:Hc",
                                ["min-MQ=", "min-mq=", "max-depth="])
    except UsageError:
        usage(sys.stderr)
        return 1
    for o, v in opts:
        if o in ("-Q", "--min-MQ", "--min-mq"):
            min_mapq = int(v)
        elif o == "-X":
            has_index_file = True
        elif o == "-c":
            do_rcount = True
        elif o == "-H":
            print_header = True
        elif o == "-g":
            fl = str2flag(v)
            if fl < 0 or fl > ((F.FSUPPLEMENTARY << 1) - 1):
                print_error("bedcov",
                            'Flag value "%s" is not supported', v)
                return 1
            flags &= ~fl
        elif o == "-G":
            fl = str2flag(v)
            if fl < 0 or fl > ((F.FSUPPLEMENTARY << 1) - 1):
                print_error("bedcov",
                            'Flag value "%s" is not supported', v)
                return 1
            flags |= fl
        elif o == "-j":
            skip_dn = True
        elif o == "-d":
            min_depth = int(v)
        elif o == "--max-depth":
            pass  # depth cap; unbounded here
        elif handle_global_opt(ga, o, v):
            pass
        else:
            usage(sys.stderr)
            return 1
    if len(args) < 2:
        usage(sys.stderr)
        return 1
    bed_path = args[0]
    if has_index_file:
        n = (len(args) - 1) // 2
        bam_paths = args[1:1 + n]
    else:
        bam_paths = args[1:]

    files = []
    for path in bam_paths:
        try:
            files.append(read_alignments(path, threads=ga.nthreads))
        except OSError as e:
            sys.stderr.write(
                f"ERROR: fail to open index BAM file '{path}'\n")
            return 2
    header = files[0].header

    # per-file filtered pileups per contig, cached
    states: dict = {}

    def get_pileup(fi: int, tid: int):
        key = (fi, tid)
        if key in states:
            return states[key]
        b = files[fi].batch
        fl = b.flag.astype(np.int64)
        sel = np.nonzero((b.tid == tid) & ((fl & flags) == 0)
                         & (b.mapq.astype(np.int64) >= min_mapq))[0]
        sub = b.take(sel)
        p = build_pileup(sub)
        states[key] = (sub, p)
        return states[key]

    status = 0
    hdr_done = not print_header
    out = sys.stdout
    try:
        bed_data = open(bed_path, "rt").read()
    except OSError as e:
        print_error_errno("bedcov", "can't open BED file '%s'", bed_path,
                          exc=e)
        return 2

    for line in bed_data.split("\n"):
        if not line:
            continue
        if line[0] == "#":
            if not hdr_done and line.startswith("#chrom\t"):
                out.write(line)
                _header_cols(out, bam_paths, min_depth, do_rcount)
                hdr_done = True
            continue
        if line.startswith("track ") or line.startswith("browser "):
            continue
        if not hdr_done:
            fields = line.count("\t")
            cols = []
            for i in range(fields + 1):
                cols.append(BEDCOLS[i] if i < len(BEDCOLS) else ".")
            out.write("#" + "\t".join(cols))
            _header_cols(out, bam_paths, min_depth, do_rcount)
            hdr_done = True
        parts = line.split()
        if len(parts) < 3:
            sys.stderr.write(f"Errors in BED line '{line}'\n")
            status = 2
            continue
        chrom = parts[0]
        tid = header.tid(chrom)
        try:
            beg = int(parts[1])
            end = int(parts[2])
        except ValueError:
            sys.stderr.write(f"Errors in BED line '{line}'\n")
            status = 2
            continue
        if tid < 0 or end < beg:
            sys.stderr.write(f"Errors in BED line '{line}'\n")
            status = 2
            continue
        cols = []
        depth_cols = []
        count_cols = []
        L = max(end - beg, 1)
        visited = np.zeros(L, bool)
        pd_real = []
        for fi in range(len(files)):
            sub, p = get_pileup(fi, tid)
            inreg = (p.pos >= beg) & (p.pos < end)
            real = inreg & ~(p.is_del | p.is_refskip)
            cols.append(int(real.sum()) if skip_dn else int(inreg.sum()))
            if min_depth >= 0:
                visited |= np.bincount((p.pos[inreg] - beg)
                                       .astype(np.int64),
                                       minlength=L) > 0
                pd_real.append(np.bincount((p.pos[real] - beg)
                                           .astype(np.int64), minlength=L))
            if do_rcount:
                endp = sub.end_pos()
                count_cols.append(int(((sub.pos < end)
                                       & (endp > beg)).sum()))
        if min_depth >= 0:
            # only positions the pileup visits (>=1 entry in any file)
            for pd in pd_real:
                depth_cols.append(int((visited
                                       & (pd >= min_depth)).sum()))
        row = line
        for v in cols:
            row += "\t%d" % v
        for v in depth_cols:
            row += "\t%d" % v
        for v in count_cols:
            row += "\t%d" % v
        out.write(row + "\n")
    return status


def _header_cols(out, bam_paths, min_depth, do_rcount):
    for p in bam_paths:
        out.write(f"\t{p}_cov")
    if min_depth >= 0:
        for p in bam_paths:
            out.write(f"\t{p}_depth")
    if do_rcount:
        for p in bam_paths:
            out.write(f"\t{p}_count")
    out.write("\n")
