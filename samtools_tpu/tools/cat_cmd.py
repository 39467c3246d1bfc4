"""samtools cat — concatenate alignment files.

Reference analog: /root/reference/bam_cat.c (BGZF stream splice without
decode).  This implementation decodes and re-encodes the record stream —
semantically identical output (same records, same order); the zero-copy
block splice is a later optimization.
"""

from __future__ import annotations

import sys

import numpy as np

from .. import SAMTOOLS_PARITY_VERSION
from ..core.batch import ReadBatch
from ..io.files import infer_output_format, read_alignments, write_alignments
from .common import (GlobalArgs, UsageError, gnu_getopt, handle_global_opt,
                     print_error, print_error_errno)


def usage(fp):
    fp.write(
        "Usage: samtools cat [options] <in1.bam>  [... <inN.bam>]\n"
        "       samtools cat [options] <in1.cram> [... <inN.cram>]\n"
        "\n"
        "Concatenate BAM or CRAM files, first those in <bamlist.fofn>, then those\n"
        "on the command line.\n"
        "\n"
        "Options: -b FILE  list of input BAM/CRAM file names, one per line\n"
        "         -h FILE  copy the header from FILE [default is 1st input file]\n"
        "         -o FILE  output BAM/CRAM\n"
        "         --no-PG  do not add a PG line\n")


def main_cat(argv: list[str]) -> int:
    ga = GlobalArgs()
    fn_list = None
    header_file = None
    fn_out = None
    no_pg = False
    fast = False
    try:
        opts, args = gnu_getopt(argv, "b:h:o:q@:", ["no-PG", "fast"])
    except UsageError:
        usage(sys.stderr)
        return 1
    for o, v in opts:
        if o == "-b":
            fn_list = v
        elif o == "-h":
            header_file = v
        elif o == "-o":
            fn_out = v
        elif o in ("-q", "--fast"):
            fast = True
        elif o == "--no-PG":
            no_pg = True
        elif handle_global_opt(ga, o, v):
            pass
        else:
            usage(sys.stderr)
            return 1
    paths = []
    if fn_list:
        try:
            paths.extend(l.strip() for l in open(fn_list) if l.strip())
        except OSError as e:
            print_error_errno("cat", 'Cannot open "%s"', fn_list, exc=e)
            return 1
    paths.extend(args)
    if not paths:
        usage(sys.stderr)
        return 1

    header = None
    batches = []
    for path in paths:
        try:
            f = read_alignments(path, threads=ga.nthreads)
        except OSError as e:
            print_error_errno("cat", 'fail to open file "%s"', path, exc=e)
            return 1
        if header is None:
            header = f.header
        else:
            if f.header.ref_names != header.ref_names:
                print_error("cat",
                            "different sequence dictionaries in \"%s\"",
                            path)
                return 1
        batches.append(f.batch)
    if header_file:
        try:
            hf = read_alignments(header_file)
            header = hf.header
        except OSError as e:
            print_error_errno("cat", 'fail to open file "%s"', header_file,
                              exc=e)
            return 1
    out = ReadBatch.concat(batches)
    if not no_pg:
        cl = "samtools cat " + " ".join(argv)
        header = header.add_pg_line("samtools", "samtools", cl,
                                    SAMTOOLS_PARITY_VERSION)
    fmt = infer_output_format(fn_out, ga.out_fmt, "bam")
    level = 1 if fast else 6
    write_alignments(fn_out, header, out, fmt=fmt, threads=ga.nthreads,
                     level=level, include_header=True)
    return 0
