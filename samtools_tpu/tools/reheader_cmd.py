"""samtools reheader — replace a BAM header.

Byte-parity target: /root/reference/bam_reheader.c: new header (from a
SAM file or from a -c command transforming the existing header) + the
original records, with a samtools @PG appended unless -P/--no-PG.
BAM in-place is rejected as in the reference; CRAM is unsupported here.
"""

from __future__ import annotations

import subprocess
import sys

from .. import SAMTOOLS_PARITY_VERSION
from ..io.files import read_alignments, write_alignments
from ..io.header import SamHeader
from .common import (UsageError, gnu_getopt, print_error,
                     print_error_errno)


def usage(fp):
    fp.write(
        "Usage: samtools reheader [-P] in.header.sam in.bam > out.bam\n"
        "   or  samtools reheader [-P] -i in.header.sam file.bam\n"
        "   or  samtools reheader [-P] -c CMD in.bam > out.bam\n"
        "\n"
        "Options:\n"
        "    -P, --no-PG      Do not generate a @PG header line\n"
        "    -i, --in-place   Modify the file in-place (CRAM only)\n"
        "    -c, --command    Use CMD to modify the header\n")


def main_reheader(argv: list[str]) -> int:
    no_pg = False
    inplace = False
    external = None
    try:
        opts, args = gnu_getopt(argv, "hiPc:",
                                ["help", "in-place", "no-PG", "command="])
    except UsageError:
        usage(sys.stderr)
        return 1
    for o, v in opts:
        if o in ("-P", "--no-PG"):
            no_pg = True
        elif o in ("-i", "--in-place"):
            inplace = True
        elif o in ("-c", "--command"):
            external = v
        elif o in ("-h", "--help"):
            usage(sys.stdout)
            return 0
        else:
            usage(sys.stderr)
            return 1

    if (len(args) != 2 or external) and (len(args) != 1 or not external):
        usage(sys.stderr)
        return 1

    if external:
        bam_path = args[0]
        try:
            f = read_alignments(bam_path)
        except OSError as e:
            print_error_errno("reheader", "fail to open file '%s'",
                              bam_path, exc=e)
            return 1
        p = subprocess.run(external, shell=True,
                           input=f.header.text.encode("latin-1"),
                           capture_output=True)
        if p.returncode != 0:
            sys.stderr.write(
                "[main_reheader] failed to read the header from '%s'.\n"
                % external)
            return 1
        new_header = SamHeader.from_text(p.stdout.decode("latin-1"))
    else:
        hdr_path, bam_path = args
        try:
            hf = read_alignments(hdr_path)
        except OSError as e:
            print_error_errno("reheader",
                              "fail to read the header from '%s'",
                              hdr_path, exc=e)
            return 1
        new_header = hf.header
        try:
            f = read_alignments(bam_path)
        except OSError as e:
            print_error_errno("reheader", "fail to open file '%s'",
                              bam_path, exc=e)
            return 1

    if inplace:
        print_error("reheader", "cannot reheader BAM '%s' in-place",
                    bam_path)
        return 1

    if not no_pg:
        new_header = new_header.add_pg_line(
            "samtools", "samtools",
            "samtools reheader " + " ".join(argv),
            SAMTOOLS_PARITY_VERSION)

    # records keep their original tids; the new header must supply
    # compatible @SQ lines (no validity checks, as in the reference)
    b = f.batch
    if not new_header.ref_names:
        new_header.ref_names = f.header.ref_names
        new_header.ref_lens = f.header.ref_lens
    write_alignments(None, new_header, b, fmt="bam", include_header=True)
    return 0
