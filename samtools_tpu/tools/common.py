"""Shared CLI infrastructure for subcommands.

Reference analogs: sam_opts.c/h (global long options + sam_global_args),
sam_utils.c (print_error/print_error_errno).  Every tool merges
GLOBAL_LONG_OPTS into its own option table, exactly as the reference's
SAM_OPT_GLOBAL_OPTIONS macro does (/root/reference/sam_opts.h:61-70).
"""

from __future__ import annotations

import getopt
import os
import sys
from dataclasses import dataclass, field


def print_error(subcommand: str, fmt: str, *args):
    """stderr message in the reference's format
    (/root/reference/sam_utils.c:46-57)."""
    sys.stdout.flush()
    msg = (fmt % args) if args else fmt
    if subcommand:
        sys.stderr.write(f"samtools {subcommand}: {msg}\n")
    else:
        sys.stderr.write(f"samtools: {msg}\n")
    sys.stderr.flush()


def print_error_errno(subcommand: str, fmt: str, *args, exc: OSError | None = None):
    extra = os.strerror(exc.errno) if exc is not None and exc.errno else None
    msg = (fmt % args) if args else fmt
    if extra:
        print_error(subcommand, "%s: %s", msg, extra)
    else:
        print_error(subcommand, "%s", msg)


@dataclass
class GlobalArgs:
    """Parsed global options (reference: sam_global_args, sam_opts.h:36-46)."""
    in_fmt: str | None = None
    in_opts: dict = field(default_factory=dict)
    out_fmt: str | None = None
    out_opts: dict = field(default_factory=dict)
    reference: str | None = None
    nthreads: int = 0
    write_index: bool = False
    verbosity: int = 3


# long options accepted by every tool (reference sam_opts.h:61-70)
GLOBAL_LONG_OPTS = [
    "input-fmt=", "input-fmt-option=", "output-fmt=", "output-fmt-option=",
    "reference=", "threads=", "write-index", "verbosity=",
]


def _parse_fmt(val: str) -> tuple[str, dict]:
    """Parse FORMAT[,opt[=val]]... as htslib's hts_parse_format does."""
    parts = val.split(",")
    fmt = parts[0].lower()
    opts = {}
    for p in parts[1:]:
        if "=" in p:
            k, v = p.split("=", 1)
            opts[k] = v
        elif p:
            opts[p] = "1"
    return fmt, opts


def handle_global_opt(ga: GlobalArgs, opt: str, val: str,
                      short_threads: str | None = "-@",
                      short_outfmt: str | None = None,
                      short_reference: str | None = None) -> bool:
    """Apply one parsed option if it is a global one; returns True if so."""
    if opt == "--input-fmt":
        ga.in_fmt, extra = _parse_fmt(val)
        ga.in_opts.update(extra)
    elif opt == "--input-fmt-option":
        k, _, v = val.partition("=")
        ga.in_opts[k] = v
    elif opt == "--output-fmt" or (short_outfmt and opt == short_outfmt):
        ga.out_fmt, extra = _parse_fmt(val)
        ga.out_opts.update(extra)
    elif opt == "--output-fmt-option":
        k, _, v = val.partition("=")
        ga.out_opts[k] = v
    elif opt == "--reference" or (short_reference and opt == short_reference):
        ga.reference = val
    elif opt == "--threads" or (short_threads and opt == short_threads):
        ga.nthreads = int(val)
    elif opt == "--write-index":
        ga.write_index = True
    elif opt == "--verbosity":
        ga.verbosity = int(val)
        from ..core import metrics
        metrics.set_verbosity(ga.verbosity)
    else:
        return False
    return True


class UsageError(Exception):
    pass


def gnu_getopt(argv: list[str], shortopts: str, longopts: list[str]):
    """getopt.gnu_getopt with the reference's error behavior (exception →
    the caller prints usage to stderr and exits 1)."""
    try:
        return getopt.gnu_getopt(argv, shortopts, longopts + GLOBAL_LONG_OPTS)
    except getopt.GetoptError as e:
        raise UsageError(str(e)) from None


def out_level(ga: GlobalArgs) -> int:
    """Compression level from --output-fmt-option level=N (default 6)."""
    try:
        return int(ga.out_opts.get("level", 6))
    except ValueError:
        return 6


def try_region_read(path: str, threads: int, reg: str):
    """Index-driven region load: (AlignmentFile, Region) reading only the
    BAI/CSI chunks overlapping ``reg`` (the sam_itr_querys path of
    /root/reference/bam_plcmd.c:541-550), or None when the file is not an
    indexed BAM (caller falls back to the whole-file read).  Raises
    RegionError for an unparsable region, like the full-read path."""
    from ..core.regions import parse_region
    from ..io.files import AlignmentFile
    if path == "-":
        return None
    try:
        from ..io.stream import BamStream
        st = BamStream(path, threads=threads)
    except Exception:
        return None
    with st:
        if st.index() is None:
            return None
        region = parse_region(reg, st.header.tid)
        if region.tid < 0:
            return None  # "." / "*" pseudo-regions need the full file
        batch = st.query(region.tid, region.beg, region.end)
        if batch is None:
            return None
        return (AlignmentFile(header=st.header, batch=batch, format="bam"),
                region)
