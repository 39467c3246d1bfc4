"""samtools sort — whole-batch ordering.

Reference: bam_sort.c.  The external merge sort (arena + spill + k-way
heap) collapses to one stable lexsort over the columnar batch; the
reference's tie-break by input record index is exactly lexsort stability.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from .. import SAMTOOLS_PARITY_VERSION
from ..io.files import infer_output_format, read_alignments, write_alignments
from ..ops import sort_keys as sk
from .common import (GlobalArgs, UsageError, gnu_getopt, handle_global_opt,
                     print_error, print_error_errno)


def usage(fp):
    fp.write(
        "Usage: samtools sort [options...] [in.bam]\n"
        "Options:\n"
        "  -l INT     Set compression level, from 0 (uncompressed) to 9 (best)\n"
        "  -u         Output uncompressed data (equivalent to -l 0)\n"
        "  -m INT     Set maximum memory per thread; suffix K/M/G recognized [768M]\n"
        "  -M         Use minimiser for clustering unaligned/unplaced reads\n"
        "  -R         Do not use reverse strand (only compatible with -M)\n"
        "  -K INT     Kmer size to use for minimiser [20]\n"
        "  -I FILE    Order minimisers by their position in FILE fasta\n"
        "  -w INT     Window size for minimiser indexing via -I ref.fa [100]\n"
        "  -H         Squash homopolymers when computing minimiser\n"
        "  -n         Sort by read name (natural): cannot be used with samtools index\n"
        "  -N         Sort by read name (ASCII): cannot be used with samtools index\n"
        "  -t TAG     Sort by value of TAG. Uses position as secondary index (or read name if -n is set)\n"
        "  -o FILE    Write final output to FILE rather than standard output\n"
        "  -T PREFIX  Write temporary files to PREFIX.nnnn.bam\n"
        "  --no-PG\n"
        "               Do not add a PG line\n"
        "      --template-coordinate\n"
        "               Sort by template-coordinate\n")


def sort_header(header, order: str, natural: bool, tag: str | None,
                mapped: bool):
    """set_sort_order (bam_sort.c:3270): stamp @HD SO/SS/GO."""
    if order == "coordinate":
        return header.ensure_hd_so("coordinate")
    if order == "queryname":
        ss = "queryname:natural" if natural else "queryname:lexicographical"
        return header.ensure_hd_so("queryname", subsort=ss)
    if order == "tag":
        sec = ("queryname:natural" if natural else
               "queryname:lexicographical") if order_tag_secondary else \
            "coordinate"
        return header.ensure_hd_so("unsorted", subsort=f"unsorted:{tag}:{sec}")
    if order == "template-coordinate":
        h = header.ensure_hd_so("unsorted",
                                subsort="unsorted:template-coordinate")
        return _set_go(h, "query")
    if order == "minhash":
        if mapped:
            return header.ensure_hd_so("coordinate",
                                       subsort="coordinate:minhash")
        return header.ensure_hd_so("unsorted", subsort="unsorted:minhash")
    return header


order_tag_secondary = False  # set when -n given with -t


def _set_go(header, go: str):
    lines = header.text.split("\n")
    for i, line in enumerate(lines):
        if line.startswith("@HD"):
            fields = [f for f in line.split("\t") if not f.startswith("GO:")]
            # GO goes after SO (htslib tag order: VN SO GO SS)
            out = []
            inserted = False
            for f in fields:
                out.append(f)
                if f.startswith("SO:"):
                    out.append("GO:" + go)
                    inserted = True
            if not inserted:
                out.append("GO:" + go)
            # move SS after GO if present
            ss = [f for f in out if f.startswith("SS:")]
            if ss:
                out = [f for f in out if not f.startswith("SS:")] + ss
            lines[i] = "\t".join(out)
            break
    return header.with_text("\n".join(lines))


def _order_key_fn(order, natural, by_tag, name_seen):
    """(header -> batch -> key columns, kind) for spill-mergeable orders;
    (None, None) for orders that mutate records (minhash)."""
    if order == "coordinate":
        return (lambda hdr: sk.coordinate_keys), "lex"
    if order == "queryname":
        return (lambda hdr: (lambda b: sk.queryname_keys(b, natural))), \
            "lex"
    if order == "tag":
        return (lambda hdr: (lambda b: sk.tag_keys(b, by_tag, name_seen,
                                                   natural))), "lex"
    if order == "template-coordinate":
        return (lambda hdr: (
            lambda b: sk.template_coordinate_keys(b, hdr))), "py"
    return None, None


def _try_external_sort(fn_in, fn_out, order, natural, by_tag, key_fn_maker,
                       key_kind, max_mem, tmpprefix, level, no_pg, argv,
                       ga) -> int | None:
    """Stream fn_in through the bounded-memory spill sorter.  Returns an
    exit code, or None to fall back to the in-memory path (non-BAM
    input, CRAM output, or stream errors before any output)."""
    from ..io.extsort import SpillSorter
    from ..io.files import StreamingWriter
    from ..io.stream import BamStream

    fmt = infer_output_format(fn_out, ga.out_fmt, "bam")
    if fmt not in ("bam", "sam", "sam.gz"):
        return None
    try:
        stream = BamStream(fn_in, threads=ga.nthreads)
    except Exception:
        return None

    mem = max_mem * max(1, ga.nthreads)
    prefix = tmpprefix or ((fn_out or "samtools") + f".tmp.{os.getpid()}")
    key_fn = key_fn_maker(stream.header)
    pack_fn = None
    if order == "coordinate" and stream.header.n_refs < (1 << 30) - 1:
        # BAM positions are int32, so the packed radix key always fits:
        # the merge runs on single uint64 keys (ops.sort_keys
        # .coordinate_pack) with incremental per-run pools
        pack_fn = sk.coordinate_pack
    sorter = SpillSorter(stream.header, key_fn, key_kind, mem, prefix,
                         threads=ga.nthreads, pack_fn=pack_fn)
    try:
        mapped = False
        for b in stream.batches():
            mapped = mapped or bool((b.tid >= 0).any())
            sorter.add(b)
        mode, result = sorter.finish()
    except Exception as e:
        print_error("sort", "error while sorting: %s", e)
        return 1
    finally:
        stream.close()

    header = sort_header(stream.header, order, natural, by_tag, mapped)
    if not no_pg:
        cl = "samtools sort " + " ".join(argv) if argv else "samtools sort"
        header = header.add_pg_line("samtools", "samtools", cl,
                                    SAMTOOLS_PARITY_VERSION)
    try:
        if mode == "mem":
            write_alignments(fn_out, header, result, fmt=fmt,
                             threads=ga.nthreads, level=level,
                             include_header=True)
        else:
            w = StreamingWriter(fn_out, header, fmt,
                                threads=ga.nthreads, level=level)
            for chunk in result:
                w.write_batch(chunk)
            w.close()
    except OSError as e:
        print_error_errno("sort", 'failed writing to "%s"',
                          fn_out or "-", exc=e)
        return 1
    if ga.write_index and fn_out and fmt == "bam":
        from .index_cmd import build_index_for
        build_index_for(fn_out, None, False, 14, ga.nthreads)
    return 0


def main_sort(argv: list[str]) -> int:
    global order_tag_secondary
    ga = GlobalArgs()
    order = "coordinate"
    natural = True
    by_tag = None
    fn_out = None
    level = 6
    no_pg = False
    o_seen = False
    max_mem = 768 << 20  # bam_sort.c SORT_DEFAULT_MEGS_PER_THREAD
    tmpprefix = None
    minimiser_kmer = 20
    minimiser_ref = None
    minimiser_window = 100
    try_rev = True
    no_squash = True
    try:
        opts, args = gnu_getopt(argv, "l:m:no:O:T:@:t:MNK:I:Rw:Hu",
                                ["no-PG", "template-coordinate"])
    except UsageError:
        usage(sys.stderr)
        return 1
    name_seen = False
    for o, v in opts:
        if o == "-o":
            fn_out = v
            o_seen = True
        elif o == "-N":
            natural = False
            order = "queryname"
            name_seen = True
        elif o == "-n":
            order = "queryname"
            name_seen = True
        elif o == "-t":
            by_tag = v
        elif o == "-m":
            mult = {"K": 1 << 10, "M": 1 << 20, "G": 1 << 30}.get(
                v[-1:].upper())
            try:
                max_mem = (int(float(v[:-1]) * mult) if mult
                           else int(float(v)))
            except ValueError:
                print_error("sort", "invalid memory limit \"%s\"", v)
                return 1
        elif o == "-T":
            tmpprefix = v
        elif o == "-l":
            level = int(v)
        elif o == "-u":
            level = 0
        elif o == "-M":
            order = "minhash"
        elif o == "-K":
            minimiser_kmer = int(v)
        elif o == "-I":
            order = "minhash"  # implicit option (bam_sort.c:3813)
            minimiser_ref = v
        elif o == "-R":
            try_rev = False
        elif o == "-w":
            minimiser_window = int(v)
        elif o == "-H":
            no_squash = False
        elif o == "--template-coordinate":
            order = "template-coordinate"
        elif o == "--no-PG":
            no_pg = True
        elif handle_global_opt(ga, o, v, short_outfmt="-O"):
            pass
        else:
            usage(sys.stderr)
            return 1
    if by_tag is not None:
        order_tag_secondary = order == "queryname"
        order = "tag"
    if len(args) > 1:
        # obsolete "sort in.bam out.prefix" invocation must fail
        print_error("sort", "too many arguments. The output name should be "
                    "given via -o instead")
        return 1
    del o_seen
    fn_in = args[0] if args else "-"

    # external path: stream a regular BAM through the spill sorter when
    # the decoded arena would exceed the -m budget (bam_sort.c:3490)
    key_fn, key_kind = _order_key_fn(order, natural, by_tag, name_seen)
    if key_fn is not None and fn_in != "-":
        rc = _try_external_sort(fn_in, fn_out, order, natural, by_tag,
                                key_fn, key_kind, max_mem, tmpprefix,
                                level, no_pg, argv, ga)
        if rc is not None:
            return rc

    try:
        f = read_alignments(fn_in, threads=ga.nthreads)
    except OSError as e:
        print_error_errno("sort", 'can\'t open "%s"', fn_in, exc=e)
        return 1
    b = f.batch

    if order == "coordinate":
        idx = sk.coordinate_order(b)
    elif order == "queryname":
        idx = sk.queryname_order(b, natural)
    elif order == "tag":
        idx = sk.tag_order(b, by_tag, name_seen, natural)
    elif order == "template-coordinate":
        try:
            idx = sk.template_coordinate_order(b, f.header)
        except ValueError as e:
            sys.stderr.write(f"[bam_sort] error: {e}\n")
            return 1
    elif order == "minhash":
        from ..ops.minhash import minhash_order
        idx = minhash_order(b, kmer=minimiser_kmer, try_rev=try_rev,
                            no_squash=no_squash, ref_fa=minimiser_ref,
                            ref_window=minimiser_window)
        # final_out reset (bam_sort.c:1959): unmapped records' cached
        # key fields are cleared on output
        unm = b.tid < 0
        b.pos[unm] = -1
        b.mpos[unm] = -1
        b.tlen[unm] = 0
    else:
        idx = np.arange(b.n)

    out = b.take(idx)
    mapped = bool((b.tid >= 0).any())
    header = sort_header(f.header, order, natural, by_tag, mapped)
    if not no_pg:
        cl = "samtools sort " + " ".join(argv) if argv else "samtools sort"
        header = header.add_pg_line("samtools", "samtools", cl,
                                    SAMTOOLS_PARITY_VERSION)
    fmt = infer_output_format(fn_out, ga.out_fmt, "bam")
    write_alignments(fn_out, header, out, fmt=fmt, threads=ga.nthreads,
                     level=level, include_header=True)
    if ga.write_index and fn_out and fmt == "bam":
        from .index_cmd import build_index_for
        build_index_for(fn_out, None, False, 14, ga.nthreads)
    return 0
