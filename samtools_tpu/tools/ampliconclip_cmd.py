"""samtools ampliconclip — clip primer regions from read ends.

Byte-parity target: /root/reference/bam_ampliconclip.c (soft/hard clip
rewrite bam_trim_left/right :341/:490, primer-site binary search
matching_clip_site :279, OA tagging :649, stats / primer-count outputs).

Columnar architecture note: clipping is a per-record CIGAR rewrite — a
pure function of (cigar, pos, strand) — applied over the batch; the
primer-site match is a searchsorted against the sorted BED table.
"""

from __future__ import annotations

import re
import sys

import numpy as np

from ..core import aux as auxmod
from ..core import flags as F
from ..io.files import read_alignments, write_alignments, \
    infer_output_format
from ..io.header import SamHeader
from .common import (GlobalArgs, UsageError, gnu_getopt, handle_global_opt,
                     print_error, print_error_errno, out_level)

SOFT, HARD = 0, 1

_CONSUMES_Q = F.CIGAR_CONSUMES_QUERY
_CONSUMES_R = F.CIGAR_CONSUMES_REF


class BedEntry:
    __slots__ = ("left", "right", "name", "score", "rev", "num_reads")

    def __init__(self, left, right, name, score, rev):
        self.left = left
        self.right = right
        self.name = name
        self.score = score
        self.rev = rev
        self.num_reads = 0


def load_bed_multi_ref(path: str, get_strand: bool,
                       sort_by_pos: bool = True):
    """BED -> {ref: [BedEntry]} + per-ref longest + ref order
    (bam_ampliconclip.c:76-256).  Entries sorted by right coordinate
    when sort_by_pos (ampliconclip); file order otherwise
    (ampliconstats)."""
    lists: dict[str, list[BedEntry]] = {}
    longest: dict[str, int] = {}
    ref_order: list[str] = []
    try:
        fh = open(path)
    except OSError as e:
        print_error_errno("amplicon", "unable to open file %s.", path,
                          exc=e)
        return None
    with fh:
        for ln, line in enumerate(fh, 1):
            line = line.rstrip("\n")
            if not line or line[0] == "#":
                continue
            if line.startswith(("track ", "browser ")):
                continue
            cols = line.split()
            if len(cols) < (6 if get_strand else 3):
                sys.stderr.write(
                    "[amplicon] error: invalid bed file format in line %d"
                    " of %s.\n" % (ln, path))
                return None
            ref = cols[0]
            left, right = int(cols[1]), int(cols[2])
            name = cols[3] if len(cols) >= 4 else None
            score = cols[4] if len(cols) >= 5 else None
            rev = 0
            if get_strand:
                if cols[5] == "+":
                    rev = 0
                elif cols[5] == "-":
                    rev = 1
                else:
                    sys.stderr.write(
                        "[amplicon] error: bad strand value in line %d, "
                        "expecting '+' or '-', found '%s'.\n"
                        % (ln, cols[5]))
                    return None
            if ref not in lists:
                lists[ref] = []
                longest[ref] = 0
                ref_order.append(ref)
            lists[ref].append(BedEntry(left, right, name, score, rev))
            if right - left > longest[ref]:
                longest[ref] = right - left
    if not lists:
        return None
    if sort_by_pos:
        for ref in lists:
            lists[ref].sort(key=lambda e: e.right)
    return lists, longest, ref_order


def matching_clip_site(sites: list[BedEntry], pos: int, is_rev: bool,
                       use_strand: bool, longest: int, tol: int) -> int:
    """Largest overlap size at a primer site (bam_ampliconclip.c:279-338)."""
    l, r = 0, len(sites)
    mid = len(sites) // 2
    pos_tol = (pos - tol if pos > tol else 0) if is_rev else pos
    while r - l > 1:
        if sites[mid].right <= pos_tol:
            l = mid
        else:
            r = mid
        mid = (l + r) // 2
    size = 0
    used_i = -1
    for i in range(l, len(sites)):
        if use_strand and is_rev != sites[i].rev:
            continue
        if is_rev:
            mod_left = sites[i].left
            mod_right = sites[i].right + tol
        else:
            mod_left = sites[i].left - tol if sites[i].left > tol else 0
            mod_right = sites[i].right
        if pos + longest + tol < mod_right:
            break
        if mod_left <= pos <= mod_right:
            if is_rev:
                if size < pos - sites[i].left:
                    size = pos - sites[i].left
                    used_i = i
            else:
                if size < sites[i].right - pos:
                    size = sites[i].right - pos
                    used_i = i
    if used_i >= 0:
        sites[used_i].num_reads += 1
    return size


def trim_left(cigar: np.ndarray, pos: int, l_qseq: int, bases: int,
              hard: bool):
    """bam_trim_left (bam_ampliconclip.c:341-487) on array form.

    Returns (new_cigar list, new_pos, qry_removed, emptied) where
    qry_removed is the count of query bases to drop from the front
    (0 for soft clip), and emptied means the whole read was consumed
    under hard clipping (seq dropped, cigar emptied)."""
    ref_remove = bases
    qry_removed = 0
    hardclip = 0
    new_pos = pos
    n = len(cigar)
    i = 0
    while i < n:
        op = int(cigar[i]) & 0xF
        ln = int(cigar[i]) >> 4
        if op == F.CHARD_CLIP:
            hardclip += ln
        else:
            if _CONSUMES_R[op]:
                if ln <= ref_remove:
                    ref_remove -= ln
                else:
                    break
                new_pos += ln
            if _CONSUMES_Q[op]:
                qry_removed += ln
        i += 1

    if i < n:
        op = int(cigar[i]) & 0xF
        if _CONSUMES_R[op]:
            new_pos += ref_remove
        if _CONSUMES_Q[op]:
            qry_removed += ref_remove
    else:
        if hard:
            return [], pos, l_qseq, True
        qry_removed = l_qseq

    new_cigar = []
    if hard and hardclip + qry_removed > 0:
        new_cigar.append(((hardclip + qry_removed) << 4) | F.CHARD_CLIP)
    if not hard:
        if hardclip > 0:
            new_cigar.append((hardclip << 4) | F.CHARD_CLIP)
        if qry_removed > 0:
            new_cigar.append((qry_removed << 4) | F.CSOFT_CLIP)
    if i < n and (int(cigar[i]) >> 4) > ref_remove:
        new_cigar.append((((int(cigar[i]) >> 4) - ref_remove) << 4)
                         | (int(cigar[i]) & 0xF))
        new_cigar.extend(int(c) for c in cigar[i + 1:])
    if not hard:
        qry_removed = 0
    return new_cigar, new_pos, qry_removed, False


def trim_right(cigar: np.ndarray, pos: int, l_qseq: int, bases: int,
               hard: bool):
    """bam_trim_right (bam_ampliconclip.c:490-619).

    Returns (new_cigar list, qry_removed_from_end, emptied)."""
    ref_remove = bases
    qry_removed = 0
    hardclip = 0
    n = len(cigar)
    i = n - 1
    while i >= 0:
        op = int(cigar[i]) & 0xF
        ln = int(cigar[i]) >> 4
        if op == F.CHARD_CLIP:
            hardclip += ln
        else:
            if _CONSUMES_R[op]:
                if ln <= ref_remove:
                    ref_remove -= ln
                else:
                    break
            if _CONSUMES_Q[op]:
                qry_removed += ln
        i -= 1

    if i >= 0:
        op = int(cigar[i]) & 0xF
        if _CONSUMES_Q[op]:
            qry_removed += ref_remove
        keep = list(int(c) for c in cigar[:i])
        last = ((((int(cigar[i]) >> 4) - ref_remove) << 4)
                | (int(cigar[i]) & 0xF))
        keep.append(last)
    else:
        if hard:
            return [], l_qseq, True
        qry_removed = l_qseq
        keep = []

    new_cigar = list(keep)
    if hard and hardclip + qry_removed > 0:
        new_cigar.append(((hardclip + qry_removed) << 4) | F.CHARD_CLIP)
    if not hard:
        if qry_removed > 0:
            new_cigar.append((qry_removed << 4) | F.CSOFT_CLIP)
        if hardclip > 0:
            new_cigar.append((hardclip << 4) | F.CHARD_CLIP)
    if not hard:
        qry_removed = 0
    return new_cigar, qry_removed, False


def active_query_len(cigar) -> int:
    """Query length excluding soft/hard clips
    (bam_ampliconclip.c:622-638)."""
    total = 0
    for c in cigar:
        op = int(c) & 0xF
        if _CONSUMES_Q[op] and op != F.CSOFT_CLIP:
            total += int(c) >> 4
    return total


def cigar_str(cigar) -> str:
    return "".join("%d%s" % (int(c) >> 4, F.CIGAR_CHARS[int(c) & 0xF])
                   for c in cigar)


def oa_value(qname: str, pos: int, flag: int, cigar, mapq: int,
             aux_buf) -> str:
    """OA:Z value for the pre-clip record (bam_ampliconclip.c:649-686;
    note the reference writes the read name, not RNAME, and omits the
    comma before MAPQ when NM is absent — replicated for parity)."""
    old = auxmod.get_value(aux_buf, "OA")
    prefix = old[1] if old is not None else ""
    strand = "-" if flag & F.FREVERSE else "+"
    nm = auxmod.get_value(aux_buf, "NM")
    s = "%s%s,%d,%c,%s" % (prefix, qname, pos + 1, strand,
                           cigar_str(cigar))
    if nm is not None:
        s += ",%d,%d;" % (mapq, int(nm[1]))
    else:
        s += "%d,;" % mapq
    return s


class Rec:
    """One mutable record while clipping (the b/b_tmp pair of the
    reference collapses to in-place field rewrites here)."""
    __slots__ = ("qname", "flag", "tid", "pos", "mapq", "cigar", "mtid",
                 "mpos", "tlen", "seq", "qual", "aux")


def usage(fp):
    fp.write("Usage: samtools ampliconclip -b BED file <input.bam> -o <output.bam>\n\n"
             "Option: \n"
             " -b  FILE             BED file of regions (eg amplicon primers) to be removed.\n"
             " -o  FILE             output file name (default: stdout).\n"
             " -f  FILE             write stats to file name (default: stderr)\n"
             " -u                   Output uncompressed data\n"
             " --soft-clip          soft clip amplicon primers from reads (default)\n"
             " --hard-clip          hard clip amplicon primers from reads.\n"
             " --both-ends          clip on both 5' and 3' ends.\n"
             " --strand             use strand data from BED file to match read direction.\n"
             " --clipped            only output clipped reads.\n"
             " --fail               mark unclipped, mapped reads as QCFAIL.\n"
             " --filter-len INT     do not output reads INT size or shorter.\n"
             " --fail-len   INT     mark as QCFAIL reads INT size or shorter.\n"
             " --unmap-len  INT     unmap reads INT size or shorter, default 0.\n"
             " --no-excluded        do not write excluded reads (unmapped or QCFAIL).\n"
             " --rejects-file FILE  file to write filtered reads.\n"
             " --primer-counts FILE file to write read counts per bed entry (bedgraph format).\n"
             " --original           for clipped entries add an OA tag with original data.\n"
             " --keep-tag           for clipped entries keep the old NM and MD tags.\n"
             " --tolerance          match region within this number of bases, default 5.\n"
             " --no-PG              do not add an @PG line.\n")


def main_ampliconclip(argv: list[str]) -> int:
    ga = GlobalArgs()
    bedfile = None
    fnout = "-"
    clipping = SOFT
    add_pg = 1
    use_strand = 0
    write_clipped = 0
    mark_fail = 0
    both = 0
    fail_len = -1
    filter_len = -1
    unmapped = 0
    oa_tag = 0
    del_tag = 1
    tol = 5
    unmap_len = 0
    stats_file = None
    primer_counts_file = None
    rejects_file = None
    uncompressed = False

    longopts = ["no-PG", "soft-clip", "hard-clip", "strand", "clipped",
                "fail", "both-ends", "filter-len=", "fail-len=",
                "no-excluded", "rejects-file=", "primer-counts=",
                "original", "keep-tag", "tolerance=", "unmap-len="]
    try:
        opts, args = gnu_getopt(argv, "b:@:o:O:f:u", longopts)
    except UsageError:
        usage(sys.stderr)
        return 1
    for o, v in opts:
        if o == "-b":
            bedfile = v
        elif o == "-o":
            fnout = v
        elif o == "-f":
            stats_file = v
        elif o == "-u":
            uncompressed = True
        elif o == "--no-PG":
            add_pg = 0
        elif o == "--soft-clip":
            clipping = SOFT
        elif o == "--hard-clip":
            clipping = HARD
        elif o == "--strand":
            use_strand = 1
        elif o == "--clipped":
            write_clipped = 1
        elif o == "--fail":
            mark_fail = 1
        elif o == "--both-ends":
            both = 1
        elif o == "--filter-len":
            filter_len = int(v)
        elif o == "--fail-len":
            fail_len = int(v)
        elif o == "--no-excluded":
            unmapped = 1
        elif o == "--rejects-file":
            rejects_file = v
        elif o == "--primer-counts":
            primer_counts_file = v
        elif o == "--original":
            oa_tag = 1
        elif o == "--keep-tag":
            del_tag = 0
        elif o == "--tolerance":
            tol = int(v)
        elif o == "--unmap-len":
            unmap_len = int(v)
        elif handle_global_opt(ga, o, v, short_outfmt="-O"):
            pass
        else:
            usage(sys.stderr)
            return 1

    if not bedfile or not args:
        usage(sys.stderr)
        return 1
    if tol < 0:
        sys.stderr.write("[ampliconclip] warning: invalid tolerance of %d,"
                         " resetting tolerance to default of 5.\n" % tol)
        tol = 5

    loaded = load_bed_multi_ref(bedfile, bool(use_strand))
    if loaded is None:
        sys.stderr.write("[ampliconclip] error: unable to load bed file.\n")
        return 1
    bed_lists, longest, ref_order = loaded

    try:
        f = read_alignments(args[0], threads=ga.nthreads)
    except OSError as e:
        print_error_errno("ampliconclip", "cannot open input file", exc=e)
        return 1
    header = f.header
    batch = f.batch

    # coordinate sort order becomes 'unknown' (bam_ampliconclip.c:719-726)
    m = re.search(r"^@HD\t.*\bSO:coordinate\b", header.text, re.M)
    if m:
        text = re.sub(r"(^@HD\t.*\bSO:)coordinate\b", r"\1unknown",
                      header.text, count=1, flags=re.M)
        header = SamHeader.from_text(text, header.ref_names or None,
                                     header.ref_lens or None)
    arg_list = "samtools ampliconclip " + " ".join(argv)
    if add_pg:
        from .. import SAMTOOLS_PARITY_VERSION
        header = header.add_pg_line("samtools", "samtools", arg_list,
                                    SAMTOOLS_PARITY_VERSION)

    f_count = r_count = n_count = l_count = l_exclude = b_count = 0
    filtered = written = failed = 0

    out_records: list[Rec] = []
    reject_records: list[Rec] = []

    last_tid = -2
    ref_found = 0
    sites = None
    ref_longest = 0
    exclude = F.FUNMAP | F.FQCFAIL

    for idx in range(batch.n):
        l_count += 1
        rec = Rec()
        rec.qname = batch.qname_str(idx)
        rec.flag = int(batch.flag[idx])
        rec.tid = int(batch.tid[idx])
        rec.pos = int(batch.pos[idx])
        rec.mapq = int(batch.mapq[idx])
        rec.cigar = batch.cigar_of(idx).copy()
        rec.mtid = int(batch.mtid[idx])
        rec.mpos = int(batch.mpos[idx])
        rec.tlen = int(batch.tlen[idx])
        rec.seq = batch.seq_of(idx).copy()
        rec.qual = batch.qual_of(idx).copy()
        rec.aux = batch.aux_of(idx).copy()

        if rec.tid != last_tid:
            ref_found = 0
            last_tid = rec.tid
            if 0 <= rec.tid < header.n_refs:
                rn = header.ref_name(rec.tid)
                if rn in bed_lists:
                    sites = bed_lists[rn]
                    ref_longest = longest[rn]
                    ref_found = 1

        filter_rec = 0
        been_clipped = 0
        if not (rec.flag & exclude) and ref_found:
            oat = None
            if oa_tag:
                oat = oa_value(rec.qname, rec.pos, rec.flag, rec.cigar,
                               rec.mapq, rec.aux)

            def end_pos():
                e = rec.pos
                for c in rec.cigar:
                    if _CONSUMES_R[int(c) & 0xF]:
                        e += int(c) >> 4
                return e

            clipped_any = False
            if not both:
                if rec.flag & F.FREVERSE:
                    pos, is_rev = end_pos(), True
                else:
                    pos, is_rev = rec.pos, False
                p_size = matching_clip_site(sites, pos, is_rev,
                                            bool(use_strand), ref_longest,
                                            tol)
                if p_size:
                    if is_rev:
                        _apply_right(rec, p_size, clipping)
                        r_count += 1
                    else:
                        _apply_left(rec, p_size, clipping)
                        f_count += 1
                    clipped_any = True
                    been_clipped = 1
                else:
                    if mark_fail:
                        rec.flag |= F.FQCFAIL
                    n_count += 1
            else:
                left = right = 0
                p_size = matching_clip_site(sites, rec.pos, False,
                                            bool(use_strand), ref_longest,
                                            tol)
                if p_size:
                    _apply_left(rec, p_size, clipping)
                    f_count += 1
                    left = 1
                    been_clipped = 1
                p_size = matching_clip_site(sites, end_pos(), True,
                                            bool(use_strand), ref_longest,
                                            tol)
                if p_size:
                    _apply_right(rec, p_size, clipping)
                    r_count += 1
                    right = 1
                    been_clipped = 1
                clipped_any = bool(left or right)
                if left and right:
                    b_count += 1
                elif not left and not right:
                    if mark_fail:
                        rec.flag |= F.FQCFAIL
                    n_count += 1

            if clipped_any:
                if oa_tag:
                    rec.aux = auxmod.update_str_tag(rec.aux, "OA", oat)
                if del_tag:
                    rec.aux = auxmod.delete_tags(rec.aux, {"NM", "MD"})

            if fail_len >= 0 or filter_len >= 0 or unmap_len >= 0:
                aql = active_query_len(rec.cigar)
                if fail_len >= 0 and aql <= fail_len:
                    rec.flag |= F.FQCFAIL
                if filter_len >= 0 and aql <= filter_len:
                    filter_rec = 1
                if unmap_len >= 0 and aql <= unmap_len:
                    # unmap the read (bam_ampliconclip.c:906-934)
                    rec.flag |= F.FUNMAP
                    rec.mapq = 0
                    rec.cigar = np.empty(0, np.uint32)

            if rec.flag & F.FQCFAIL:
                failed += 1
            if write_clipped and not been_clipped:
                filter_rec = 1
        else:
            l_exclude += 1
            if unmapped:
                filter_rec = 1

        if not filter_rec:
            out_records.append(rec)
            written += 1
        else:
            if rejects_file:
                reject_records.append(rec)
            filtered += 1

    out_fmt = infer_output_format(fnout, ga.out_fmt, default="bam")
    level = 0 if uncompressed else out_level(ga)
    write_alignments(fnout, header, _records_to_batch(out_records),
                     fmt=out_fmt, threads=ga.nthreads, level=level)
    if rejects_file:
        rej_fmt = infer_output_format(rejects_file, ga.out_fmt,
                                      default="bam")
        write_alignments(rejects_file, header,
                         _records_to_batch(reject_records), fmt=rej_fmt,
                         threads=ga.nthreads, level=level)

    stats_fp = sys.stderr
    opened = False
    if stats_file:
        try:
            stats_fp = open(stats_file, "w")
            opened = True
        except OSError:
            sys.stderr.write("[ampliconclip] warning: cannot write stats"
                             " to %s.\n" % stats_file)
            stats_fp = sys.stderr
    stats_fp.write(
        "COMMAND: %s\nTOTAL READS: %ld\nTOTAL CLIPPED: %ld\n"
        "FORWARD CLIPPED: %ld\nREVERSE CLIPPED: %ld\nBOTH CLIPPED: %ld\n"
        "NOT CLIPPED: %ld\nEXCLUDED: %ld\nFILTERED: %ld\nFAILED: %ld\n"
        "WRITTEN: %ld\n" % (arg_list, l_count, f_count + r_count,
                            f_count, r_count, b_count, n_count, l_exclude,
                            filtered, failed, written))
    if opened:
        stats_fp.close()

    if primer_counts_file:
        try:
            pc = open(primer_counts_file, "w")
        except OSError:
            sys.stderr.write("[ampliconclip] warning: cannot write count"
                             " summary to %s.\n" % primer_counts_file)
            pc = None
        if pc:
            pc.write("#CHR\tLEFT\tRIGHT\tNAME\tSCORE\tSTRAND"
                     "\tNUM_CLIPPED\n")
            for rn in ref_order:
                for e in bed_lists[rn]:
                    strand_out = ("-" if e.rev else "+") if use_strand \
                        else "."
                    pc.write("%s\t%d\t%d\t%s\t%s\t%s\t%d\n" %
                             (rn, e.left, e.right,
                              e.name if e.name is not None else "(null)",
                              e.score if e.score is not None else "(null)",
                              strand_out, e.num_reads))
            pc.close()
    return 0


def _apply_left(rec: Rec, p_size: int, clipping: int):
    hard = clipping == HARD
    new_cigar, new_pos, qry_removed, emptied = trim_left(
        rec.cigar, rec.pos, len(rec.seq), p_size, hard)
    if emptied:
        rec.seq = np.empty(0, np.uint8)
        rec.qual = np.empty(0, np.uint8)
        rec.cigar = np.empty(0, np.uint32)
        return
    rec.cigar = np.array(new_cigar, np.uint32)
    rec.pos = new_pos
    if qry_removed:
        rec.seq = rec.seq[qry_removed:]
        rec.qual = rec.qual[qry_removed:]


def _apply_right(rec: Rec, p_size: int, clipping: int):
    hard = clipping == HARD
    new_cigar, qry_removed, emptied = trim_right(
        rec.cigar, rec.pos, len(rec.seq), p_size, hard)
    if emptied:
        rec.seq = np.empty(0, np.uint8)
        rec.qual = np.empty(0, np.uint8)
        rec.cigar = np.empty(0, np.uint32)
        return
    rec.cigar = np.array(new_cigar, np.uint32)
    if qry_removed:
        rec.seq = rec.seq[:len(rec.seq) - qry_removed]
        rec.qual = rec.qual[:len(rec.qual) - qry_removed]


def _records_to_batch(records: list[Rec]):
    from ..core.batch import ReadBatch
    out = ReadBatch(n=len(records))
    n = len(records)
    out.tid = np.array([r.tid for r in records], np.int32)
    out.pos = np.array([r.pos for r in records], np.int64)
    out.mapq = np.array([r.mapq for r in records], np.uint8)
    out.flag = np.array([r.flag for r in records], np.uint16)
    out.mtid = np.array([r.mtid for r in records], np.int32)
    out.mpos = np.array([r.mpos for r in records], np.int64)
    out.tlen = np.array([r.tlen for r in records], np.int64)
    qnames = [np.frombuffer(r.qname.encode(), np.uint8) for r in records]
    for flat, off, parts in (
            ("qname", "qname_off", qnames),
            ("cigar", "cigar_off",
             [np.asarray(r.cigar, np.uint32) for r in records]),
            ("seq", "seq_off", [np.asarray(r.seq, np.uint8)
                                for r in records]),
            ("aux", "aux_off", [np.asarray(r.aux, np.uint8)
                                for r in records])):
        lens = np.array([len(p) for p in parts], np.int64)
        offs = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        setattr(out, flat,
                np.concatenate(parts) if parts else
                np.empty(0, np.uint32 if flat == "cigar" else np.uint8))
        setattr(out, off, offs)
    out.qual = (np.concatenate([np.asarray(r.qual, np.uint8)
                                for r in records])
                if records else np.empty(0, np.uint8))
    return out
