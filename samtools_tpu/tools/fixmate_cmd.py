"""samtools fixmate — fix mate information on queryname-grouped input.

Byte-parity target: bam_mating_core (/root/reference/bam_mate.c:1007-1190):
sanitize, sync mate pos/flags, MQ/MC tags, TLEN from 5' ends, proper-pair
plausibility, -m ms scores, -c ct template cigar, -r removal.
"""

from __future__ import annotations

import struct
import sys

import numpy as np

from .. import SAMTOOLS_PARITY_VERSION
from ..core import aux as auxmod
from ..core import flags as F
from ..core.sanitize import FIX_ALL, parse_sanitize_options, sanitize_batch
from ..io.files import infer_output_format, read_alignments, write_alignments
from ..io.sam_text import cigar_to_str
from .common import (GlobalArgs, UsageError, gnu_getopt, handle_global_opt,
                     print_error, print_error_errno)

MD_MIN_QUALITY = 15


def usage(fp):
    fp.write(
        "Usage: samtools fixmate <in.nameSrt.bam> <out.nameSrt.bam>\n"
        "Options:\n"
        "  -r           Remove unmapped reads and secondary alignments\n"
        "  -p           Disable FR proper pair check\n"
        "  -c           Add template cigar ct tag\n"
        "  -m           Add mate score tag\n"
        "  -u           Uncompressed output\n"
        "  -z, --sanitize FLAG[,FLAG]\n"
        "               Sanitize alignment fields [defaults to all types]\n"
        "  --no-PG      do not add a PG line\n")


def main_fixmate(argv: list[str]) -> int:
    ga = GlobalArgs()
    remove_reads = False
    pp_check = True
    add_ct = False
    mate_score = False
    no_pg = False
    level = 6
    sanitize_flags = FIX_ALL
    try:
        opts, args = gnu_getopt(argv, "rpcmO:@:uz:",
                                ["no-PG", "sanitize="])
    except UsageError:
        usage(sys.stderr)
        return 1
    for o, v in opts:
        if o == "-r":
            remove_reads = True
        elif o == "-p":
            pp_check = False
        elif o == "-c":
            add_ct = True
        elif o == "-m":
            mate_score = True
        elif o == "-u":
            level = 0
        elif o in ("-z", "--sanitize"):
            sanitize_flags = parse_sanitize_options(v)
            if sanitize_flags < 0:
                return 1
        elif o == "--no-PG":
            no_pg = True
        elif handle_global_opt(ga, o, v, short_outfmt="-O"):
            pass
        else:
            usage(sys.stderr)
            return 1
    if len(args) < 1 or (len(args) < 2 and sys.stdout.isatty()):
        usage(sys.stderr if args else sys.stdout)
        return 1
    fn_in = args[0]
    fn_out = args[1] if len(args) > 1 else "-"

    try:
        f = read_alignments(fn_in, threads=ga.nthreads)
    except OSError as e:
        print_error_errno("fixmate", 'cannot open input file "%s"', fn_in,
                          exc=e)
        return 1
    header = f.header
    if header.sort_order() == "coordinate":
        sys.stderr.write("[bam_mating_core] ERROR: Coordinate sorted, "
                         "require grouped/sorted by queryname.\n")
        return 1

    b = sanitize_batch(f.batch, header, sanitize_flags)

    # template grouping by consecutive qname runs
    names = [b.qname_str(i) for i in range(b.n)]
    fl = b.flag.astype(np.int64)
    end = b.end_pos()
    # end_pos for unmapped / cigar-less is pos+1 in batch helper; the
    # reference uses 0 for unmapped and bam_endpos otherwise
    new_aux = {i: None for i in ()}
    aux_extra: dict[int, bytes] = {}
    aux_del: dict[int, set] = {}

    def aux_append(i, tag, blob):
        aux_del.setdefault(i, set()).add(tag)
        aux_extra[i] = aux_extra.get(i, b"") + blob

    i = 0
    n = b.n
    while i < n:
        j = i
        while j < n and names[j] == names[i]:
            j += 1
        # primaries
        prims = [k for k in range(i, j)
                 if not (fl[k] & (F.FSECONDARY | F.FSUPPLEMENTARY))]
        if prims:
            pre = prims[0]
            cur = None
            pre_end = int(end[pre]) if not (fl[pre] & F.FUNMAP) else 0
            for k in prims[1:]:
                cur = k
                cur_end = int(end[cur]) if not (fl[cur] & F.FUNMAP) else 0
                fl[pre] |= F.FPAIRED
                fl[cur] |= F.FPAIRED
                _sync_mate(b, fl, pre, cur)
                _sync_mate(b, fl, cur, pre)
                _sync_mq_mc(b, fl, pre, cur, aux_append)
                _sync_mq_mc(b, fl, cur, pre, aux_append)
                # TLEN
                if (b.tid[pre] == b.tid[cur]
                        and not (fl[cur] & (F.FUNMAP | F.FMUNMAP))
                        and not (fl[pre] & (F.FUNMAP | F.FMUNMAP))):
                    cur5 = cur_end if fl[cur] & F.FREVERSE else int(b.pos[cur])
                    pre5 = pre_end if fl[pre] & F.FREVERSE else int(b.pos[pre])
                    b.tlen[cur] = pre5 - cur5
                    b.tlen[pre] = cur5 - pre5
                else:
                    b.tlen[cur] = b.tlen[pre] = 0
                if add_ct:
                    _template_cigar(b, fl, pre, cur, aux_append)
                if pp_check and not _plausibly_pp(b, fl, pre, cur,
                                                  pre_end, cur_end):
                    fl[pre] &= ~F.FPROPER_PAIR
                    fl[cur] &= ~F.FPROPER_PAIR
                if mate_score:
                    _add_ms(b, pre, cur, aux_append)
                    _add_ms(b, cur, pre, aux_append)
                if remove_reads:
                    if fl[pre] & F.FUNMAP:
                        fl[cur] &= ~(F.FMREVERSE | F.FPROPER_PAIR)
                    if fl[cur] & F.FUNMAP:
                        fl[pre] &= ~(F.FMREVERSE | F.FPROPER_PAIR)
            if cur is None and pre is not None:
                b.mtid[pre] = -1
                b.mpos[pre] = -1
                b.tlen[pre] = 0
                fl[pre] &= ~(F.FMREVERSE | F.FPROPER_PAIR)
        i = j

    b.flag = fl.astype(np.uint16)
    del new_aux

    # apply aux deletions/appends
    if aux_extra or aux_del:
        parts = []
        off = np.zeros(b.n + 1, np.int64)
        for i in range(b.n):
            a = b.aux_of(i)
            dels = aux_del.get(i)
            if dels:
                a = auxmod.delete_tags(a, dels)
            blob = aux_extra.get(i)
            if blob:
                a = np.concatenate([np.asarray(a, np.uint8),
                                    np.frombuffer(blob, np.uint8)])
            parts.append(a)
            off[i + 1] = off[i] + len(a)
        b.aux = (np.concatenate(parts).astype(np.uint8)
                 if parts else np.empty(0, np.uint8))
        b.aux_off = off

    keep = np.ones(b.n, bool)
    if remove_reads:
        keep = (b.flag.astype(np.int64) & (F.FSECONDARY | F.FUNMAP)) == 0
    out = b.take(np.nonzero(keep)[0])
    if not no_pg:
        cl = "samtools fixmate " + " ".join(argv)
        header = header.add_pg_line("samtools", "samtools", cl,
                                    SAMTOOLS_PARITY_VERSION)
    fmt = infer_output_format(fn_out, ga.out_fmt, "bam")
    write_alignments(fn_out, header, out, fmt=fmt, threads=ga.nthreads,
                     level=level, include_header=True)
    return 0


def _real_endpos(batch, fl, i: int) -> int:
    if fl[i] & F.FUNMAP:
        return 0
    return int(batch.end_pos()[i])


def _sync_mate(b, fl, src, dest):
    """sync_unmapped_pos_inner + sync_mate_inner (one direction)."""
    if (fl[dest] & F.FUNMAP) and not (fl[src] & F.FUNMAP):
        b.tid[dest] = b.tid[src]
        b.pos[dest] = b.pos[src]
    b.mtid[dest] = b.tid[src]
    b.mpos[dest] = b.pos[src]
    if fl[src] & F.FREVERSE:
        fl[dest] |= F.FMREVERSE
    else:
        fl[dest] &= ~F.FMREVERSE
    if fl[src] & F.FUNMAP:
        fl[dest] |= F.FMUNMAP


def _sync_mq_mc(b, fl, src, dest, aux_append):
    if not (fl[src] & F.FUNMAP):
        aux_append(dest, "MQ",
                   b"MQi" + struct.pack("<i", int(b.mapq[src])))
    if not (fl[src] & F.FUNMAP) or not (fl[dest] & F.FUNMAP):
        mc = cigar_to_str(b.cigar_of(src))
        aux_append(dest, "MC", b"MCZ" + mc.encode("latin-1") + b"\0")


def _plausibly_pp(b, fl, pre, cur, pre_end, cur_end) -> bool:
    if (fl[pre] & F.FUNMAP) or (fl[cur] & F.FUNMAP):
        return False
    if b.tid[pre] != b.tid[cur]:
        return False
    a_pos = pre_end if fl[pre] & F.FREVERSE else int(b.pos[pre])
    b_pos = cur_end if fl[cur] & F.FREVERSE else int(b.pos[cur])
    if a_pos > b_pos:
        first, second = cur, pre
    else:
        first, second = pre, cur
    return (not (fl[first] & F.FREVERSE)) and bool(fl[second] & F.FREVERSE)


def _add_ms(b, src, dest, aux_append):
    qual = b.qual[b.seq_off[src]:b.seq_off[src + 1]].astype(np.int64)
    score = int(qual[qual >= MD_MIN_QUALITY].sum())
    aux_append(dest, "ms", b"msi" + struct.pack("<i", score))


def _template_cigar(b, fl, pre, cur, aux_append):
    """bam_template_cigar (bam_mate.c:48): ct:Z on the leftmost read."""
    if (b.tid[pre] != b.tid[cur] or b.tid[pre] < 0 or b.pos[pre] < 0
            or b.pos[cur] < 0 or (fl[pre] & F.FUNMAP)
            or (fl[cur] & F.FUNMAP)):
        # still remove old ct tags? reference returns before deletion
        return
    b1, b2 = (pre, cur) if b.pos[pre] <= b.pos[cur] else (cur, pre)
    s = []
    s.append("1" if fl[b1] & F.FREAD1 else "2")
    s.append("R" if fl[b1] & F.FREVERSE else "F")
    s.append(cigar_to_str(b.cigar_of(b1)).replace("*", ""))
    end = int(b.end_pos()[b1])
    s.append(str(int(b.pos[b2]) - end))
    s.append("T")
    s.append("1" if fl[b2] & F.FREAD1 else "2")
    s.append("R" if fl[b2] & F.FREVERSE else "F")
    s.append(cigar_to_str(b.cigar_of(b2)).replace("*", ""))
    ct = "".join(s)
    aux_append(b1, "ct", b"ctZ" + ct.encode("latin-1") + b"\0")
    # ensure any stale ct on the other read is dropped
    aux_append(b2, "ct", b"")