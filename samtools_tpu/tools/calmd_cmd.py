"""samtools calmd — recompute MD/NM tags vs the reference.

Byte-parity target: /root/reference/bam_md.c bam_fillmd1_core (:64-224):
MD string building, NM counting (mismatches + ins + del), -e '=' bases,
-n max-NM masking, -d tag drop, -q qual binning, -r BAQ (-A/-E flags),
-C mapq cap.
"""

from __future__ import annotations

import struct
import sys

import numpy as np

from .. import SAMTOOLS_PARITY_VERSION
from ..core import aux as auxmod
from ..core import flags as F
from ..io import fasta as fastamod
from ..io.files import infer_output_format, read_alignments, write_alignments
from .common import (GlobalArgs, UsageError, gnu_getopt, handle_global_opt,
                     print_error, print_error_errno)

USE_EQUAL = 1
DROP_TAG = 2
BIN_QUAL = 4
UPDATE_NM = 8
UPDATE_MD = 16

NT16_TABLE = np.full(256, 15, np.uint8)
for _i, _c in enumerate("=ACMGRSVTWYHKDBN"):
    NT16_TABLE[ord(_c)] = _i
    NT16_TABLE[ord(_c.lower())] = _i
NT16_TABLE[ord("u")] = 8
NT16_TABLE[ord("U")] = 8


def usage(fp):
    fp.write(
        "Usage: samtools calmd [-eubrAESQ] <aln.bam> <ref.fasta>\n"
        "Options:\n"
        "  -e       change identical bases to '='\n"
        "  -u       uncompressed BAM output (for piping)\n"
        "  -b       compressed BAM output\n"
        "  -S       ignored (input format is auto-detected)\n"
        "  -A       modify the quality string\n"
        "  -Q       use quiet mode to output less debug info to stdout\n"
        "  -r       compute the BQ tag (without -A) or cap baseQ by BAQ "
        "(with -A)\n"
        "  -E       extended BAQ for better sensitivity but lower "
        "specificity\n"
        "  --no-PG  do not add a PG line\n")


def fillmd_one(b, i, ref: bytes, ref_len: int, flag: int, max_nm: int,
               quiet: bool, ref_name: str, aux_out: list) -> int:
    """Returns NM; mutates seq/qual in place; appends new aux to
    aux_out[i]."""
    seq = b.seq[b.seq_off[i]:b.seq_off[i + 1]]
    qual = b.qual[b.seq_off[i]:b.seq_off[i + 1]]
    cig = b.cigar_of(i)
    lq = seq.size
    if lq == 0:
        if not quiet:
            sys.stderr.write(
                "[bam_fillmd1] no sequence in alignment record for '%s' "
                "at %s:%d, skipped\n"
                % (b.qname_str(i), ref_name, int(b.pos[i]) + 1))
        return -2
    md = []
    matched = 0
    nm = 0
    qpos = 0
    rpos = int(b.pos[i])
    mismatch_sites = []
    out_of_bounds = False
    for c in cig:
        op = int(c) & 0xF
        oplen = int(c) >> 4
        if op in (F.CMATCH, F.CEQUAL, F.CDIFF):
            j = 0
            while j < oplen:
                z = qpos + j
                if rpos + j >= ref_len or z >= lq or ref[rpos + j] == 0:
                    out_of_bounds = True
                    break
                c1 = int(seq[z])
                c2 = int(NT16_TABLE[ref[rpos + j]])
                if (c1 == c2 and c1 != 15 and c2 != 15) or c1 == 0:
                    if flag & USE_EQUAL:
                        seq[z] = 0
                    matched += 1
                    mismatch_sites.append((z, True))
                else:
                    md.append(str(matched))
                    md.append(chr(ref[rpos + j]).upper())
                    matched = 0
                    nm += 1
                    mismatch_sites.append((z, False))
                j += 1
            if out_of_bounds:
                break
            rpos += oplen
            qpos += oplen
        elif op == F.CDEL:
            md.append(str(matched))
            md.append("^")
            j = 0
            while j < oplen:
                if rpos + j >= ref_len or ref[rpos + j] == 0:
                    break
                md.append(chr(ref[rpos + j]).upper())
                j += 1
            matched = 0
            rpos += j
            nm += j
            if j < oplen:
                break
        elif op in (F.CINS, F.CSOFT_CLIP):
            qpos += oplen
            if op == F.CINS:
                nm += oplen
        elif op == F.CREF_SKIP:
            rpos += oplen
    md.append(str(matched))
    md_str = "".join(md)

    if max_nm > 0 and nm >= max_nm:
        # mask matches back to ref base (uppercase=15? htslib sets code 15)
        for z, is_match in mismatch_sites:
            if is_match:
                seq[z] = 15
                qual[z] = 0

    a = aux_out[i]
    fl = int(b.flag[i])
    if (flag & UPDATE_NM) and not (fl & F.FUNMAP):
        got = auxmod.get_value(a, "NM")
        if got is None:
            a = np.concatenate([a, np.frombuffer(
                b"NMi" + struct.pack("<i", nm), np.uint8)])
        elif got[1] != nm:
            if not quiet:
                sys.stderr.write(
                    "[bam_fillmd1] different NM for read '%s': %d -> %d\n"
                    % (b.qname_str(i), got[1], nm))
            a = auxmod.delete_tags(a, {"NM"})
            a = np.concatenate([a, np.frombuffer(
                b"NMi" + struct.pack("<i", nm), np.uint8)])
    if (flag & UPDATE_MD) and not (fl & F.FUNMAP):
        got = auxmod.get_value(a, "MD")
        if got is None:
            a = np.concatenate([a, np.frombuffer(
                b"MDZ" + md_str.encode("latin-1") + b"\0", np.uint8)])
        elif str(got[1]).upper() != md_str.upper():
            if not quiet:
                sys.stderr.write(
                    "[bam_fillmd1] different MD for read '%s': '%s' -> "
                    "'%s'\n" % (b.qname_str(i), got[1], md_str))
            a = auxmod.delete_tags(a, {"MD"})
            a = np.concatenate([a, np.frombuffer(
                b"MDZ" + md_str.encode("latin-1") + b"\0", np.uint8)])
    if flag & DROP_TAG:
        a = auxmod.keep_tags(a, {"RG"})
    if flag & BIN_QUAL:
        q = qual.astype(np.int64)
        qual[:] = np.where(q >= 3, q // 10 * 10 + 7, q).astype(np.uint8)
    aux_out[i] = a
    return 0


def main_calmd(argv: list[str]) -> int:
    ga = GlobalArgs()
    flt_flag = UPDATE_NM | UPDATE_MD
    is_bam_out = False
    level = 6
    is_realn = False
    max_nm = 0
    capq = 0
    baq_flag = 0
    quiet = False
    no_pg = False
    try:
        opts, args = gnu_getopt(argv, "EqQreuNhbSC:n:Ad@:",
                                ["no-PG"])
    except UsageError:
        usage(sys.stderr)
        return 1
    for o, v in opts:
        if o == "-r":
            is_realn = True
        elif o == "-e":
            flt_flag |= USE_EQUAL
        elif o == "-d":
            flt_flag |= DROP_TAG
        elif o == "-q":
            flt_flag |= BIN_QUAL
        elif o == "-N":
            flt_flag &= ~(UPDATE_MD | UPDATE_NM)
        elif o == "-b":
            is_bam_out = True
        elif o == "-u":
            level = 0
            is_bam_out = True
        elif o == "-S":
            pass
        elif o == "-n":
            max_nm = int(v)
        elif o == "-C":
            capq = int(v)
        elif o == "-A":
            baq_flag |= 1
        elif o == "-E":
            baq_flag |= 2
        elif o == "-Q":
            quiet = True
        elif o == "-h":
            pass  # HASH_QNM legacy, ignored
        elif o == "--no-PG":
            no_pg = True
        elif handle_global_opt(ga, o, v, short_outfmt=None):
            pass
        else:
            usage(sys.stderr)
            return 1
    if not args or (len(args) < 2 and not ga.reference):
        usage(sys.stderr)
        return 1
    fn_in = args[0]
    ref_file = args[1] if len(args) > 1 else ga.reference

    try:
        fai = fastamod.load_fasta(ref_file)
    except OSError as e:
        print_error_errno("calmd",
                          "Failed to open reference file '%s'", ref_file,
                          exc=e)
        return 1
    stream = None
    if fn_in != "-":
        try:
            from ..io.stream import BamStream
            stream = BamStream(fn_in, threads=ga.nthreads or 2)
            header = stream.header
        except OSError as e:
            print_error_errno("calmd", "Failed to open input file '%s'",
                              fn_in, exc=e)
            return 1
        except Exception:
            stream = None
    if stream is None:
        try:
            f = read_alignments(fn_in, threads=ga.nthreads)
        except OSError as e:
            print_error_errno("calmd", "Failed to open input file '%s'",
                              fn_in, exc=e)
            return 1
        header = f.header

    skipped = 0
    ref_cache: dict = {}
    missing: set = set()

    def process(b) -> int | None:
        """BAQ/capQ/MD-fill one decoded batch in place; returns skipped
        count or None on a fatal missing-reference error."""
        nonlocal ref_cache
        from ..ops import baq as baqmod
        from ..io.sam_text import NT16_LUT
        aux_out = [b.aux_of(i) for i in range(b.n)]
        skip = 0
        batch_tids = {int(t) for t in np.unique(b.tid[b.tid >= 0])}
        if len(ref_cache) > 4:
            # drop contigs this batch doesn't touch (ref LRU analog,
            # bam_md.c:54 keeps a small cache)
            ref_cache = {t: s for t, s in ref_cache.items()
                         if t in batch_tids}
        for t in sorted(batch_tids):
            if t in ref_cache or t in missing:
                continue
            name = header.ref_name(t)
            if fai.has(name):
                ref_cache[t] = fai.fetch(name)
            else:
                sys.stderr.write("[bam_fillmd] fail to find sequence "
                                 "'%s' in the reference.\n" % name)
                if is_realn or capq > 10:
                    return None
                missing.add(t)
        if is_realn or capq > 10:
            for t, seq in ref_cache.items():
                sel = np.nonzero(b.tid == t)[0]
                ref_int = baqmod.NT16_INT[
                    NT16_LUT[np.frombuffer(seq, np.uint8)]]
                for i in sel:
                    i = int(i)
                    qual = b.qual[b.seq_off[i]:b.seq_off[i + 1]]
                    if is_realn:
                        got = baqmod.sam_prob_realn_single(
                            int(b.pos[i]), b.cigar_of(i), b.seq_of(i),
                            qual, aux_out[i], ref_int, len(seq),
                            baq_flag)
                        if got is not None:
                            newq, new_aux = got
                            b.qual[b.seq_off[i]:b.seq_off[i + 1]] = newq
                            aux_out[i] = np.asarray(new_aux, np.uint8)
                    if capq > 10:
                        q = baqmod._cap_mapq_single(
                            int(b.pos[i]), b.cigar_of(i), b.seq_of(i),
                            b.qual[b.seq_off[i]:b.seq_off[i + 1]],
                            ref_int, len(seq), capq)
                        if b.mapq[i] > q:
                            b.mapq[i] = max(q, 0)
        for i in range(b.n):
            t = int(b.tid[i])
            if t < 0 or t not in ref_cache:
                continue
            ref = ref_cache[t]
            r = fillmd_one(b, i, ref, len(ref), flt_flag, max_nm, quiet,
                           header.ref_name(t), aux_out)
            if r == -2:
                skip += 1
        off = np.zeros(b.n + 1, np.int64)
        for i, a in enumerate(aux_out):
            off[i + 1] = off[i] + len(a)
        b.aux = (np.concatenate(aux_out).astype(np.uint8)
                 if aux_out else np.empty(0, np.uint8))
        b.aux_off = off
        return skip

    if not no_pg:
        cl = "samtools calmd " + " ".join(argv)
        header = header.add_pg_line("samtools", "samtools", cl,
                                    SAMTOOLS_PARITY_VERSION)
    fmt = "bam" if is_bam_out else (ga.out_fmt or "sam")

    if stream is not None and fmt in ("bam", "sam", "sam.gz"):
        # bounded-memory pipeline: window in, window out (the
        # reference's one-record loop, bam_md.c:389)
        from ..io.files import StreamingWriter
        writer = StreamingWriter(None, header, fmt,
                                 threads=ga.nthreads, level=level)
        try:
            for wb in stream.batches():
                got = process(wb)
                if got is None:
                    return 1
                skipped += got
                writer.write_batch(wb)
        finally:
            writer.close()
            stream.close()
    else:
        if stream is not None:
            stream.close()
            f = read_alignments(fn_in, threads=ga.nthreads)
        b = f.batch
        got = process(b)
        if got is None:
            return 1
        skipped += got
        write_alignments(None, header, b, fmt=fmt, threads=ga.nthreads,
                         level=level, include_header=True)

    if skipped and not quiet:
        sys.stderr.write("[bam_fillmd] %u reads skipped\n" % skipped)
    return 0
