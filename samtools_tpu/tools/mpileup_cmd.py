"""samtools mpileup — multi-file text pileup.

Byte-parity target: /root/reference/bam_plcmd.c — pileup_seq grammar
(:54-169), mplp_func read filters (:400-461), the -a/-aa empty-column
logic (:610-660, :880-910), extra output columns (:727-855).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from ..core import aux as auxmod
from ..core import flags as F
from ..core.regions import RegionError, parse_region
from ..io import bed as bedmod
from ..io import fasta as fastamod
from ..io.files import read_alignments
from ..ops import basemods
from ..ops import pileup as plops
from .common import (GlobalArgs, UsageError, gnu_getopt, handle_global_opt,
                     print_error, print_error_errno, try_region_read)
from .flags_cmd import str2flag

DEFAULT_FF = F.FUNMAP | F.FSECONDARY | F.FQCFAIL | F.FDUP

# extra-column registry in output order (bam_plcmd.c flag bits 11..26)
COL_MAPQ_CHAR = 1 << 11
COL_QPOS = 1 << 12
COL_QNAME = 1 << 13
COL_FLAG = 1 << 14
COL_RNAME = 1 << 15
COL_POS = 1 << 16
COL_MAPQ = 1 << 17
COL_CIGAR = 1 << 18
COL_RNEXT = 1 << 19
COL_PNEXT = 1 << 20
COL_TLEN = 1 << 21
COL_SEQ = 1 << 22
COL_QUAL = 1 << 23
COL_RLEN = 1 << 24
COL_MODS = 1 << 25
COL_QPOS5 = 1 << 26
COL_LAST = 1 << 27

_NAMED_COLS = {  # --output-extra names -> flag (supported subset as ref)
    "QNAME": COL_QNAME, "FLAG": COL_FLAG, "RNAME": COL_RNAME,
    "POS": COL_POS, "MAPQ": COL_MAPQ, "RNEXT": COL_RNEXT,
    "PNEXT": COL_PNEXT, "RLEN": COL_RLEN,
}

def _kputd(v: float) -> str:
    """htslib kputd: shortest %g-like double rendering."""
    s = "%g" % v
    return s


SEQ_LC = ",acmgrsvtwyhkdbn"
SEQ_UC = ".ACMGRSVTWYHKDBN"
NT16 = np.full(256, 15, np.uint8)
for _i, _c in enumerate("=ACMGRSVTWYHKDBN"):
    NT16[ord(_c)] = _i
    NT16[ord(_c.lower())] = _i


def usage(fp):
    fp.write(
        "Usage: samtools mpileup [options] in1.bam [in2.bam [...]]\n"
        "\nInput options:\n"
        "  -6, --illumina1.3+      quality is in the Illumina-1.3+ encoding\n"
        "  -A, --count-orphans     do not discard anomalous read pairs\n"
        "  -b, --bam-list FILE     list of input BAM filenames, one per line\n"
        "  -B, --no-BAQ            disable BAQ (per-Base Alignment Quality)\n"
        "  -C, --adjust-MQ INT     adjust mapping quality [0]\n"
        "  -d, --max-depth INT     max per-file depth; avoids excessive memory usage [8000]\n"
        "  -E, --redo-BAQ          recalculate BAQ on the fly, ignore existing BQs\n"
        "  -f, --fasta-ref FILE    faidx indexed reference sequence file\n"
        "  -G, --exclude-RG FILE   exclude read groups listed in FILE\n"
        "  -l, --positions FILE    skip unlisted positions (chr pos) or regions (BED)\n"
        "  -q, --min-MQ INT        skip alignments with mapQ smaller than INT [0]\n"
        "  -Q, --min-BQ INT        skip bases with baseQ/BAQ smaller than INT [13]\n"
        "  -r, --region REG        region in which pileup is generated\n"
        "  -R, --ignore-RG         ignore RG tags (one BAM = one sample)\n"
        "  --rf, --incl-flags STR|INT\n"
        "                          required flags: include reads with any of the mask bits set []\n"
        "  --ff, --excl-flags STR|INT\n"
        "                          filter flags: skip reads with any of the mask bits set\n"
        "                          [UNMAP,SECONDARY,QCFAIL,DUP]\n"
        "  -x, --ignore-overlaps-removal, --disable-overlap-removal\n"
        "                          disable read-pair overlap detection and removal\n"
        "  -X, --customized-index  use customized index files\n"
        "\nOutput options:\n"
        "  -o, --output FILE       write output to FILE [standard output]\n"
        "  -O, --output-BP         output base positions on reads, current orientation\n"
        "  --output-BP-5           output base positions on reads, 5' to 3' orientation\n"
        "  -M, --output-mods       output base modifications\n"
        "  -s, --output-MQ         output mapping quality\n"
        "  --output-QNAME          output read names\n"
        "  --output-extra STR      output extra read fields and read tag values\n"
        "  --output-sep CHAR       set the separator character for tag lists [,]\n"
        "  --output-empty CHAR     set the no value character for tag lists [*]\n"
        "  --no-output-ins         skip insertion sequence output\n"
        "  --no-output-ins-mods    skip insertion base modifications\n"
        "  --no-output-del         skip deletion sequence output\n"
        "  --no-output-ends        remove the '^' and '$' markers\n"
        "  --reverse-del           use '#' character for deletions on the reverse strand\n"
        "  -a                      output all positions (including zero depth)\n"
        "  -a -a (or -aa)          output absolutely all positions, including unused ref. sequences\n")


class FileState:
    """Per-input-file pileup state for one contig."""

    def __init__(self, sub, pileup, piece_flat, piece_off, qual_chars,
                 pass_q):
        self.sub = sub
        self.p = pileup
        self.piece_flat = piece_flat   # uint8 flat of per-entry strings
        self.piece_off = piece_off     # int64[n_entries+1]
        self.qual_chars = qual_chars
        self.pass_q = pass_q
        self._pos2col = None

    @property
    def pos2col(self):
        # column lookup (slow per-column path only; the bulk renderer
        # maps positions with one searchsorted instead)
        if self._pos2col is None:
            self._pos2col = {int(p): i
                             for i, p in enumerate(self.p.col_pos)}
        return self._pos2col

    def entry_bytes(self, i: int) -> str:
        return bytes(self.piece_flat[self.piece_off[i]:
                                     self.piece_off[i + 1]]) \
            .decode("latin-1")


def build_entry_pieces(sub, p, ref: bytes | None, ref_len: int, conf):
    """Vectorized entry rendering: per entry the seq-string piece bytes
    (flat uint8 + offsets), the qual char, and the min-BQ pass mask.

    Plain entries (incl. ^q heads / $ tails) are rendered with pure
    array scatters; only entries carrying an indel anchor or a base
    modification drop to the Python string builder (pileup_seq's rare
    branches, bam_plcmd.c:86-169)."""
    n = p.n_entries
    rev = (sub.flag[p.rid] & F.FREVERSE) != 0
    lq = sub.l_qseq[p.rid]
    have_base = p.qpos < lq
    code = np.full(n, 15, np.int64)
    hv = np.nonzero(have_base)[0]
    code[hv] = sub.seq[sub.seq_off[p.rid[hv]] + p.qpos[hv]]
    if ref is not None:
        rb = np.full(n, 15, np.int64)
        inref = p.pos < ref_len
        refarr = np.frombuffer(ref, np.uint8)
        rb[inref] = NT16[refarr[p.pos[inref]]]
        code = np.where(code == rb, 0, code)
    uc = np.frombuffer(SEQ_UC.encode(), np.uint8)
    lc = np.frombuffer(SEQ_LC.encode(), np.uint8)
    base_ch = np.where(rev, lc[code], uc[code]).astype(np.uint8)
    # deletion / refskip chars
    del_ch = np.where(p.is_refskip,
                      np.where(rev, ord("<"), ord(">")),
                      np.where(rev & bool(conf["rev_del"]),
                               ord("#"), ord("*"))).astype(np.uint8)
    ch = np.where(p.is_del, del_ch, base_ch)

    # qual char + pass mask
    qv = np.zeros(n, np.int64)
    qv[hv] = sub.qual[sub.seq_off[p.rid[hv]] + p.qpos[hv]]
    pass_q = qv >= conf["min_baseQ"]
    qch = np.minimum(qv + 33, 126).astype(np.uint8)

    # mapq char for ^ marker
    mq = np.minimum(sub.mapq[p.rid].astype(np.int64) + 33, 126).astype(np.uint8)

    # base modifications (-M): {rid: {qpos: [(strand, code, qual)]}};
    # entries carrying a mod annotation leave the plain fast path
    # (pileup_seq mod branch, bam_plcmd.c:86-110)
    want_mods = bool(conf["flag_cols"] & COL_MODS)
    mods_by_rid: dict = {}
    has_mod = np.zeros(n, bool)
    if want_mods:
        mods_by_rid = basemods.batch_mods(sub, p.rid)
        if mods_by_rid:
            mod_rows = np.nonzero(np.isin(
                p.rid, np.fromiter(mods_by_rid, np.int64,
                                   len(mods_by_rid))))[0]
            for i in mod_rows:
                m = mods_by_rid.get(int(p.rid[i]))
                if m is not None and not p.is_del[i] \
                        and int(p.qpos[i]) in m:
                    has_mod[i] = True

    no_ends = conf["no_ends"]
    special = (p.indel != 0) | has_mod
    headv = p.is_head & (not no_ends)
    tailv = p.is_tail & (not no_ends)
    lens = (1 + 2 * (headv & ~special) + (tailv & ~special)) \
        .astype(np.int64)
    spec_idx = np.nonzero(special)[0]
    spec_strs: list[bytes] = []
    if spec_idx.size:
        chr_lut = [chr(i) for i in range(256)]
        no_ins = conf["no_ins"]
        no_del = conf["no_del"]
        no_ins_mods = conf["no_ins_mods"] or no_ins
        for i in spec_idx:
            rmods = mods_by_rid.get(int(p.rid[i])) if want_mods else None
            s = []
            if p.is_head[i] and not no_ends:
                s.append("^")
                s.append(chr_lut[mq[i]])
            s.append(chr_lut[ch[i]])
            if rmods is not None and not p.is_del[i]:
                lst = rmods.get(int(p.qpos[i]))
                if lst:
                    s.append(basemods.format_mods(lst))
            ind = int(p.indel[i])
            del_len = -ind
            if ind > 0:
                ins_str, del_after, ins_qpos = p.ins.get(int(i),
                                                         ("", 0, []))
                del_len = del_after
                if no_ins < 2:
                    s.append("+")
                    s.append(str(len(ins_str)))
                if not no_ins:
                    ins_mods = (rmods if (rmods is not None and
                                          not no_ins_mods) else None)
                    if rev[i]:
                        pad = "#" if conf["rev_del"] else "*"
                        for k, c in enumerate(ins_str):
                            s.append(pad if c == "*" else c.lower())
                            if ins_mods is not None and ins_qpos[k] >= 0:
                                lst = ins_mods.get(ins_qpos[k])
                                if lst:
                                    s.append(basemods.format_mods(lst))
                    else:
                        for k, c in enumerate(ins_str):
                            s.append(c.upper())
                            if ins_mods is not None and ins_qpos[k] >= 0:
                                lst = ins_mods.get(ins_qpos[k])
                                if lst:
                                    s.append(basemods.format_mods(lst))
            if del_len > 0:
                if no_del < 2:
                    s.append(str(-del_len))
                if not no_del:
                    refpart = []
                    for j in range(1, del_len + 1):
                        pj = int(p.pos[i]) + j
                        c = chr(ref[pj]) if (ref is not None
                                             and pj < ref_len) else "N"
                        refpart.append(c.lower() if rev[i] else c.upper())
                    s.append("".join(refpart))
            if p.is_tail[i] and not no_ends:
                s.append("$")
            sb = "".join(s).encode("latin-1")
            spec_strs.append(sb)
            lens[i] = len(sb)

    off = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    flat = np.empty(int(off[-1]), np.uint8)
    pl = ~special
    ph = pl & headv
    # base char lands after the optional ^q prefix
    flat[off[:-1][pl] + 2 * ph[pl]] = ch[pl]
    if ph.any():
        hidx = off[:-1][ph]
        flat[hidx] = ord("^")
        flat[hidx + 1] = mq[ph]
    pt = pl & tailv
    if pt.any():
        flat[off[:-1][pt] + 2 * ph[pt] + 1] = ord("$")
    for k, i in enumerate(spec_idx):
        sb = spec_strs[k]
        flat[off[i]:off[i] + len(sb)] = np.frombuffer(sb, np.uint8)
    return flat, off, qch, pass_q


def _read_filter(f, conf, bedidx, header):
    """mplp_func filter chain (minus per-read BAQ, applied separately)."""
    b = f.batch
    fl = b.flag.astype(np.int64)
    keep = (b.tid >= 0) & ((fl & F.FUNMAP) == 0)
    if conf["rflag_require"]:
        keep &= (fl & conf["rflag_require"]) != 0
    if conf["rflag_filter"]:
        keep &= (fl & conf["rflag_filter"]) == 0
    if bedidx is not None and conf["all"] == 0:
        end = b.end_pos()
        hit = np.zeros(b.n, bool)
        for t in np.unique(b.tid[b.tid >= 0]):
            m = np.nonzero(b.tid == t)[0]
            hit[m] = bedidx.overlap(header.ref_names[t], b.pos[m], end[m])
        keep &= hit
    if conf["rghash"] is not None:
        rg = auxmod.batch_tag_values(b, "RG")
        keep &= np.array([not (v is not None and v in conf["rghash"])
                          for v in rg], bool)
    return keep


def main_mpileup(argv: list[str]) -> int:
    ga = GlobalArgs()
    conf = dict(
        min_mq=0, min_baseQ=13, capQ_thres=0, max_depth=8000,
        rflag_require=0, rflag_filter=DEFAULT_FF,
        no_orphan=True, realn=True, smart_overlaps=True, redo_baq=False,
        illumina13=False, ignore_rg=False, all=0, rev_del=0, checkpoint=None,
        sep=",", empty="*", no_ins=0, no_ins_mods=0, no_del=0, no_ends=0,
        flag_cols=0, auxtags=[], rghash=None, census_out=None,
    )
    reg = None
    bedidx = None
    fai = None
    out_fname = None
    file_list = None
    has_index_file = False
    longopts = [
        "rf=", "ff=", "incl-flags=", "excl-flags=", "output=",
        "output-QNAME", "output-qname", "illumina1.3+", "count-orphans",
        "bam-list=", "no-BAQ", "no-baq", "adjust-MQ=", "adjust-mq=",
        "max-depth=", "redo-BAQ", "redo-baq", "fasta-ref=", "exclude-RG=",
        "exclude-rg=", "positions=", "region=", "ignore-RG", "ignore-rg",
        "min-MQ=", "min-mq=", "min-BQ=", "min-bq=",
        "ignore-overlaps-removal", "disable-overlap-removal", "output-mods",
        "output-BP", "output-bp", "output-BP-5", "output-bp-5", "output-MQ",
        "output-mq", "customized-index", "reverse-del", "output-extra=",
        "output-sep=", "output-empty=", "no-output-ins",
        "no-output-ins-mods", "no-output-del", "no-output-ends",
        "checkpoint=", "census-out=",
    ]
    try:
        opts, args = gnu_getopt(argv, "Af:r:l:q:Q:RC:Bd:b:o:EG:6OsxXaM",
                                longopts)
    except UsageError:
        usage(sys.stderr)
        return 1
    for o, v in opts:
        if o in ("-x", "--ignore-overlaps-removal",
                 "--disable-overlap-removal"):
            conf["smart_overlaps"] = False
        elif o in ("--rf", "--incl-flags"):
            conf["rflag_require"] = str2flag(v)
        elif o in ("--ff", "--excl-flags"):
            conf["rflag_filter"] = str2flag(v)
        elif o == "--checkpoint":
            conf["checkpoint"] = v
        elif o == "--census-out":
            # framework extension: per-window BAQ-stage census
            # checksums (the device pipeline's validation artifact)
            conf["census_out"] = v
        elif o in ("-o", "--output"):
            out_fname = v
        elif o in ("--output-QNAME", "--output-qname"):
            conf["flag_cols"] |= COL_QNAME
        elif o == "--reverse-del":
            conf["rev_del"] = 1
        elif o == "--output-extra":
            for tag in v.split(","):
                if tag in _NAMED_COLS:
                    conf["flag_cols"] |= _NAMED_COLS[tag]
                elif len(tag) == 2:
                    conf["auxtags"].append(tag)
                else:
                    sys.stderr.write(
                        f"[build_auxlist] tag '{tag}' has more than two "
                        "characters or not supported\n")
        elif o == "--output-sep":
            conf["sep"] = v[0]
        elif o == "--output-empty":
            conf["empty"] = v[0]
        elif o == "--no-output-ins":
            conf["no_ins"] += 1
        elif o == "--no-output-ins-mods":
            conf["no_ins_mods"] = 1
        elif o == "--no-output-del":
            conf["no_del"] += 1
        elif o == "--no-output-ends":
            conf["no_ends"] = 1
        elif o in ("-f", "--fasta-ref"):
            try:
                fai = fastamod.load_fasta(v)
            except OSError as e:
                print_error_errno("mpileup", 'Could not load fasta "%s"', v,
                                  exc=e)
                return 1
        elif o in ("-d", "--max-depth"):
            conf["max_depth"] = int(v)
        elif o in ("-r", "--region"):
            reg = v
        elif o in ("-l", "--positions"):
            try:
                bedidx = bedmod.read_bed(v)
            except OSError as e:
                print_error_errno("mpileup", 'Could not read file "%s"', v,
                                  exc=e)
                return 1
        elif o in ("-B", "--no-BAQ", "--no-baq"):
            conf["realn"] = False
        elif o == "-X":
            has_index_file = True
        elif o in ("-E", "--redo-BAQ", "--redo-baq"):
            conf["redo_baq"] = True
        elif o in ("-6", "--illumina1.3+"):
            conf["illumina13"] = True
        elif o in ("-R", "--ignore-RG", "--ignore-rg"):
            conf["ignore_rg"] = True
        elif o in ("-s", "--output-MQ", "--output-mq"):
            conf["flag_cols"] |= COL_MAPQ_CHAR
        elif o in ("-O", "--output-BP", "--output-bp"):
            conf["flag_cols"] |= COL_QPOS
        elif o == "--output-BP-5":
            conf["flag_cols"] |= COL_QPOS5
        elif o in ("-M", "--output-mods"):
            conf["flag_cols"] |= COL_MODS
        elif o in ("-C", "--adjust-MQ", "--adjust-mq"):
            conf["capQ_thres"] = int(v)
        elif o in ("-q", "--min-MQ", "--min-mq"):
            conf["min_mq"] = int(v)
        elif o in ("-Q", "--min-BQ", "--min-bq"):
            conf["min_baseQ"] = int(v)
        elif o in ("-b", "--bam-list"):
            file_list = v
        elif o in ("-A", "--count-orphans"):
            conf["no_orphan"] = False
        elif o in ("-G", "--exclude-RG", "--exclude-rg"):
            conf["rghash"] = set()
            try:
                for line in open(v):
                    for word in line.split():
                        conf["rghash"].add(word)
            except OSError:
                sys.stderr.write(
                    f"[bam_mpileup] Fail to open file {v}. Continue anyway.\n")
        elif o == "-a":
            conf["all"] += 1
        elif handle_global_opt(ga, o, v):
            pass
        else:
            usage(sys.stderr)
            return 1

    if fai is None and ga.reference:
        try:
            fai = fastamod.load_fasta(ga.reference)
        except OSError:
            return 1
    if not conf["realn"] and conf["redo_baq"]:
        sys.stderr.write("Error: The -B option cannot be combined with -E\n")
        return 1
    if not argv:
        usage(sys.stderr)
        return 1
    if file_list:
        with open(file_list) as fh:
            args = [l.strip() for l in fh if l.strip()]
    elif has_index_file:
        nfiles = len(args) // 2
        args = args[:nfiles]
    if not args:
        sys.stderr.write("[mpileup] no input file/data given\n")
        return 1

    files = []
    region = None
    for path in args:
        try:
            loaded = None
            if reg:
                # sam_itr_querys analog (bam_plcmd.c:541-550): read only
                # the indexed byte ranges overlapping the region
                got = try_region_read(path, ga.nthreads, reg)
                if got is not None:
                    loaded, region = got
            if loaded is None and not reg and path != "-":
                # BGZF BAMs stream in bounded windows (bam_plcmd.c's
                # one-record memory profile via bam_plp); stdin and
                # other formats take the in-memory reader
                try:
                    from ..io.stream import BamStream
                    st = BamStream(path, threads=ga.nthreads or 2)
                    import types
                    loaded = types.SimpleNamespace(header=st.header,
                                                   stream=st, path=path)
                except OSError:
                    raise
                except Exception:
                    loaded = None
            if loaded is None:
                loaded = read_alignments(path, threads=ga.nthreads)
            files.append(loaded)
        except RegionError:
            sys.stderr.write(f"[E::mpileup] fail to parse region '{reg}'\n")
            return 1
        except OSError as e:
            sys.stderr.write(f"[mpileup] failed to open {path}: "
                             f"{e.strerror}\n")
            return 1
    header = files[0].header
    n_samples = _count_samples(files, args, conf)
    sys.stderr.write(f"[mpileup] {n_samples} samples in {len(files)} "
                     "input files\n")

    if reg and region is None:
        try:
            region = parse_region(reg, header.tid)
        except RegionError:
            sys.stderr.write(f"[E::mpileup] fail to parse region '{reg}'\n")
            return 1

    shards = _n_shards()
    if (shards > 1 and not reg and not conf.get("checkpoint")
            and len(args) == 1 and args[0] != "-"
            and os.environ.get("SAMTPU_MPILEUP_SHARD_WORKER") != "1"):
        rc = _run_sharded(argv, args[0], header, shards, out_fname)
        if rc is not None:
            return rc

    ck_state = None
    if conf.get("checkpoint"):
        if not out_fname:
            sys.stderr.write("[mpileup] --checkpoint requires -o FILE;"
                             " ignoring\n")
            conf["checkpoint"] = None
        else:
            ck_state = _load_checkpoint(conf["checkpoint"], args)
    if ck_state and out_fname and os.path.exists(out_fname):
        out = open(out_fname, "r+")
        out.truncate(ck_state["out_off"])
        out.seek(ck_state["out_off"])
        conf["_ck_state"] = ck_state
    else:
        conf["_ck_state"] = None
        out = open(out_fname, "w") if out_fname else sys.stdout
    rc = _run_pileup(files, args, header, conf, region, bedidx, fai, out)
    if out is not sys.stdout:
        out.close()
    return rc


def _n_shards() -> int:
    v = os.environ.get("SAMTPU_SHARDS", "1")
    try:
        return max(int(v), 1)
    except ValueError:
        return 1


def _run_sharded(argv, path, header, shards, out_fname) -> int | None:
    """Span-block parallel mpileup: the genome is split into
    length-balanced contiguous span lists, one worker process per
    shard runs the identical tool over its spans (-r region column
    ownership == window ownership), and the outputs concatenate in
    span order.  The process-level generalization of the reference's
    span-block pool (bam_consensus.c:2626) applied to mpileup; also
    the single-host form of the BASELINE region axis.  Returns None to
    fall through to the serial path when sharding is not applicable."""
    import subprocess
    import tempfile

    spans = []
    for tid in range(header.n_refs):
        ln = int(header.ref_lens[tid])
        if ln <= 0:
            continue
        step = max((ln + shards - 1) // shards, 1 << 20)
        for beg in range(0, ln, step):
            spans.append((tid, beg, min(beg + step, ln)))
    if len(spans) <= 1:
        return None
    # strip -o/--output from the forwarded argv (workers write temps)
    fwd = []
    skip = False
    for a in argv:
        if skip:
            skip = False
            continue
        if a in ("-o", "--output"):
            skip = True
            continue
        fwd.append(a)
    procs = []
    tmps = []
    env = dict(os.environ, SAMTPU_MPILEUP_SHARD_WORKER="1")
    try:
        for k, (tid, beg, end) in enumerate(spans):
            tf = tempfile.NamedTemporaryFile(
                prefix=f"mpileup.shard{k:03d}.", suffix=".txt",
                delete=False)
            tmps.append(tf.name)
            tf.close()
            reg = "%s:%d-%d" % (header.ref_names[tid], beg + 1, end)
            p = subprocess.Popen(
                [sys.executable, "-m", "samtools_tpu", "mpileup",
                 "-r", reg] + fwd + ["-o", tf.name],
                env=env, stderr=subprocess.DEVNULL)
            procs.append(p)
            while sum(q.poll() is None for q in procs) >= shards:
                procs[-shards].wait()
        for p in procs:
            if p.wait() != 0:
                return 1
        out = open(out_fname, "wb") if out_fname else sys.stdout.buffer
        try:
            for fn in tmps:
                with open(fn, "rb") as fh:
                    while True:
                        chunk = fh.read(1 << 22)
                        if not chunk:
                            break
                        out.write(chunk)
        finally:
            if out_fname:
                out.close()
            else:
                out.flush()
        return 0
    finally:
        for fn in tmps:
            try:
                os.remove(fn)
            except OSError:
                pass


def _count_samples(files, paths, conf) -> int:
    """bam_smpl_add semantics: one sample per distinct SM (RG ID when SM
    missing; file name when no RG / ignore-RG)."""
    samples = set()
    for f, path in zip(files, paths):
        if conf["ignore_rg"]:
            samples.add(path)
            continue
        rgs = f.header.rg_to_sample()
        if rgs:
            samples.update(rgs.values())
        else:
            samples.add(path)
    return len(samples)


def _empty_row(name: str, pos: int, ref: bytes | None, ref_len: int,
               nf: int, conf) -> str:
    refc = chr(ref[pos]) if (ref is not None and pos < ref_len) else "N"
    cols = []
    fv = COL_MAPQ_CHAR
    while fv < COL_LAST:
        if fv != COL_MODS and (conf["flag_cols"] & fv):
            cols.append("\t*")
        fv <<= 1
    cols.extend("\t*" for _ in conf["auxtags"])
    percol = "\t0\t*\t*" + "".join(cols)
    return f"{name}\t{pos + 1}\t{refc}" + percol * nf + "\n"


def _itoa(vals: np.ndarray):
    """Vectorized non-negative decimal rendering.

    Returns (flat uint8 digits, digit counts int64, offsets int64[n+1])."""
    v = np.asarray(vals, np.int64)
    nd = np.ones(v.size, np.int64)
    t = 10
    while t <= (int(v.max()) if v.size else 0):
        nd[v >= t] += 1
        t *= 10
    off = np.zeros(v.size + 1, np.int64)
    np.cumsum(nd, out=off[1:])
    flat = np.empty(int(off[-1]), np.uint8)
    end = off[1:] - 1
    rem = v.copy()
    for d in range(int(nd.max(initial=0))):
        act = nd > d
        flat[end[act] - d] = 48 + (rem[act] % 10)
        rem[act] //= 10
    return flat, nd, off


def _ragged_scatter(buf, cur, lens, src_flat, src_off):
    """buf[cur[i] : cur[i]+lens[i]] = src_flat[src_off[i] : +lens[i]],
    vectorized over all i (rows with lens 0 contribute nothing)."""
    from ..core.batch import ragged_gather_indices
    total = int(lens.sum())
    if total == 0:
        return
    tgt = ragged_gather_indices(cur, lens)
    src = ragged_gather_indices(src_off, lens)
    buf[tgt] = src_flat[src]


def _render_rows(emitpos: np.ndarray, states, name: str,
                 ref: bytes | None, ref_len: int, conf) -> np.ndarray:
    """Assemble one window's pileup text as a single byte buffer.

    Replaces the reference's per-column fwrite loop (bam_plcmd.c:607-863)
    with bulk array scatters: every field's bytes and offsets are
    computed vectorized over all emitted rows, then written into one
    preallocated uint8 buffer.  Rows follow the default-column grammar
    (extra output columns take the per-column path instead)."""
    nrow = emitpos.size
    name_b = np.frombuffer(name.encode(), np.uint8)
    if ref is not None:
        refarr = np.frombuffer(ref, np.uint8)
        refc = np.where(emitpos < ref_len,
                        refarr[np.minimum(emitpos, max(ref_len - 1, 0))],
                        ord("N")).astype(np.uint8)
    else:
        refc = np.full(nrow, ord("N"), np.uint8)
    pos_flat, pos_nd, pos_off = _itoa(emitpos + 1)

    per_file = []
    row_len = np.full(nrow, len(name_b) + 3 + 1, np.int64) + pos_nd
    for s in states:
        p = s.p
        ncols = p.col_pos.size
        if ncols:
            ci = np.searchsorted(p.col_pos, emitpos)
            cic = np.minimum(ci, ncols - 1)
            pres = (ci < ncols) & (p.col_pos[cic] == emitpos)
            lo = np.where(pres, p.col_off[cic], 0)
            hi = np.where(pres, p.col_off[np.minimum(cic + 1, ncols)], 0)
        else:
            lo = hi = np.zeros(nrow, np.int64)
        # cumulative passing-entry counts / piece lengths
        cq = np.zeros(p.n_entries + 1, np.int64)
        np.cumsum(s.pass_q, out=cq[1:])
        piece_len = s.piece_off[1:] - s.piece_off[:-1]
        cl = np.zeros(p.n_entries + 1, np.int64)
        np.cumsum(piece_len * s.pass_q, out=cl[1:])
        cnt = cq[hi] - cq[lo]
        seq_lo = cl[lo]
        seq_len = cl[hi] - cl[lo]
        qual_lo = cq[lo]
        # compact passing pieces / qual chars (offsets = cl / cq)
        pidx = np.nonzero(s.pass_q)[0]
        from ..core.batch import ragged_gather_indices
        pflat = s.piece_flat[ragged_gather_indices(
            s.piece_off[:-1][pidx], piece_len[pidx])]
        pqch = s.qual_chars[pidx]
        cnt_flat, cnt_nd, cnt_off = _itoa(cnt)
        seq_fld = np.where(cnt > 0, seq_len, 1)
        qual_fld = np.where(cnt > 0, cnt, 1)
        row_len += 3 + cnt_nd + seq_fld + qual_fld
        per_file.append((cnt, cnt_flat, cnt_nd, cnt_off, pflat, seq_lo,
                         seq_len, pqch, qual_lo))

    row_off = np.zeros(nrow + 1, np.int64)
    np.cumsum(row_len, out=row_off[1:])
    buf = np.empty(int(row_off[-1]), np.uint8)
    cur = row_off[:-1].copy()
    # name
    if len(name_b):
        tgt = cur[:, None] + np.arange(len(name_b))[None, :]
        buf[tgt.reshape(-1)] = np.tile(name_b, nrow)
        cur += len(name_b)
    buf[cur] = 9
    cur += 1
    _ragged_scatter(buf, cur, pos_nd, pos_flat, pos_off[:-1])
    cur += pos_nd
    buf[cur] = 9
    buf[cur + 1] = refc
    cur += 2
    star = np.frombuffer(b"*", np.uint8)
    zero_off = np.zeros(nrow, np.int64)
    for (cnt, cnt_flat, cnt_nd, cnt_off, pflat, seq_lo, seq_len,
         pqch, qual_lo) in per_file:
        buf[cur] = 9
        cur += 1
        _ragged_scatter(buf, cur, cnt_nd, cnt_flat, cnt_off[:-1])
        cur += cnt_nd
        buf[cur] = 9
        cur += 1
        nz = cnt > 0
        _ragged_scatter(buf, cur, np.where(nz, seq_len, 0), pflat, seq_lo)
        if not nz.all():
            _ragged_scatter(buf, cur, (~nz).astype(np.int64), star,
                            zero_off)
        cur += np.where(nz, seq_len, 1)
        buf[cur] = 9
        cur += 1
        _ragged_scatter(buf, cur, np.where(nz, cnt, 0), pqch, qual_lo)
        if not nz.all():
            _ragged_scatter(buf, cur, (~nz).astype(np.int64), star,
                            zero_off)
        cur += np.where(nz, cnt, 1)
    buf[cur] = 10
    return buf


def _checkpoint_sig(paths):
    sig = []
    for p in paths:
        try:
            sig.append([p, os.path.getsize(p)])
        except OSError:
            sig.append([p, -1])
    return sig


def _load_checkpoint(path, paths):
    """Load and validate a checkpoint written by a previous run over the
    same inputs (region-shard restart, SURVEY §5: each window's output
    is independent, so the file truncates to the last complete window
    and the stream re-enters at the saved record voffsets)."""
    try:
        with open(path) as fh:
            st = json.load(fh)
    except (OSError, ValueError):
        return None
    if st.get("sig") != _checkpoint_sig(paths):
        return None
    return st


def _run_pileup(files, paths, header, conf, region, bedidx, fai, out) -> int:
    nf = len(files)
    streaming = (region is None
                 and all(getattr(f, "stream", None) is not None
                         for f in files))
    selections: list = []
    tid_list: list = []
    if not streaming:
        # per-file read selection over the in-memory batches
        for f in files:
            keep = _read_filter(f, conf, bedidx, header)
            selections.append(keep)
        tids = set()
        for f, keep in zip(files, selections):
            tids.update(np.unique(f.batch.tid[keep & (f.batch.tid >= 0)])
                        .tolist())
        if region is not None:
            tids = {region.tid}
        tid_list = sorted(tids)

    beg0 = region.beg if region else 0
    end0 = region.end if region else (1 << 62)

    last_tid = -1
    last_pos = -1
    ref_cache = {}
    one_seq = False

    def get_ref(tid):
        if fai is None:
            return None, 0
        if tid in ref_cache:
            return ref_cache[tid]
        name = header.ref_names[tid]
        if fai.has(name):
            seq = fai.fetch(name)
            got = (seq, len(seq))
        else:
            got = (None, 0)
        if len(ref_cache) > 3:
            ref_cache.clear()
        ref_cache[tid] = got
        return got

    w = out.write
    ref, ref_len = None, 0

    def _slurped_windows():
        for tid in tid_list:
            subs = []
            for f, keep in zip(files, selections):
                b = f.batch
                sel = np.nonzero(keep & (b.tid == tid))[0]
                if region is not None and sel.size:
                    end = b.end_pos()
                    sel = sel[(b.pos[sel] < region.end)
                              & (end[sel] > region.beg)]
                subs.append(b.take(sel))
            yield tid, None, None, subs

    ck_path = conf.get("checkpoint") if streaming else None
    ck_state = conf.get("_ck_state")
    cursors = None
    resume = None
    if streaming:
        if ck_state:
            cursors = [_WindowCursor(f.stream, conf, bedidx, header,
                                     start_voffset=v,
                                     purge_before=(ck_state["tid"],
                                                   ck_state["wb"]))
                       for f, v in zip(files, ck_state["voffs"])]
            resume = (ck_state["tid"], ck_state["wb"])
            last_tid = ck_state["last_tid"]
            last_pos = ck_state["last_pos"]
        elif ck_path:
            cursors = [_WindowCursor(f.stream, conf, bedidx, header)
                       for f in files]
        windows = _stream_windows([f.stream for f in files], conf,
                                  bedidx, header, cursors=cursors,
                                  resume=resume)
    else:
        windows = _slurped_windows()

    # native text fast path: single file, default columns (the numpy
    # renderer below is the portable fallback and the parity oracle)
    native_fast = (nf == 1 and conf["flag_cols"] == 0
                   and not conf["auxtags"]
                   and os.environ.get("SAMTPU_NATIVE_TEXT", "1") != "0")
    if native_fast:
        try:
            from ..io import native as _nat
            native_fast = _nat.has_mpileup_text()
        except Exception:
            native_fast = False

    # the TPU engine: fused device BAQ+census per window (falls back
    # to the host HMM per window when the device/link can't take it)
    engine = None
    if (native_fast and conf["realn"] and conf["capQ_thres"] <= 10
            and fai is not None
            and os.environ.get("SAMTPU_DEVICE") not in ("0", "host")):
        engine = _DeviceBaqEngine(conf)

    for tid, wb, we, subs in windows:
        name = header.ref_names[tid]
        if native_fast:
            states = None
            nat_sub, _, _ = _prepare_sub(subs[0], conf, tid, get_ref,
                                         files[0], wb, we,
                                         engine=engine)
            if nat_sub.n == 0:
                continue
            data_hi = int(nat_sub.end_pos().max())
            data_lo = int(nat_sub.pos.min())
            e_end = min(we if we is not None else 1 << 62, end0, data_hi)
            first_cov = max(data_lo, wb if wb is not None else 0, beg0)
            if first_cov >= e_end:
                continue
        else:
            # assemble per-file states for this window
            states = [_prepare_file_state(sub, conf, tid, get_ref,
                                          files, f, wb=wb, we=we)
                      for sub, f in zip(subs, files)]
            # merged column positions
            col_sets = [s.p.col_pos for s in states if s.p.n_entries]
            if not col_sets:
                continue
            allpos = np.unique(np.concatenate(col_sets))
            if wb is not None:
                # window ownership: halo reads contribute entries
                # outside [wb, we); those columns belong to neighboring
                # windows
                allpos = allpos[(allpos >= wb) & (allpos < we)]
            if region is not None:
                allpos = allpos[(allpos >= beg0) & (allpos < end0)]
            if allpos.size == 0:
                continue
        one_seq = True

        # -a: fill previous tids
        if conf["all"]:
            while tid > last_tid:
                if last_tid >= 0 and region is None:
                    r, rl = get_ref(last_tid)
                    lname = header.ref_names[last_tid]
                    for pp in range(last_pos + 1,
                                    header.ref_lens[last_tid]):
                        if bedidx is not None and not bedidx.overlap_one(
                                lname, pp, pp + 1):
                            continue
                        w(_empty_row(lname, pp, r, rl, nf, conf))
                last_tid += 1
                last_pos = -1
                if conf["all"] < 2:
                    break
        ref, ref_len = get_ref(tid)
        last_tid = tid

        bulk_ok = ((conf["flag_cols"] & ~COL_MODS) == 0
                   and not conf["auxtags"])
        if native_fast:
            if conf["all"]:
                e_beg = min(max(last_pos + 1, beg0), first_cov)
                last_pos = e_end - 1
            else:
                e_beg = first_cov
            mask = None
            if bedidx is not None:
                rng = np.arange(e_beg, e_end, dtype=np.int64)
                mask = bedidx.overlap(name, rng, rng + 1)
            from ..io import native as _nat
            text = _nat.mpileup_text(
                nat_sub, ref, name, e_beg, e_end, conf["all"] > 0, mask,
                conf["min_baseQ"], conf["rev_del"], conf["no_ends"],
                conf["no_ins"], conf["no_del"])
            if text:
                outb = getattr(out, "buffer", None)
                if outb is not None:
                    out.flush()
                    outb.write(text)
                else:
                    out.write(text.decode("latin-1"))
        elif bulk_ok:
            if conf["all"]:
                start = last_pos + 1
                if region is not None:
                    start = max(start, beg0)
                start = min(start, int(allpos[0]))
                emitpos = np.arange(start, int(allpos[-1]) + 1,
                                    dtype=np.int64)
                last_pos = int(allpos[-1])
            else:
                emitpos = allpos
            if bedidx is not None and emitpos.size:
                emitpos = emitpos[bedidx.overlap(name, emitpos,
                                                 emitpos + 1)]
            if emitpos.size:
                mem = _render_rows(emitpos, states, name, ref, ref_len,
                                   conf)
                outb = getattr(out, "buffer", None)
                if outb is not None:
                    out.flush()
                    outb.write(mem.tobytes())
                else:
                    out.write(mem.tobytes().decode("latin-1"))
        else:
            for pos in allpos.tolist():
                if conf["all"]:
                    r0 = last_pos + 1
                    for pp in range(r0, pos):
                        if region is not None and pp < beg0:
                            continue
                        if bedidx is not None and not bedidx.overlap_one(
                                name, pp, pp + 1):
                            continue
                        w(_empty_row(name, pp, ref, ref_len, nf, conf))
                    last_pos = pos
                if bedidx is not None and not bedidx.overlap_one(
                        name, pos, pos + 1):
                    continue
                refc = chr(ref[pos]) if (ref is not None
                                         and pos < ref_len) else "N"
                row = [name, "\t", str(pos + 1), "\t", refc]
                for s in states:
                    _append_file_column(row, s, pos, conf, header)
                row.append("\n")
                w("".join(row))
        if ck_path and cursors is not None and wb is not None:
            out.flush()
            st = {"sig": _checkpoint_sig(paths), "tid": tid, "wb": we,
                  "voffs": [c.checkpoint_voffset() for c in cursors],
                  "last_tid": last_tid, "last_pos": last_pos,
                  "out_off": out.tell()}
            with open(ck_path + ".tmp", "w") as fh:
                json.dump(st, fh)
            os.replace(ck_path + ".tmp", ck_path)

    if engine is not None and conf.get("census_out"):
        engine.write_census(conf["census_out"], header)

    # -a tail
    if conf["all"]:
        if last_tid < 0 and region is not None and conf["all"] > 1:
            last_tid = region.tid
            last_pos = beg0 - 1
        elif last_tid < 0 and not one_seq and conf["all"] > 1:
            last_tid = 0
        while 0 <= last_tid < header.n_refs:
            r, rl = get_ref(last_tid)
            lname = header.ref_names[last_tid]
            stop = min(header.ref_lens[last_tid], end0)
            for pp in range(last_pos + 1, header.ref_lens[last_tid]):
                if pp >= end0:
                    break
                if bedidx is not None and not bedidx.overlap_one(
                        lname, pp, pp + 1):
                    continue
                w(_empty_row(lname, pp, r, rl, nf, conf))
            del stop
            last_tid += 1
            last_pos = -1
            if conf["all"] < 2 or region is not None:
                break
    return 0


# streamed pileup window (columns per block): sized so one window's
# entry table (~30 reads/col x 1M cols) reuses the same heap buffers
# every window (see core/malloc_tune.py) instead of growing the peak
WINDOW_COLS = 1 << 20


class _WindowCursor:
    """Per-file read cursor for streamed pileup windows.

    Pulls decoded batches on demand, applies the mplp_func record
    filter, and hands out the window's overlap set: reads with
    pos < window_end whose footprint can still touch the window
    (carried halo reads included).  The reference's span-block driver
    re-queries the index with overlap (bam_consensus.c:2470); a
    sequential stream achieves the same by carrying boundary reads."""

    def __init__(self, stream, conf, bedidx, header,
                 start_voffset: int | None = None, purge_before=None):
        self.stream = stream
        self.gen = stream.batches(start_voffset=start_voffset)
        self.conf = conf
        self.bedidx = bedidx
        self.header = header
        self.pending: list = []       # (filtered batch, origin voffset)
        self.carry = None             # halo ReadBatch from prior window
        self.carry_voff = None
        self.done = False
        self.purge_before = purge_before  # (tid, wb) on resume

    def _pull(self):
        if self.done:
            return False
        origin = getattr(self.stream, "next_record_voffset",
                         self.stream._hdr_voffset)
        nb = next(self.gen, None)
        if nb is None:
            self.done = True
            return False
        import types
        keep = _read_filter(types.SimpleNamespace(batch=nb), self.conf,
                            self.bedidx, self.header)
        if self.purge_before is not None:
            # checkpoint restart: reads wholly before the resume window
            # were already emitted by the previous run
            rtid, rwb = self.purge_before
            end = nb.end_pos()
            keep &= (nb.tid > rtid) | ((nb.tid == rtid) & (end > rwb))
        sel = np.nonzero(keep)[0]
        if sel.size:
            self.pending.append((nb.take(sel), origin))
        return True

    def front(self):
        """(tid, pos) of the next unconsumed read, or None at EOF."""
        while not self.pending:
            if not self._pull():
                return None
        b = self.pending[0][0]
        return int(b.tid[0]), int(b.pos[0])

    def checkpoint_voffset(self) -> int:
        """A record voffset from which re-streaming rebuilds every read
        this cursor still holds (pending + carried halo)."""
        cands = []
        if self.carry is not None and self.carry_voff is not None:
            cands.append(self.carry_voff)
        if self.pending:
            cands.append(self.pending[0][1])
        if not cands:
            cands.append(getattr(self.stream, "next_record_voffset",
                                 self.stream._hdr_voffset))
        return min(cands)

    def window(self, tid: int, wb: int, we: int):
        """Overlap set for [wb, we) on tid; consumes reads with
        pos < we, carries those whose end > we for the next window."""
        parts = []
        voffs = []
        if self.carry is not None:
            cb, ctid = self.carry
            if ctid == tid:
                e = cb.end_pos()
                parts.append(cb.take(np.nonzero(e > wb)[0]))
                if self.carry_voff is not None:
                    voffs.append(self.carry_voff)
            self.carry = None
            self.carry_voff = None
        while True:
            fr = self.front()
            if fr is None or fr[0] > tid or (fr[0] == tid
                                             and fr[1] >= we):
                break
            b, origin = self.pending[0]
            m = (b.tid == tid) & (b.pos < we)
            take = np.nonzero(m)[0]
            rest = np.nonzero(~m)[0]
            parts.append(b.take(take))
            voffs.append(origin)
            if rest.size:
                self.pending[0] = (b.take(rest), origin)
                break
            self.pending.pop(0)
        from ..core.batch import ReadBatch
        sub = (ReadBatch.concat(parts) if len(parts) > 1 else
               parts[0] if parts else ReadBatch(n=0))
        if sub.n:
            e = sub.end_pos()
            hal = np.nonzero(e > we)[0]
            if hal.size:
                self.carry = (sub.take(hal), tid)
                self.carry_voff = min(voffs) if voffs else None
        return sub

    def has_more_on(self, tid: int) -> bool:
        if self.carry is not None and self.carry[1] == tid:
            return True
        fr = self.front()
        return fr is not None and fr[0] == tid


def _stream_windows(streams, conf, bedidx, header, cursors=None,
                    resume=None):
    """Merged window iterator over per-file streams: yields
    (tid, wb, we, subs) blocks in genomic order, bounded memory.

    resume=(tid, wb): force the first window there (checkpoint restart
    — the cursors were reopened at their saved record voffsets, so the
    overlap set of that window rebuilds exactly; columns before wb are
    excluded by window ownership)."""
    if cursors is None:
        cursors = [_WindowCursor(st, conf, bedidx, header)
                   for st in streams]
    forced = resume
    while True:
        fronts = [c.front() for c in cursors]
        live = [f for f in fronts if f is not None]
        if not live and forced is None:
            return
        if forced is not None:
            tid, wb = forced
            forced = None
            if not live:
                return
        else:
            tid = min(f[0] for f in live)
            wb = min(f[1] for f in live if f[0] == tid)
        while True:
            we = wb + WINDOW_COLS
            subs = [c.window(tid, wb, we) for c in cursors]
            yield tid, wb, we, subs
            if not any(c.has_more_on(tid) for c in cursors):
                break
            wb = we


def _prepare_file_state(sub, conf, tid, get_ref, files, f,
                        wb=None, we=None) -> FileState:
    sub, ref, ref_len = _prepare_sub(sub, conf, tid, get_ref, f, wb, we)
    p = plops.build_pileup(sub)
    piece_flat, piece_off, qual_chars, pass_q = build_entry_pieces(
        sub, p, ref, ref_len, conf)
    return FileState(sub, p, piece_flat, piece_off, qual_chars, pass_q)


def _prepare_sub(sub, conf, tid, get_ref, f, wb=None, we=None,
                 engine=None):
    """mplp_func per-read transform+filter chain for one window's reads:
    illumina quals, BAQ, capQ, min-mapQ/orphan filters, depth cap,
    overlap tweaks.  Returns (sub, ref, ref_len).

    With ``engine`` (the mpileup device engine) BAQ moves AFTER the
    min-mapQ/orphan/depth-cap filters — output-identical when capQ is
    inactive (those filters never read base quals; BAQ never touches
    mapq) and it both skips BAQ for dropped reads and makes the fused
    device census count exactly the filtered read set.  The engine is
    only offered when capQ_thres <= 10 and realn is on."""
    # quality transforms
    if conf["illumina13"]:
        q = sub.qual.astype(np.int64)
        sub.qual = np.where(q > 31, q - 31, 0).astype(np.uint8)
    ref, ref_len = get_ref(tid)
    if engine is None:
        if ref is not None and conf["realn"]:
            from ..ops import baq
            baq.apply_baq_batch(sub, ref, ref_len, redo=conf["redo_baq"])
        if ref is not None and conf["capQ_thres"] > 10:
            from ..ops import baq
            newq = baq.cap_mapq_batch(sub, ref, ref_len,
                                      conf["capQ_thres"])
            drop = newq < 0
            sub.mapq = np.where(newq >= 0,
                                np.minimum(sub.mapq, newq),
                                sub.mapq).astype(np.uint8)
            if drop.any():
                sub = sub.take(np.nonzero(~drop)[0])
    # min mapq / orphan filters come after BAQ/capQ (mplp_func order)
    keep = sub.mapq.astype(np.int64) >= conf["min_mq"]
    if conf["no_orphan"]:
        fl = sub.flag.astype(np.int64)
        keep &= ~(((fl & F.FPAIRED) != 0) & ((fl & F.FPROPER_PAIR) == 0))
    sub = sub.take(np.nonzero(keep)[0])
    if conf["max_depth"]:
        if wb is None:
            if sub.n > conf["max_depth"]:
                sub = sub.take(_depth_cap_select(sub, conf["max_depth"]))
        else:
            # streamed windows: cap decisions must be made once per read
            # (at its first window) and carried — a carried read's drop
            # state may depend on reads that ended before this window
            carry = getattr(f, "_cap_carry", None)
            prev = None
            if carry is not None and carry[0] == tid and carry[1] == wb:
                prev = carry[2]
            keepm, nxt = _depth_cap_stream(sub, conf["max_depth"], wb, we,
                                           prev)
            f._cap_carry = (tid, we, nxt)
            if not keepm.all():
                sub = sub.take(np.nonzero(keepm)[0])
    if engine is not None and ref is not None and conf["realn"]:
        engine.run_window(sub, tid, ref, ref_len, wb, we)
    if conf["smart_overlaps"]:
        from ..ops import overlaps
        overlaps.tweak_overlaps(sub)
    return sub, ref, ref_len


class _DeviceBaqEngine:
    """The mpileup tool's TPU engine (VERDICT r4 #1): each window's
    BAQ + base census runs as the fused device pipeline
    (ops/mpileup_device.DeviceCensusPipeline.apply_window), quals come
    back for the host text writer, the census stays device-resident
    and is consumed per window via its two-lane checksum for
    --census-out (the tool's order-independent validation artifact,
    the parity gate bench.py asserts against the single-core C loop).
    Windows the device cannot take (no ref, tiny/ineligible data, link
    too slow) fall back to the host HMM in place, with the same census
    recorded host-side, so output and census stay byte-identical
    either way.  Replaces /root/reference/bam_plcmd.c:451+607's
    per-read, per-column host loops."""

    def __init__(self, conf, nthreads: int = 2):
        self.conf = conf
        self.min_baseq = conf["min_baseQ"]
        self.baq_flag = 7 if conf["redo_baq"] else 3
        self.threads = max(nthreads, 2)
        self.want_census = bool(conf.get("census_out"))
        self.records: list = []
        self.n_reads = 0
        self.n_host = 0
        self.n_device_windows = 0
        self._force_host = False

    def _device_ok(self, sub) -> bool:
        import os
        from ..engine import use_device
        env = os.environ.get("SAMTPU_DEVICE", "auto")
        if env in ("0", "host"):
            return False
        total = int(sub.seq_off[-1]) if sub.n else 0
        if not use_device(total):
            return False
        if env in ("1", "device", "force"):
            return True
        if self._force_host:
            return False
        # executable stand-up cost: on transports where per-process
        # XLA load/compile costs tens of seconds (and the persistent
        # cache cannot serialize), a short-lived CLI must stay on the
        # host HMM.  The cost is measured once per box (bench warmup,
        # or a tool window that blew its budget) and disk-cached.
        from ..engine import compile_cost_cached
        cost = compile_cost_cached()
        if cost is not None and cost > float(os.environ.get(
                "SAMTPU_MAX_COMPILE_S", "15")):
            return False
        from ..ops.baq import _d2h_rate_cached, _d2h_rate
        # the engine's drain is d2h-minimal (sparse qual deltas +
        # risky masks, ~1% of the qual matrix), so even a badly
        # degraded link carries it; SAMTPU_MPILEUP_MIN_MBPS overrides
        min_rate = float(os.environ.get(
            "SAMTPU_MPILEUP_MIN_MBPS",
            os.environ.get("SAMTPU_D2H_MIN_MBPS", "0.5"))) * 1e6
        cached = _d2h_rate_cached()
        rate = cached if cached is not None else _d2h_rate()
        return rate >= min_rate

    def run_window(self, sub, tid, ref, ref_len, wb, we):
        """BAQ one prepared window in place (device when possible),
        accumulating its census record."""
        from ..ops import baq as baqmod
        if sub.n == 0:
            return
        if wb is None:
            wb, we = 0, ref_len
        # census window clamps to the contig (reads cannot align past
        # it; an unclamped window would skew the checksum weighting)
        we = min(we, max(ref_len, wb + 1))
        wb = min(wb, we)
        pipe = None
        raw = sub.aux.tobytes()
        has_tags = b"BQZ" in raw or b"ZQZ" in raw
        if not has_tags and ref_len <= (64 << 20) \
                and self._device_ok(sub):
            lens = sub.seq_off[1:] - sub.seq_off[:-1]
            lq = int(np.bincount(
                np.minimum(lens, 1 << 14).astype(np.int64)).argmax())
            if lq >= 8:
                from ..ops.mpileup_device import DeviceCensusPipeline
                ref_int = baqmod._ref_ints(ref)
                try:
                    pipe = DeviceCensusPipeline(
                        ref_int, wlen=we - wb, base=wb,
                        min_baseq=self.min_baseq,
                        baq_flag=self.baq_flag, l_query=lq,
                        ref_dev=baqmod._ref_dev_cached(ref_int))
                except Exception:
                    pipe = None
        if pipe is not None:
            import time as _time
            from ..core import metrics
            t0 = _time.perf_counter()
            with metrics.stage("mpileup.device_window", sub.n, "reads"):
                nh = pipe.apply_window(sub, wb, we,
                                       threads=self.threads)
            dt = _time.perf_counter() - t0
            if self.n_device_windows == 0:
                # first device window carries the executable stand-up
                # cost; if it blew the budget this box's transport is
                # compile-bound — finish this run on the host HMM and
                # record the verdict for future processes
                budget = float(os.environ.get(
                    "SAMTPU_DEVICE_BUDGET_S", "20"))
                env = os.environ.get("SAMTPU_DEVICE", "auto")
                if dt > budget and env not in ("1", "device", "force"):
                    from ..engine import record_compile_cost
                    record_compile_cost(dt)
                    self._force_host = True
            self.n_reads += sub.n
            self.n_host += nh
            self.n_device_windows += 1
            if self.want_census:
                s1, s2 = pipe.finish_checksum()
                self.records.append(
                    {"tid": int(tid), "beg": int(wb), "end": int(we),
                     "reads": int(sub.n), "host_reads": int(nh),
                     "engine": "device", "checksum": [s1, s2]})
            return
        # host window: plain BAQ, census (when asked) from final quals
        baqmod.apply_baq_batch(sub, ref, ref_len,
                               redo=self.conf["redo_baq"])
        self.n_reads += sub.n
        self.n_host += sub.n
        if self.want_census:
            self.records.append(
                {"tid": int(tid), "beg": int(wb), "end": int(we),
                 "reads": int(sub.n), "host_reads": int(sub.n),
                 "engine": "host",
                 "checksum": list(self._host_window_checksum(
                     sub, wb, we))})

    def _host_window_checksum(self, sub, wb, we):
        from ..ops.mpileup_device import (NT16_TO4, _host_census,
                                          census_checksum)
        census = np.zeros((we - wb, 5), np.int64)
        qsum = np.zeros(we - wb, np.int64)
        _host_census(census, qsum, sub.pos.astype(np.int64), sub.cigar,
                     sub.cigar_off, NT16_TO4[sub.seq], sub.qual,
                     sub.seq_off, None, self.min_baseq, 0, base=wb,
                     gate_lo=0, gate_hi=we - wb, newq=sub.qual)
        return census_checksum(census, qsum)

    def write_census(self, path: str, header) -> None:
        rec = {"min_baseq": self.min_baseq,
               "contigs": [str(n) for n in header.ref_names],
               "reads": int(self.n_reads),
               "host_reads": int(self.n_host),
               "device_windows": int(self.n_device_windows),
               "windows": self.records}
        with open(path, "w") as fh:
            json.dump(rec, fh)
            fh.write("\n")


def _depth_cap_stream(sub, maxcnt: int, wb: int, we: int, prev_keep):
    """Windowed variant of _depth_cap_select.

    ``sub`` is one window's overlap set (coordinate-sorted; carried halo
    reads with pos < wb first, then this window's reads).  Carried reads
    reuse the decision made at their first window (``prev_keep``, one
    bool per carried read in order); only reads with pos >= wb are
    decided here, against the active-end heap seeded from the KEPT
    carried reads.  Returns (keep_mask, next_prev_keep) where the second
    is the decision array for reads that will be carried into the next
    window (end > we), in order."""
    import heapq
    n = sub.n
    ends = sub.end_pos()
    pos = sub.pos
    keep = np.ones(n, bool)
    nc = int(np.searchsorted(pos, wb))
    if prev_keep is None or len(prev_keep) != nc:
        # first window on this tid (nc == 0) or resume without state:
        # decide carried reads by re-simulation (pre-window context lost)
        nc = 0
    else:
        keep[:nc] = prev_keep
    # vectorized fast path: the max read-span overlap bounds the active
    # count from above, so if it never reaches maxcnt nothing drops
    if n and _max_span_overlap(pos, ends) < maxcnt:
        return keep, keep[ends > we].copy()
    active: list = []
    for i in range(nc):
        if keep[i]:
            heapq.heappush(active, int(ends[i]))
    for i in range(nc, n):
        p = int(pos[i])
        while active and active[0] <= p:
            heapq.heappop(active)
        if len(active) >= maxcnt:
            keep[i] = False
            continue
        heapq.heappush(active, int(ends[i]))
    return keep, keep[ends > we].copy()


def _max_span_overlap(pos: np.ndarray, ends: np.ndarray) -> int:
    """Max number of read spans covering any single start position —
    an upper bound on the depth-cap active count (pos must be sorted)."""
    n = len(pos)
    if n == 0:
        return 0
    se = np.sort(ends)
    cnt = np.arange(1, n + 1) - np.searchsorted(se, pos, side="right")
    return int(cnt.max())


def _depth_cap_select(sub, maxcnt: int) -> np.ndarray:
    """Per-file depth cap (bam_mplp_set_maxcnt semantics,
    /root/reference/bam_plcmd.c:597): a read is dropped at insertion when
    the buffer already holds maxcnt reads overlapping its start."""
    import heapq
    ends = sub.end_pos()
    if _max_span_overlap(sub.pos, ends) < maxcnt:
        return np.arange(sub.n, dtype=np.int64)
    keep = []
    active: list[int] = []
    for i in range(sub.n):
        p = int(sub.pos[i])
        while active and active[0] <= p:
            heapq.heappop(active)
        if len(active) >= maxcnt:
            continue
        keep.append(i)
        heapq.heappush(active, int(ends[i]))
    return np.array(keep, np.int64)


def _append_file_column(row, s: FileState, pos: int, conf, header):
    ci = s.pos2col.get(pos)
    if ci is None:
        row.append("\t0\t*\t*")
        fv = COL_MAPQ_CHAR
        while fv < COL_LAST:
            if fv != COL_MODS and (conf["flag_cols"] & fv):
                row.append("\t*")
            fv <<= 1
        for _ in conf["auxtags"]:
            row.append("\t*")
        return
    lo, hi = s.p.col_off[ci], s.p.col_off[ci + 1]
    idx = np.arange(lo, hi)
    passing = idx[s.pass_q[lo:hi]]
    cnt = passing.size
    row.append("\t")
    row.append(str(cnt))
    row.append("\t")
    if cnt:
        row.append("".join(s.entry_bytes(i) for i in passing))
        row.append("\t")
        row.append(bytes(s.qual_chars[passing]).decode("latin-1"))
    else:
        row.append("*\t*")
    # extra columns
    fv = COL_MAPQ_CHAR
    while fv < COL_LAST:
        if fv != COL_MODS and (conf["flag_cols"] & fv):
            row.append("\t")
            vals = []
            for i in passing:
                rid = int(s.p.rid[i])
                if fv == COL_MAPQ_CHAR:
                    vals.append(chr(min(int(s.sub.mapq[rid]) + 33, 126)))
                elif fv == COL_QPOS:
                    vals.append(str(int(s.p.qpos[i]) + 1))
                elif fv == COL_QPOS5:
                    if s.sub.flag[rid] & F.FREVERSE:
                        vals.append(str(int(s.sub.l_qseq[rid])
                                        - int(s.p.qpos[i])
                                        + int(s.p.is_del[i])))
                    else:
                        vals.append(str(int(s.p.qpos[i]) + 1))
                elif fv == COL_QNAME:
                    vals.append(s.sub.qname_str(rid))
                elif fv == COL_FLAG:
                    vals.append(str(int(s.sub.flag[rid])))
                elif fv == COL_RNAME:
                    t = int(s.sub.tid[rid])
                    vals.append(header.ref_name(t) if t >= 0 else "*")
                elif fv == COL_POS:
                    vals.append(str(int(s.sub.pos[rid]) + 1))
                elif fv == COL_MAPQ:
                    vals.append(str(int(s.sub.mapq[rid])))
                elif fv == COL_RNEXT:
                    t = int(s.sub.mtid[rid])
                    vals.append(header.ref_name(t) if t >= 0 else "*")
                elif fv == COL_PNEXT:
                    vals.append(str(int(s.sub.mpos[rid]) + 1))
                elif fv == COL_RLEN:
                    vals.append(str(int(s.sub.l_qseq[rid])))
            if not vals:
                row.append("*")
            elif fv == COL_MAPQ_CHAR:
                row.append("".join(vals))
            else:
                row.append(",".join(vals))
        fv <<= 1
    for tag in conf["auxtags"]:
        row.append("\t")
        vals = []
        for i in passing:
            rid = int(s.p.rid[i])
            got = auxmod.get_value(s.sub.aux_of(rid), tag)
            if got is None:
                vals.append(conf["empty"])
                continue
            t, v = got
            if t in "ZH":
                vals.append(str(v))
            elif t in "IiCcSs":
                vals.append(str(v))
            elif t in "df":
                vals.append(_kputd(v))
            elif t == "A":
                vals.append(str(v))
            else:
                vals.append("*")
        row.append(conf["sep"].join(vals) if vals else "*")
