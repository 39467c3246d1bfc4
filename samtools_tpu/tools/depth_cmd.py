"""samtools depth — per-position depth.

Byte-parity target: /root/reference/bam2depth.c (the rewritten direct
CIGAR-histogram version): default filter-out flags UNMAP,SECONDARY,QCFAIL,
DUP (-g/-G adjust), -q base quality, -Q map quality, -l min qlen_used, -J
deletion counting, -s template-overlap clipping, -a/-aa fill, -r region,
-b BED, -H header, -f file list, multi-file columns.
"""

from __future__ import annotations

import sys

import numpy as np

from .. import engine
from ..core import flags as F
from ..core.regions import RegionError, parse_region
from ..io import bed as bedmod
from ..io.files import read_alignments
from ..ops import depth as dops
from .common import (GlobalArgs, UsageError, gnu_getopt, handle_global_opt,
                     print_error, print_error_errno, try_region_read)
from .flags_cmd import str2flag

DEFAULT_EXCL = F.FUNMAP | F.FSECONDARY | F.FQCFAIL | F.FDUP


def usage(fp):
    fp.write(
        "Usage: samtools depth [options] in.bam [in.bam ...]\n"
        "\nOptions:\n"
        "  -a           Output all positions (including zero depth)\n"
        "  -a -a, -aa   Output absolutely all positions, including unused ref seqs\n"
        "  -r REG       Specify a region in chr or chr:from-to syntax\n"
        "  -b FILE      Use bed FILE for list of regions\n"
        "  -f FILE      Specify list of input BAM/SAM/CRAM filenames\n"
        "  -X           Use custom index files (in -X *.bam *.bam.bai order)\n"
        "  -g INT       Remove specified flags from default filter-out flag list\n"
        "  -G, --excl-flags FLAGS\n"
        "               Add specified flags to the  default filter-out flag list\n"
        "               [UNMAP,SECONDARY,QCFAIL,DUP]\n"
        "      --incl-flags FLAGS\n"
        "               Only include records with at least one the FLAGs present [0]\n"
        "      --require-flags FLAGS\n"
        "               Only include records with all of the FLAGs present [0]\n"
        "  -H           Print a file header line\n"
        "  -l INT       Minimum read length [0]\n"
        "  -o FILE      Write output to FILE [stdout]\n"
        "  -q, --min-BQ INT\n"
        "               Filter bases with base quality smaller than INT [0]\n"
        "  -Q, --min-MQ INT\n"
        "               Filter alignments with mapping quality smaller than INT [0]\n"
        "  -J           Include reads with deletions in depth computation\n"
        "  -s           Do not count overlapping reads within a template\n")


def qlen_used(batch) -> np.ndarray:
    """bam2depth.c qlen_used: aligned query length (l_qseq minus edge soft
    clips; CIGAR sum for seq-less records)."""
    n = batch.n
    out = np.zeros(n, np.int64)
    lq = batch.l_qseq
    ops = (batch.cigar & 0xF).astype(np.int64)
    lens = (batch.cigar >> 4).astype(np.int64)
    # CIGAR-based qlen (M,I,=,X)
    is_q = np.isin(ops, (F.CMATCH, F.CINS, F.CEQUAL, F.CDIFF))
    contrib = np.where(is_q, lens, 0)
    csum = np.concatenate([[0], np.cumsum(contrib)])
    cig_q = csum[batch.cigar_off[1:]] - csum[batch.cigar_off[:-1]]
    # edge soft clips
    sc = np.where(ops == F.CSOFT_CLIP, lens, 0)
    edge = np.zeros(n, np.int64)
    for i in range(n):  # small per-record scan over edge ops only
        s, e = batch.cigar_off[i], batch.cigar_off[i + 1]
        k = s
        while k < e and ops[k] == F.CSOFT_CLIP:
            edge[i] += lens[k]
            k += 1
        kl = k
        k = e - 1
        while k > kl and ops[k] == F.CSOFT_CLIP:
            edge[i] += lens[k]
            k -= 1
    return np.where(lq > 0, lq - edge, cig_q)


def _emit(out, name: str, pos1: np.ndarray, cols: list[np.ndarray]):
    """Write rows name\\tpos\\td1[\\td2...] for the given 1-based
    positions."""
    if pos1.size == 0:
        return
    parts = [np.char.mod("%d", pos1)]
    for c in cols:
        parts.append(np.char.mod("%d", c))
    body = parts[0]
    for p in parts[1:]:
        body = np.char.add(np.char.add(body, "\t"), p)
    prefix = name + "\t"
    out.write(prefix + ("\n" + prefix).join(body.tolist()) + "\n")


def _n_shards() -> int:
    """Region shards for sharded execution: SAMTPU_SHARDS=N (or 'all'
    for every attached device); default 1 (single-device kernels)."""
    import os
    v = os.environ.get("SAMTPU_SHARDS", "1")
    if v == "all":
        import jax
        return len(jax.devices())
    try:
        n = int(v)
    except ValueError:
        return 1
    if n > 1:
        import jax
        n = min(n, len(jax.devices()))
    return max(n, 1)


def main_depth(argv: list[str]) -> int:
    ga = GlobalArgs()
    excl = DEFAULT_EXCL
    incl_flag = 0
    require_flag = 0
    min_qual = 0
    min_mqual = 0
    min_len = 0
    count_del = False
    all_pos = 0
    remove_overlaps = False
    header_line = False
    reg = None
    bedidx = None
    out_file = None
    file_list = None
    has_index_file = False
    try:
        opts, args = gnu_getopt(argv, "@:q:Q:JHd:m:l:g:G:o:ar:Xf:b:s",
                                ["min-MQ=", "min-mq=", "min-BQ=", "min-bq=",
                                 "excl-flags=", "incl-flags=",
                                 "require-flags="])
    except UsageError:
        usage(sys.stderr)
        return 1
    for o, v in opts:
        if o == "-a":
            all_pos += 1
        elif o == "-b":
            try:
                bedidx = bedmod.read_bed(v)
            except OSError as e:
                print_error_errno("depth", 'Could not read file "%s"', v,
                                  exc=e)
                return 1
        elif o == "-f":
            file_list = v
        elif o in ("-d", "-m"):
            pass  # depth limit, ignored (as in the reference)
        elif o == "-g":
            fl = str2flag(v)
            if fl < 0:
                print_error("depth", "Unknown flag '%s'", v)
                return 1
            excl &= ~fl
        elif o in ("-G", "--excl-flags"):
            fl = str2flag(v)
            if fl < 0:
                print_error("depth", "Unknown flag '%s'", v)
                return 1
            excl |= fl
        elif o == "--incl-flags":
            incl_flag |= str2flag(v)
        elif o == "--require-flags":
            require_flag |= str2flag(v)
        elif o == "-l":
            min_len = int(v)
        elif o == "-H":
            header_line = True
        elif o in ("-q", "--min-BQ", "--min-bq"):
            min_qual = int(v)
        elif o in ("-Q", "--min-MQ", "--min-mq"):
            min_mqual = int(v)
        elif o == "-J":
            count_del = True
        elif o == "-o":
            out_file = v
        elif o == "-r":
            reg = v
        elif o == "-s":
            remove_overlaps = True
        elif o == "-X":
            has_index_file = True
        elif not handle_global_opt(ga, o, v):
            usage(sys.stderr)
            return 1

    if file_list:
        with open(file_list) as f:
            args = [l.strip() for l in f if l.strip()]
    if has_index_file:
        args = args[: len(args) // 2]  # drop index arguments
    if not args:
        usage(sys.stdout)
        return 0

    out = open(out_file, "w") if out_file else sys.stdout
    files = []
    region = None
    for path in args:
        try:
            loaded = None
            if reg:
                # index-driven region read: O(region) bytes off disk
                got = try_region_read(path, ga.nthreads, reg)
                if got is not None:
                    loaded, region = got
            if loaded is None:
                loaded = read_alignments(path, threads=ga.nthreads)
            files.append(loaded)
        except RegionError:
            print_error("depth", 'could not parse region "%s"', reg)
            return 1
        except OSError as e:
            print_error_errno("depth", 'Could not open "%s"', path, exc=e)
            return 1
    header = files[0].header

    if reg and region is None:
        try:
            region = parse_region(reg, header.tid)
        except RegionError:
            print_error("depth", 'could not parse region "%s"', reg)
            return 1

    if header_line:
        out.write("#CHROM\tPOS")
        for path in args:
            out.write("\t" + path)
        out.write("\n")

    # per-file: filter, sortedness check, overlap clips
    selected = []
    clips = []
    ends = []
    for f in files:
        b = f.batch
        fl = b.flag.astype(np.int64)
        keep = (b.tid >= 0)
        keep &= (fl & excl) == 0
        if incl_flag:
            keep &= (fl & incl_flag) != 0
        keep &= (fl & require_flag) == require_flag
        keep &= b.mapq.astype(np.int64) >= min_mqual
        if min_len:
            keep &= qlen_used(b) >= min_len
        sel = np.nonzero(keep)[0]
        # position-sorted check (bam2depth.c:330-335)
        t = b.tid[sel]
        if t.size and (np.diff(t) < 0).any():
            print_error_errno("depth", "Data is not position sorted")
            return 1
        end = b.end_pos()
        selected.append(sel)
        ends.append(end)
        if remove_overlaps:
            clips.append(dops.overlap_clips(b, sel))
        else:
            clips.append(None)

    n_refs = header.n_refs
    used = np.zeros(n_refs, bool)
    for f, sel in zip(files, selected):
        tids = np.unique(f.batch.tid[sel])
        used[tids[tids >= 0]] = True

    if region is not None:
        ref_iter = [region.tid]
    else:
        ref_iter = range(n_refs)

    for t in ref_iter:
        ref_len = header.ref_lens[t]
        name = header.ref_names[t]
        rbeg = region.beg if region else 0
        rend = min(region.end, ref_len) if region else ref_len
        if not used[t]:
            if (all_pos > 1 and region is None) or (all_pos and region):
                if bedidx is not None:
                    posz = np.arange(rbeg, rend, dtype=np.int64)
                    m = bedidx.overlap(name, posz, posz + 1)
                    posz = posz[m]
                else:
                    posz = np.arange(rbeg, rend, dtype=np.int64)
                _emit(out, name, posz + 1,
                      [np.zeros(posz.size, np.int64)] * len(files))
            continue

        # window over present reads
        wbeg_list, wend_list = [], []
        subsels = []
        for f, sel, end in zip(files, selected, ends):
            s = sel[f.batch.tid[sel] == t]
            if region is not None and s.size:
                ov = (f.batch.pos[s] < region.end) & (end[s] > region.beg)
                s = s[ov]
            subsels.append(s)
            if s.size:
                wbeg_list.append(int(f.batch.pos[s].min()))
                wend_list.append(int(end[s].max()))
        if not wbeg_list:
            if all_pos:
                posz = np.arange(rbeg, rend, dtype=np.int64)
                if bedidx is not None:
                    m = bedidx.overlap(name, posz, posz + 1)
                    posz = posz[m]
                _emit(out, name, posz + 1,
                      [np.zeros(posz.size, np.int64)] * len(files))
            continue
        wbeg = min(wbeg_list)
        wend = max(wend_list)
        if region is not None:
            wbeg = max(wbeg, region.beg)
            wend = min(wend, region.end)
        if wend <= wbeg:
            continue

        cols = []
        env_pos = []
        env_end = []
        for f, s, cl, end in zip(files, subsels, clips, ends):
            # device dispatch: aligned bases is the work-size proxy
            if engine.use_device(int(f.batch.l_qseq[s].sum())):
                n_shards = _n_shards()
                if n_shards > 1:
                    # region-sharded execution over the device mesh
                    # (the CLI face of parallel/mesh.py's span-block
                    # generalization of bam_consensus.c:2626)
                    from ..parallel.mesh import (depth_window_sharded,
                                                 make_mesh)
                    mesh = make_mesh(n_data=1, n_region=n_shards)

                    def depth_fn(b, s2, wb, we, mq, cd, cl2,
                                 _m=mesh):
                        return depth_window_sharded(_m, b, s2, wb, we,
                                                    mq, cd, cl2)
                else:
                    from ..ops.pileup_engine import depth_window_device
                    depth_fn = depth_window_device
            else:
                depth_fn = dops.depth_window
            cols.append(depth_fn(f.batch, s, wbeg, wend,
                                 min_qual, count_del, cl))
            if s.size:
                env_pos.append(f.batch.pos[s])
                env_end.append(end[s])
        env = dops.coverage_envelope(
            np.concatenate(env_pos) if env_pos else np.empty(0, np.int64),
            np.concatenate(env_end) if env_end else np.empty(0, np.int64),
            wbeg, wend)

        if all_pos:
            pos0 = np.arange(rbeg, rend, dtype=np.int64)
            depth_cols = []
            for c in cols:
                full = np.zeros(rend - rbeg, np.int64)
                lo = max(wbeg, rbeg) - rbeg
                hi = min(wend, rend) - rbeg
                if hi > lo:
                    full[lo:hi] = c[max(wbeg, rbeg) - wbeg:
                                    max(wbeg, rbeg) - wbeg + (hi - lo)]
                depth_cols.append(full)
        else:
            sel_pos = np.nonzero(env)[0]
            pos0 = sel_pos + wbeg
            depth_cols = [c[sel_pos].astype(np.int64) for c in cols]

        if bedidx is not None:
            m = bedidx.overlap(name, pos0, pos0 + 1)
            pos0 = pos0[m]
            depth_cols = [c[m] for c in depth_cols]
        _emit(out, name, pos0 + 1, depth_cols)

    if out is not sys.stdout:
        out.close()
    return 0
