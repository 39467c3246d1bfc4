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


def _build_states_streaming(states, streams, needed, header, flags,
                            min_mapq, min_depth, do_rcount) -> None:
    """One streaming pass per file: accumulate whole-contig interval
    diff arrays (footprint + M-span) for every BED contig, then the
    prefix sums the per-region gathers consume."""
    from ..ops.cigar import expand_ops
    nf = len(streams)
    acc: dict = {}   # (fi, tid) -> [d_incl, d_real, pos_list, end_list]

    for fi, st in enumerate(streams):
        for b in st.batches(fields=2):
            fl = b.flag.astype(np.int64)
            keep = ((fl & flags) == 0) \
                & (b.mapq.astype(np.int64) >= min_mapq)
            for t in np.unique(b.tid[(b.tid >= 0) & keep]):
                t = int(t)
                if t not in needed:
                    continue
                L = int(header.ref_lens[t])
                a = acc.get((fi, t))
                if a is None:
                    a = [np.zeros(L + 1, np.int64),
                         np.zeros(L + 1, np.int64), [], []]
                    acc[(fi, t)] = a
                sel = np.nonzero(keep & (b.tid == t))[0]
                sub = b.take(sel, ragged=("cigar",))
                e = sub.end_pos()
                np.add.at(a[0], np.clip(sub.pos, 0, L), 1)
                np.add.at(a[0], np.clip(e, 0, L), -1)
                tt = expand_ops(sub)
                m = np.isin(tt.op, (F.CMATCH, F.CEQUAL, F.CDIFF))
                rs = np.clip(tt.rpos[m], 0, L)
                re = np.clip(tt.rpos[m] + tt.oplen[m], 0, L)
                np.add.at(a[1], rs, 1)
                np.add.at(a[1], re, -1)
                if do_rcount:
                    a[2].append(sub.pos.copy())
                    a[3].append(e.copy())

    for t in needed:
        L = int(header.ref_lens[t])
        if not any((fi, t) in acc for fi in range(nf)):
            states[t] = None
            continue
        per_incl = []
        vis = np.zeros(L, bool)
        for fi in range(nf):
            a = acc.get((fi, t))
            d_incl = (np.cumsum(a[0])[:L] if a is not None
                      else np.zeros(L, np.int64))
            d_real = (np.cumsum(a[1])[:L] if a is not None
                      else np.zeros(L, np.int64))
            vis |= d_incl > 0
            per_incl.append((d_incl, d_real, a))
        state = []
        for fi, (d_incl, d_real, a) in enumerate(per_incl):
            S2i = np.concatenate([[0], np.cumsum(d_incl)])
            S2r = np.concatenate([[0], np.cumsum(d_real)])
            if min_depth >= 0:
                ind = vis & (d_real >= min_depth)
                Sind = np.concatenate([[0], np.cumsum(ind)])
            else:
                Sind = None
            if do_rcount and a is not None and a[2]:
                rp = np.concatenate(a[2])
                rend = np.concatenate(a[3])
                order = np.argsort(rp, kind="stable")
                rp, rend = rp[order], rend[order]
            else:
                rp = np.empty(0, np.int64)
                rend = np.empty(0, np.int64)
            state.append((S2i, S2r, Sind, rp, rend))
        states[t] = (0, L, state)


def _mspan_depth(b, sel: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """int64[hi-lo] qual-ungated M/=/X depth via diff events (the numpy
    twin of ops.pileup_engine.depth_window_device with min_qual=0)."""
    L = hi - lo
    d = np.zeros(L + 1, np.int64)
    if sel.size == 0:
        return d[:L]
    from ..ops.cigar import expand_ops
    sub = b.take(np.asarray(sel, np.int64), ragged=("cigar",))
    t = expand_ops(sub)
    m = np.isin(t.op, (F.CMATCH, F.CEQUAL, F.CDIFF))
    rs = np.clip(t.rpos[m] - lo, 0, L)
    re = np.clip(t.rpos[m] + t.oplen[m] - lo, 0, L)
    np.add.at(d, rs, 1)
    np.add.at(d, re, -1)
    return np.cumsum(d)[:L]
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
    streams = []
    for path in bam_paths:
        try:
            loaded = None
            if path != "-":
                try:
                    from ..io.stream import BamStream
                    import types
                    st = BamStream(path, threads=ga.nthreads or 2)
                    loaded = types.SimpleNamespace(header=st.header,
                                                   stream=st)
                    streams.append(st)
                except OSError:
                    raise
                except Exception:
                    loaded = None
            if loaded is None:
                loaded = read_alignments(path, threads=ga.nthreads)
            files.append(loaded)
        except OSError as e:
            sys.stderr.write(
                f"ERROR: fail to open index BAM file '{path}'\n")
            return 2
    use_stream = len(streams) == len(files)
    if not use_stream:
        for i, f in enumerate(files):
            if getattr(f, "stream", None) is not None:
                files[i] = read_alignments(bam_paths[i],
                                           threads=ga.nthreads)
    header = files[0].header

    # Per-contig depth state, all files at once.  The pileup-entry count
    # per position decomposes into two interval-depth columns (a read's
    # M/D/N footprint is the contiguous [pos, end) span; its "real"
    # entries are the M/=/X op spans), so the per-region sums are prefix
    # gathers — no pileup table at all.  The M-span column is the depth
    # kernel: device (ops.pileup_engine.depth_window_device) when the
    # workload clears the use_device gate, numpy diff+cumsum otherwise.
    states: dict = {}

    def get_state(tid: int):
        if tid in states:
            return states[tid]
        from ..engine import use_device
        per_file = []
        lo, hi = None, None
        sels = []
        for fi in range(len(files)):
            b = files[fi].batch
            fl = b.flag.astype(np.int64)
            sel = np.nonzero((b.tid == tid) & ((fl & flags) == 0)
                             & (b.mapq.astype(np.int64) >= min_mapq))[0]
            sels.append(sel)
            if sel.size:
                e = b.end_pos()
                l0 = int(b.pos[sel].min())
                h0 = int(e[sel].max())
                lo = l0 if lo is None else min(lo, l0)
                hi = h0 if hi is None else max(hi, h0)
        if lo is None:
            states[tid] = None
            return None
        L = hi - lo
        n_bases = sum(int((files[fi].batch.seq_off[s + 1]
                           - files[fi].batch.seq_off[s]).sum())
                      for fi, s in enumerate(sels))
        dev = use_device(n_bases) and L < (1 << 31)
        vis = np.zeros(L + 1, bool)
        for fi, sel in enumerate(sels):
            b = files[fi].batch
            if dev and sel.size:
                from ..ops.pileup_engine import depth_window_device
                d_real = depth_window_device(b, sel, lo, hi, 0,
                                             False).astype(np.int64)
            else:
                d_real = _mspan_depth(b, sel, lo, hi)
            # full-footprint (M/D/N) interval depth: 2 events per read
            d_incl = np.zeros(L + 1, np.int64)
            if sel.size:
                e = b.end_pos()
                np.add.at(d_incl, b.pos[sel] - lo, 1)
                np.add.at(d_incl, e[sel] - lo, -1)
            d_incl = np.cumsum(d_incl)[:L]
            vis[:L] |= d_incl > 0
            per_file.append((d_incl, d_real))
        state = []
        for fi, (d_incl, d_real) in enumerate(per_file):
            S2i = np.concatenate([[0], np.cumsum(d_incl)])
            S2r = np.concatenate([[0], np.cumsum(d_real)])
            if min_depth >= 0:
                ind = vis[:L] & (d_real >= min_depth)
                Sind = np.concatenate([[0], np.cumsum(ind)])
            else:
                Sind = None
            b = files[fi].batch
            sel = sels[fi]
            rpos = b.pos[sel]
            rend = b.end_pos()[sel]
            order = np.argsort(rpos, kind="stable")
            state.append((S2i, S2r, Sind, rpos[order], rend[order]))
        states[tid] = (lo, hi, state)
        return states[tid]

    status = 0
    hdr_done = not print_header
    out = sys.stdout
    try:
        bed_data = open(bed_path, "rt").read()
    except OSError as e:
        print_error_errno("bedcov", "can't open BED file '%s'", bed_path,
                          exc=e)
        return 2

    if use_stream:
        # one bounded-memory pass over each stream accumulates the
        # per-contig interval-depth diff arrays for every BED contig
        # (O(contig) ints instead of O(file) records)
        needed = set()
        for line in bed_data.split("\n"):
            p = line.split()
            if len(p) >= 3 and not line.startswith(("#", "track ",
                                                    "browser ")):
                t = header.tid(p[0])
                if t >= 0:
                    needed.add(t)
        _build_states_streaming(states, streams, needed, header, flags,
                                min_mapq, min_depth, do_rcount)
        for st in streams:
            st.close()

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
        st = get_state(tid)
        for fi in range(len(files)):
            if st is None:
                cols.append(0)
                if min_depth >= 0:
                    depth_cols.append(0)
                if do_rcount:
                    count_cols.append(0)
                continue
            lo, hi, per_file = st
            S2i, S2r, Sind, rpos, rend = per_file[fi]
            a = min(max(beg - lo, 0), hi - lo)
            z = min(max(end - lo, 0), hi - lo)
            S = S2r if skip_dn else S2i
            cols.append(int(S[z] - S[a]))
            if min_depth >= 0:
                depth_cols.append(int(Sind[z] - Sind[a]))
            if do_rcount:
                # reads overlapping [beg, end): pos < end minus those
                # ending at/before beg (rend unsorted -> count directly
                # on the pos-sorted prefix)
                k = int(np.searchsorted(rpos, end, side="left"))
                count_cols.append(int((rend[:k] > beg).sum()))
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
