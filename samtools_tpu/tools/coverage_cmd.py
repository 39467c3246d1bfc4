"""samtools coverage — per-contig depth/quality summary table + terminal
histograms.

Byte-parity target: /root/reference/coverage.c (tabular columns with %g
formatting; UTF-8 block-character histogram for -m).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..core import flags as F
from ..core.regions import RegionError, parse_region
from ..io.files import read_alignments
from ..ops.pileup import build_pileup
from .common import (GlobalArgs, UsageError, gnu_getopt, handle_global_opt,
                     print_error, print_error_errno)
from .flags_cmd import str2flag

DEFAULT_FF = F.FUNMAP | F.FSECONDARY | F.FQCFAIL | F.FDUP

BLOCK8 = ["▁", "▂", "▃", "▄", "▅", "▆",
          "▇", "█"]
BLOCK2 = [".", ":"]


def usage(fp):
    fp.write(
        "Usage: samtools coverage [options] in1.bam [in2.bam [...]]\n\n"
        "Input options:\n"
        "  -b, --bam-list FILE     list of input BAM filenames, one per line\n"
        "  -l, --min-read-len INT  ignore reads shorter than INT bp [0]\n"
        "  -q, --min-MQ INT        mapping quality threshold [0]\n"
        "  -Q, --min-BQ INT        base quality threshold [0]\n"
        "  --rf <int|str>          required flags: skip reads with mask bits unset []\n"
        "  --ff <int|str>          filter flags: skip reads with mask bits set\n"
        "                                      [UNMAP,SECONDARY,QCFAIL,DUP]\n"
        "  -d, --depth INT         maximum allowed coverage depth [1000000]\n"
        "  --min-depth INT         minimum coverage depth below which a position is ignored [1]\n"
        "  -r, --region REG        show specified region.\n"
        "\nOutput options:\n"
        "  -m, --histogram         show histogram instead of tabular output\n"
        "  -A, --ascii             show only ASCII characters in histogram\n"
        "  -D, --plot-depth        plot depth instead of tabular output\n"
        "  -o, --output FILE       write output to FILE [stdout]\n"
        "  -H, --no-header         don't print a header in tabular mode\n"
        "  -w, --n-bins INT        number of bins in histogram [terminal width - 40]\n"
        "  -h, --help              help (this page)\n")


def readable_bps(n: float) -> str:
    units = ["", "K", "M", "G", "T"]
    i = 0
    while n >= 1000 and i < 4:
        n /= 1000
        i += 1
    return "%.*f%s" % (i, n, units[i])


def qlen_query(batch) -> np.ndarray:
    """bam_cigar2qlen: query-consuming ops."""
    ops = (batch.cigar & 0xF).astype(np.int64)
    lens = (batch.cigar >> 4).astype(np.int64)
    cq = np.array(F.CIGAR_CONSUMES_QUERY, np.int64)
    contrib = lens * cq[ops]
    csum = np.concatenate([[0], np.cumsum(contrib)])
    return csum[batch.cigar_off[1:]] - csum[batch.cigar_off[:-1]]


def main_coverage(argv: list[str]) -> int:
    ga = GlobalArgs()
    min_len = 0
    min_mapq = 0
    min_baseq = 0
    required_flags = 0
    fail_flags = DEFAULT_FF
    max_depth = 1_000_000
    min_depth = 1
    reg = None
    file_list = None
    histogram = False
    plot_depth = False
    full_utf = True
    out_file = None
    print_header = True
    n_bins = -1
    full_width = True
    try:
        opts, args = gnu_getopt(argv, "o:l:q:Q:hHw:r:b:mAd:D",
                                ["rf=", "ff=", "incl-flags=", "excl-flags=",
                                 "bam-list=", "min-read-len=", "min-MQ=",
                                 "min-mq=", "min-BQ=", "min-bq=",
                                 "histogram", "ascii", "plot-depth",
                                 "output=", "no-header", "n-bins=",
                                 "region=", "help", "depth=", "min-depth="])
    except UsageError:
        usage(sys.stdout)
        return 1
    for o, v in opts:
        if o in ("--rf", "--incl-flags"):
            required_flags = str2flag(v)
        elif o in ("--ff", "--excl-flags"):
            fail_flags = str2flag(v)
        elif o == "--min-depth":
            min_depth = int(v)
        elif o in ("-o", "--output"):
            out_file = v
            full_width = False
        elif o in ("-l", "--min-read-len"):
            min_len = int(v)
        elif o in ("-q", "--min-MQ", "--min-mq"):
            min_mapq = int(v)
        elif o in ("-Q", "--min-BQ", "--min-bq"):
            min_baseq = int(v)
        elif o in ("-d", "--depth"):
            max_depth = int(v)
        elif o in ("-w", "--n-bins"):
            n_bins = int(v)
            full_width = False
        elif o in ("-r", "--region"):
            reg = v
        elif o in ("-b", "--bam-list"):
            file_list = v
        elif o in ("-m", "--histogram"):
            histogram = True
        elif o in ("-A", "--ascii"):
            full_utf = False
        elif o in ("-D", "--plot-depth"):
            histogram = True
            plot_depth = True
        elif o in ("-H", "--no-header"):
            print_header = False
        elif o in ("-h", "--help"):
            usage(sys.stdout)
            return 0
        elif handle_global_opt(ga, o, v):
            pass
        else:
            usage(sys.stdout)
            return 1
    del max_depth
    if file_list:
        try:
            args = [l.strip() for l in open(file_list) if l.strip()] + args
        except OSError as e:
            print_error_errno("coverage",
                              'Cannot open file list "%s".', file_list,
                              exc=e)
            return 1
    if not args:
        usage(sys.stdout)
        return 1
    if n_bins <= 0 or full_width:
        cols = int(os.environ.get("COLUMNS", "0") or 0)
        n_bins = cols - 40 if cols > 60 else 40

    # no-region tabular runs stream in bounded windows; -r/-m keep the
    # in-memory reader (regions already bound the data; histograms
    # need per-bin arrays)
    want_stream = reg is None and not histogram
    files = []
    streams = []
    for path in args:
        try:
            loaded = None
            if want_stream and path != "-":
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
            print_error_errno("coverage", 'Could not open "%s"', path,
                              exc=e)
            return 1
    use_stream = want_stream and len(streams) == len(files)
    if not use_stream:
        for i, f in enumerate(files):
            if getattr(f, "stream", None) is not None:
                files[i] = read_alignments(args[i], threads=ga.nthreads)
        streams = []
    header = files[0].header
    n_targets = header.n_refs

    region = None
    if reg:
        try:
            region = parse_region(reg, header.tid)
        except RegionError:
            print_error("coverage", 'Failed to parse region "%s".', reg)
            return 1

    out = open(out_file, "w") if out_file and out_file != "-" \
        else sys.stdout

    # per-tid stats
    n_reads = np.zeros(n_targets, np.int64)
    n_selected = np.zeros(n_targets, np.int64)
    summed_mapq = np.zeros(n_targets, np.int64)
    n_cov_bases = np.zeros(n_targets, np.int64)
    summed_cov = np.zeros(n_targets, np.int64)
    summed_baseq = np.zeros(n_targets, np.int64)
    quality_bases = np.zeros(n_targets, np.int64)
    covered = np.zeros(n_targets, bool)

    if use_stream:
        rc = _coverage_streamed(
            streams, header, n_targets, fail_flags, required_flags,
            min_mapq, min_len, min_baseq, min_depth, out, print_header,
            n_reads, n_selected, summed_mapq, n_cov_bases, summed_cov,
            summed_baseq, quality_bases)
        for st in streams:
            st.close()
        if out is not sys.stdout:
            out.close()
        return rc

    selected = []
    for f in files:
        b = f.batch
        fl = b.flag.astype(np.int64)
        placed = b.tid >= 0
        np.add.at(n_reads, b.tid[placed], 1)
        keep = np.ones(b.n, bool)
        if fail_flags:
            keep &= (fl & fail_flags) == 0
        if required_flags:
            keep &= (fl & required_flags) != 0
        keep &= b.mapq.astype(np.int64) >= min_mapq
        if min_len:
            keep &= qlen_query(b) >= min_len
        kp = keep & placed
        np.add.at(n_selected, b.tid[kp], 1)
        np.add.at(summed_mapq, b.tid[kp], b.mapq[kp].astype(np.int64))
        selected.append(keep)

    tids = sorted(set(
        int(t) for f, keep in zip(files, selected)
        for t in np.unique(f.batch.tid[keep & (f.batch.tid >= 0)])))
    if region is not None:
        tids = [region.tid] if region.tid in tids else []

    from ..engine import use_device

    hist_blocks = []
    for t in (tids if tids else ([] if region is None else [region.tid])):
        beg = region.beg if region else 0
        end = min(region.end, header.ref_lens[t]) if region \
            else header.ref_lens[t]
        covered[t] = True
        if not histogram:
            # device fast path: per-position census + min-depth gate +
            # subwindow reduction all on the TPU (pileup_engine
            # .coverage_window_device); only scalars come back
            parts = []
            n_bases = 0
            for f, keep in zip(files, selected):
                b = f.batch
                sel = np.nonzero(keep & (b.tid == t))[0]
                if region is not None and sel.size:
                    endp = b.end_pos()
                    sel = sel[(b.pos[sel] < end) & (endp[sel] > beg)]
                parts.append((b, sel))
                if sel.size:
                    n_bases += int((b.seq_off[sel + 1]
                                    - b.seq_off[sel]).sum())
            if use_device(n_bases):
                from ..ops.pileup_engine import coverage_window_device
                win = 16 << 20
                acc = np.zeros(3, np.int64)
                # clip the scan to the data extent: positions outside
                # [first read, last read end] contribute nothing
                dlo, dhi = end, beg
                for b, sel in parts:
                    if sel.size:
                        dlo = min(dlo, int(b.pos[sel].min()))
                        dhi = max(dhi, int(b.end_pos()[sel].max()))
                dlo = max(beg, dlo)
                dhi = min(end, dhi)
                for wb in range(dlo, dhi, win):
                    we = min(wb + win, dhi)
                    wparts = []
                    for b, sel in parts:
                        if sel.size:
                            endp = b.end_pos()
                            ws = sel[(b.pos[sel] < we)
                                     & (endp[sel] > wb)]
                        else:
                            ws = sel
                        wparts.append((b, ws))
                    acc += coverage_window_device(
                        wparts, wb, we, min_baseq, min_depth)
                n_cov_bases[t] = acc[0]
                summed_cov[t] = acc[1]
                summed_baseq[t] = acc[2]
                quality_bases[t] = acc[1]
                continue
        L = max(end - beg, 1)
        depth = np.zeros(L, np.int64)
        visited = np.zeros(L, bool)
        bq_sum = np.zeros(L, np.int64)
        bq_n = np.zeros(L, np.int64)
        for f, keep in zip(files, selected):
            b = f.batch
            sel = np.nonzero(keep & (b.tid == t))[0]
            if region is not None and sel.size:
                endp = b.end_pos()
                sel = sel[(b.pos[sel] < end) & (endp[sel] > beg)]
            sub = b.take(sel)
            p = build_pileup(sub)
            inreg = (p.pos >= beg) & (p.pos < end)
            pos_rel = (p.pos[inreg] - beg).astype(np.int64)
            visited |= np.bincount(pos_rel, minlength=L) > 0
            real = inreg & ~(p.is_del | p.is_refskip)
            qoff = sub.seq_off[p.rid[real]] + p.qpos[real]
            quals = sub.qual[qoff].astype(np.int64)
            okq = quals >= min_baseq
            pr = (p.pos[real] - beg).astype(np.int64)
            np.add.at(depth, pr[okq], 1)
            np.add.at(bq_sum, pr[okq], quals[okq])
            np.add.at(bq_n, pr[okq], 1)
        pos_ok = visited & (depth > 0) & (depth >= min_depth)
        n_cov_bases[t] = int(pos_ok.sum())
        summed_cov[t] = int(depth[pos_ok].sum())
        summed_baseq[t] = int(bq_sum[pos_ok].sum())
        quality_bases[t] = int(bq_n[pos_ok].sum())
        if histogram:
            nb = min(n_bins, L)
            bw = L // max(nb, 1)
            if bw <= 0:
                bw = 1
            hist = np.zeros(nb, np.int64)
            idx = np.minimum(np.arange(L) // bw, nb - 1)
            if plot_depth:
                np.add.at(hist, idx, depth)
            else:
                np.add.at(hist, idx, pos_ok.astype(np.int64))
            hist_blocks.append((t, beg, end, hist, bw, nb))

    if histogram:
        for bi, (t, beg, end, hist, bw, nb) in enumerate(hist_blocks):
            _print_hist(out, header, t, beg, end, hist, bw, nb, full_utf,
                        plot_depth, n_selected, n_reads, n_cov_bases,
                        summed_cov, summed_baseq, quality_bases,
                        summed_mapq)
            if bi < len(hist_blocks) - 1:
                out.write("\n")
    else:
        hdr_flag = [print_header]
        for t in tids:
            beg = region.beg if region else 0
            end = min(region.end, header.ref_lens[t]) if region \
                else header.ref_lens[t]
            _tab_line(out, header, t, beg, end, hdr_flag, n_selected,
                      n_cov_bases, summed_cov, summed_baseq,
                      quality_bases, summed_mapq)
        if region is None:
            for t in range(n_targets):
                if not covered[t]:
                    _tab_line(out, header, t, 0, header.ref_lens[t],
                              hdr_flag, n_selected, n_cov_bases,
                              summed_cov, summed_baseq, quality_bases,
                              summed_mapq)
    if out is not sys.stdout:
        out.close()
    return 0


def _coverage_streamed(streams, header, n_targets, fail_flags,
                       required_flags, min_mapq, min_len, min_baseq,
                       min_depth, out, print_header, n_reads, n_selected,
                       summed_mapq, n_cov_bases, summed_cov,
                       summed_baseq, quality_bases) -> int:
    """Bounded-memory tabular coverage: per-read tallies accumulate in
    the batch filter hook (each read seen exactly once), per-window
    census + min-depth gate + reduction runs per span block (the
    coverage.c:589 accumulators over WindowedReader halo windows)."""
    from ..core.batch import ragged_gather_indices
    from ..io.stream import WindowedReader
    from ..ops.cigar import expand_ops

    def make_filter():
        def fn(b):
            fl = b.flag.astype(np.int64)
            placed = b.tid >= 0
            np.add.at(n_reads, b.tid[placed], 1)
            keep = np.ones(b.n, bool)
            if fail_flags:
                keep &= (fl & fail_flags) == 0
            if required_flags:
                keep &= (fl & required_flags) != 0
            keep &= b.mapq.astype(np.int64) >= min_mapq
            if min_len:
                keep &= qlen_query(b) >= min_len
            kp = keep & placed
            np.add.at(n_selected, b.tid[kp], 1)
            np.add.at(summed_mapq, b.tid[kp],
                      b.mapq[kp].astype(np.int64))
            return keep & placed
        return fn

    covered = np.zeros(n_targets, bool)
    for tid, wb, we, subs in WindowedReader(
            streams, filter_fn=[make_filter() for _ in streams]):
        covered[tid] = True
        we = min(we, int(header.ref_lens[tid]))
        L = we - wb
        if L <= 0:
            continue
        from ..engine import use_device
        n_bases = sum(int(s.seq_off[-1]) for s in subs if s.n)
        if use_device(n_bases):
            from ..ops.pileup_engine import coverage_window_device
            acc = coverage_window_device(
                [(s, np.arange(s.n)) for s in subs], wb, we,
                min_baseq, min_depth)
            n_cov_bases[tid] += acc[0]
            summed_cov[tid] += acc[1]
            summed_baseq[tid] += acc[2]
            quality_bases[tid] += acc[1]
            continue
        depth = np.zeros(L, np.int64)
        bq_sum = np.zeros(L, np.int64)
        vis = np.zeros(L, np.int64)
        for sub in subs:
            if sub.n == 0:
                continue
            t = expand_ops(sub)
            emit = np.isin(t.op, (F.CMATCH, F.CEQUAL, F.CDIFF,
                                  F.CDEL, F.CREF_SKIP))
            e_ops = np.nonzero(emit)[0]
            e_len = t.oplen[e_ops]
            pos = ragged_gather_indices(t.rpos[e_ops], e_len)
            inw = (pos >= wb) & (pos < we)
            is_m = np.isin(t.op[e_ops],
                           (F.CMATCH, F.CEQUAL, F.CDIFF))
            is_m_e = np.repeat(is_m, e_len)
            rid = np.repeat(t.rid[e_ops], e_len)
            qpos = ragged_gather_indices(t.qpos[e_ops], e_len)
            rel = (pos - wb)
            np.add.at(vis, rel[inw], 1)
            mb = inw & is_m_e
            qm = sub.qual[sub.seq_off[rid[mb]] + qpos[mb]] \
                .astype(np.int64)
            okq = qm >= min_baseq
            pr = rel[mb][okq]
            np.add.at(depth, pr, 1)
            np.add.at(bq_sum, pr, qm[okq])
        ok = (vis > 0) & (depth > 0) & (depth >= min_depth)
        n_cov_bases[tid] += int(ok.sum())
        summed_cov[tid] += int(depth[ok].sum())
        summed_baseq[tid] += int(bq_sum[ok].sum())
        quality_bases[tid] += int(depth[ok].sum())

    hdr_flag = [print_header]
    order = [t for t in range(n_targets) if covered[t]] + \
        [t for t in range(n_targets) if not covered[t]]
    for t in order:
        _tab_line(out, header, t, 0, header.ref_lens[t], hdr_flag,
                  n_selected, n_cov_bases, summed_cov, summed_baseq,
                  quality_bases, summed_mapq)
    return 0


def _tab_line(out, header, t, beg, end, hdr_flag, n_selected, n_cov_bases,
              summed_cov, summed_baseq, quality_bases, summed_mapq):
    if hdr_flag[0]:
        out.write("#rname\tstartpos\tendpos\tnumreads\tcovbases\tcoverage"
                  "\tmeandepth\tmeanbaseq\tmeanmapq\n")
        hdr_flag[0] = False
    L = float(end - beg)
    out.write("%s\t%d\t%d\t%d\t%d\t%g\t%g\t%.3g\t%.3g\n" % (
        header.ref_names[t], beg + 1, end, n_selected[t], n_cov_bases[t],
        100.0 * n_cov_bases[t] / L if L else 0,
        summed_cov[t] / L if L else 0,
        summed_baseq[t] / quality_bases[t] if quality_bases[t] > 0 else 0,
        summed_mapq[t] / n_selected[t] if n_selected[t] > 0 else 0))


def _print_hist(out, header, t, beg, end, hist, bw, nb, full_utf,
                plot_depth, n_selected, n_reads, n_cov_bases, summed_cov,
                summed_baseq, quality_bases, summed_mapq):
    import math
    blocks = BLOCK8 if full_utf else BLOCK2
    blen = len(blocks)
    vline = "│" if full_utf else "|"
    L = float(end - beg)
    data = [(1 if plot_depth else 100) * h / bw for h in hist]
    max_val = max(data) if data else 0.0
    out.write("%s (%sbp)\n" % (header.ref_names[t],
                               readable_bps(header.ref_lens[t])))
    n_rows = 10
    row_bin = max_val / n_rows if n_rows else 0
    for i in range(n_rows - 1, -1, -1):
        cur = row_bin * i
        if plot_depth:
            out.write(">%8.1f " % (i * row_bin))
        else:
            out.write(">%7.2f%% " % cur)
        out.write(vline)
        for col in range(nb):
            diff = round(blen * (data[col] - cur) / row_bin) - 1 \
                if row_bin > 0 else -1
            if diff < 0:
                out.write(" ")
            else:
                out.write(blocks[min(diff, blen - 1)])
        out.write(vline + " ")
        if i == 9:
            out.write("Number of reads: %d" % n_selected[t])
        elif i == 8 and n_reads[t] - n_selected[t] > 0:
            out.write("    (%d filtered)" % (n_reads[t] - n_selected[t]))
        elif i == 7:
            out.write("Covered bases:   %sbp"
                      % readable_bps(n_cov_bases[t]))
        elif i == 6:
            out.write("Percent covered: %.4g%%"
                      % (100.0 * n_cov_bases[t] / L))
        elif i == 5:
            out.write("Mean coverage:   %.3gx" % (summed_cov[t] / L))
        elif i == 4:
            out.write("Mean baseQ:      %.3g"
                      % (summed_baseq[t] / quality_bases[t]
                         if quality_bases[t] else 0))
        elif i == 3:
            out.write("Mean mapQ:       %.3g"
                      % (summed_mapq[t] / n_selected[t]
                         if n_selected[t] else 0))
        elif i == 1:
            out.write("Histo bin width: %sbp" % readable_bps(bw))
        elif i == 0:
            out.write("Histo max bin:   %.5g%%" % max_val
                      if not plot_depth else
                      "Histo max bin:   %.5g" % max_val)
        out.write("\n")
