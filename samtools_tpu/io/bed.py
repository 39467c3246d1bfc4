"""BED interval index with vectorized overlap queries.

Reference analog: bedidx.c — per-chromosome sorted intervals with min-end
binary search (bed_overlap_core, /root/reference/bedidx.c:169).  Here the
stab query is columnar: sort intervals by start, prefix-max of ends, then a
single searchsorted answers "does read [b,e) overlap any interval" for a
whole batch at once.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class BedIndex:
    # per chromosome: (starts sorted asc, prefix-max of ends)
    chroms: dict = field(default_factory=dict)
    # raw intervals per chrom in input order (for reglist export)
    raw: dict = field(default_factory=dict)

    def add(self, chrom: str, beg: int, end: int):
        self.raw.setdefault(chrom, []).append((beg, end))

    def finalize(self):
        for chrom, ivals in self.raw.items():
            arr = np.array(ivals, np.int64).reshape(-1, 2)
            order = np.argsort(arr[:, 0], kind="stable")
            starts = arr[order, 0]
            ends = np.maximum.accumulate(arr[order, 1])
            self.chroms[chrom] = (starts, ends)
        return self

    def overlap(self, chrom: str, beg: np.ndarray, end: np.ndarray) -> np.ndarray:
        """Vectorized: does each read [beg, end) overlap any interval?"""
        got = self.chroms.get(chrom)
        if got is None:
            return np.zeros(np.shape(beg), bool)
        starts, maxends = got
        idx = np.searchsorted(starts, end, side="left")  # intervals with s < e
        hit = idx > 0
        out = np.zeros(np.shape(beg), bool)
        out[hit] = maxends[idx[hit] - 1] > np.asarray(beg)[hit]
        return out

    def overlap_one(self, chrom: str, beg: int, end: int) -> bool:
        return bool(self.overlap(chrom, np.array([beg]), np.array([end]))[0])

    def regions(self, chrom: str) -> np.ndarray:
        """Merged [start, end) regions for a chromosome, sorted."""
        got = self.chroms.get(chrom)
        if got is None:
            return np.empty((0, 2), np.int64)
        starts, maxends = got
        out_b, out_e = [], []
        for s, e in zip(starts, maxends):
            if out_e and s <= out_e[-1]:
                out_e[-1] = max(out_e[-1], e)
            else:
                out_b.append(s)
                out_e.append(e)
        return np.stack([out_b, out_e], axis=1).astype(np.int64)


def read_bed(path: str) -> BedIndex:
    """Parse a BED (3+ column), or 2-column "chrom pos" (1-based single
    position) file — the formats bedidx.c's bed_read accepts."""
    idx = BedIndex()
    with open(path, "rt") as f:
        for line in f:
            line = line.rstrip("\n\r")
            if not line:
                continue
            fields = line.split("\t")
            if len(fields) == 1:
                fields = line.split()
            if not fields or fields[0] in ("track", "browser") \
                    or fields[0].startswith(("track", "browser", "#")):
                continue
            chrom = fields[0]
            try:
                if len(fields) >= 3:
                    beg, end = int(fields[1]), int(fields[2])
                elif len(fields) == 2:
                    # 1-based position
                    beg = int(fields[1]) - 1
                    end = beg + 1
                else:
                    continue
            except ValueError:
                continue
            if beg < 0:
                beg = 0
            if end >= beg:
                idx.add(chrom, beg, end)
    return idx.finalize()
