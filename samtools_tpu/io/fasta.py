"""FASTA/FASTQ + FAI index handling.

Reference analogs: htslib faidx.c (fai_load/fai_fetch used at
/root/reference/bam_plcmd.c:335, bam_md.c, bam_consensus.c) and the faidx
tool (/root/reference/faidx.c).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from . import bgzf


@dataclass
class FaiRecord:
    name: str
    length: int
    offset: int
    linebases: int
    linewidth: int
    qualoffset: int = -1  # FASTQ only


@dataclass
class FastaIndex:
    records: dict = field(default_factory=dict)  # name -> FaiRecord
    order: list = field(default_factory=list)
    path: str = ""
    _data: bytes | None = None

    def names(self) -> list[str]:
        return list(self.order)

    def nseq(self) -> int:
        return len(self.order)

    def has(self, name: str) -> bool:
        return name in self.records

    def length(self, name: str) -> int:
        return self.records[name].length if name in self.records else -1

    # ---------------------------------------------------------------- fetch
    def _load_data(self) -> bytes:
        if self._data is None:
            self._data = bgzf.read_file(self.path)
        return self._data

    def fetch(self, name: str, beg: int = 0, end: int | None = None) -> bytes:
        """Sequence bytes for [beg, end) (0-based), newline-free, case
        preserved (htslib faidx_fetch_seq semantics)."""
        r = self.records.get(name)
        if r is None:
            return b""
        if end is None or end > r.length:
            end = r.length
        beg = max(0, beg)
        if beg >= end:
            return b""
        data = self._load_data()
        first_line = beg // r.linebases
        in_line = beg % r.linebases
        start_off = r.offset + first_line * r.linewidth + in_line
        # read enough raw bytes to cover the span incl newlines
        nlines = (end - 1) // r.linebases - first_line + 1
        raw = data[start_off:r.offset
                   + ((end - 1) // r.linebases) * r.linewidth
                   + ((end - 1) % r.linebases) + 1]
        if r.linewidth == r.linebases:  # no newlines (unusual)
            return raw[:end - beg]
        arr = np.frombuffer(raw, np.uint8)
        keep = (arr != 0x0A) & (arr != 0x0D)
        out = arr[keep][:end - beg]
        del nlines
        return out.tobytes()

    def fetch_qual(self, name: str, beg: int = 0,
                   end: int | None = None) -> bytes:
        """FASTQ quality string for [beg, end)."""
        r = self.records.get(name)
        if r is None or r.qualoffset < 0:
            return b""
        if end is None or end > r.length:
            end = r.length
        beg = max(0, beg)
        if beg >= end:
            return b""
        data = self._load_data()
        first_line = beg // r.linebases
        in_line = beg % r.linebases
        start_off = r.qualoffset + first_line * r.linewidth + in_line
        raw = data[start_off:r.qualoffset
                   + ((end - 1) // r.linebases) * r.linewidth
                   + ((end - 1) % r.linebases) + 1]
        arr = np.frombuffer(raw, np.uint8)
        keep = (arr != 0x0A) & (arr != 0x0D)
        return arr[keep][:end - beg].tobytes()


def parse_fai(text: str, path: str) -> FastaIndex:
    idx = FastaIndex(path=path)
    for line in text.splitlines():
        if not line:
            continue
        f = line.split("\t")
        rec = FaiRecord(name=f[0], length=int(f[1]), offset=int(f[2]),
                        linebases=int(f[3]), linewidth=int(f[4]),
                        qualoffset=int(f[5]) if len(f) > 5 else -1)
        idx.records[rec.name] = rec
        idx.order.append(rec.name)
    return idx


def build_fai(path: str, fastq: bool = False) -> FastaIndex:
    """Scan a FASTA/FASTQ and build its index (htslib fai_build_core)."""
    data = bgzf.read_file(path)
    idx = FastaIndex(path=path, _data=data)
    n = len(data)
    i = 0
    while i < n:
        c = data[i]
        if c in (0x0A, 0x0D):
            i += 1
            continue
        if c == ord(">") or (fastq and c == ord("@")) or \
                (not fastq and c == ord("@")):
            is_fq = c == ord("@")
            # name = up to first whitespace
            j = i + 1
            while j < n and data[j] not in (0x20, 0x09, 0x0A, 0x0D):
                j += 1
            name = data[i + 1:j].decode("latin-1")
            # skip rest of header line
            while j < n and data[j] != 0x0A:
                j += 1
            j += 1
            seq_off = j
            length = 0
            linebases = 0
            linewidth = 0
            first = True
            while j < n and data[j] not in (ord(">"), ord("@"), ord("+")):
                line_start = j
                while j < n and data[j] != 0x0A:
                    j += 1
                lb = j - line_start
                if j < n and data[j - 1] == 0x0D:
                    lb -= 1
                lw = j - line_start + 1
                j += 1
                if lb == 0:
                    break
                if first:
                    linebases, linewidth = lb, lw
                    first = False
                length += lb
            qualoffset = -1
            if is_fq and j < n and data[j] == ord("+"):
                while j < n and data[j] != 0x0A:
                    j += 1
                j += 1
                qualoffset = j
                qlen = 0
                while j < n and qlen < length:
                    line_start = j
                    while j < n and data[j] != 0x0A:
                        j += 1
                    lb = j - line_start
                    if j < n and data[j - 1] == 0x0D:
                        lb -= 1
                    qlen += lb
                    j += 1
            rec = FaiRecord(name=name, length=length, offset=seq_off,
                            linebases=linebases or length or 1,
                            linewidth=linewidth or (length + 1) or 1,
                            qualoffset=qualoffset)
            idx.records[name] = rec
            idx.order.append(name)
            i = j
        else:
            i += 1
    return idx


def fai_text(idx: FastaIndex, fastq: bool = False) -> str:
    out = []
    for name in idx.order:
        r = idx.records[name]
        if fastq or r.qualoffset >= 0:
            out.append(f"{name}\t{r.length}\t{r.offset}\t{r.linebases}"
                       f"\t{r.linewidth}\t{r.qualoffset}")
        else:
            out.append(f"{name}\t{r.length}\t{r.offset}\t{r.linebases}"
                       f"\t{r.linewidth}")
    return "\n".join(out) + ("\n" if out else "")


def load_fasta(path: str, build_if_missing: bool = True,
               write_index: bool = False) -> FastaIndex:
    """fai_load analog: use <path>.fai if present, else build (optionally
    persisting the .fai next to the file)."""
    fai_path = path + ".fai"
    if os.path.exists(fai_path):
        idx = parse_fai(open(fai_path).read(), path)
        return idx
    if not build_if_missing:
        raise FileNotFoundError(fai_path)
    idx = build_fai(path)
    if write_index:
        try:
            with open(fai_path, "w") as f:
                f.write(fai_text(idx))
        except OSError:
            pass
    return idx
