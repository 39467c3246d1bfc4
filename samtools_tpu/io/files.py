"""Unified alignment-file reading/writing with format autodetection.

Format detection mirrors htslib's hts_detect_format consumed by the
reference's sam_open_format calls: BAM = BGZF-wrapped "BAM\\1", SAM = text,
CRAM = "CRAM" magic (decode support lands later; detection now so tools can
give a clear error).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass

import numpy as np

from ..core.batch import ReadBatch
from . import bam as bamio
from . import bgzf
from .header import SamHeader
from .sam_text import format_records, parse_sam


class FormatError(RuntimeError):
    pass


def detect_format(path: str) -> str:
    """Sniff container format from the file head (htslib hts_detect_format
    analog).  Returns one of cram / bam / sam.gz / bam_raw / sam."""
    with open(path, "rb") as f:
        head = f.read(65536)
    if head[:4] == b"CRAM":
        return "cram"
    if head[:4] == b"BAM\1":
        return "bam_raw"
    if head[:2] == b"\x1f\x8b":
        first = b""
        try:
            if bgzf.is_bgzf(head):
                xlen = int.from_bytes(head[10:12], "little")
                import zlib
                first = zlib.decompressobj(-15).decompress(
                    head[12 + xlen:], 16)
            else:
                import zlib
                first = zlib.decompressobj(47).decompress(head, 16)
        except Exception:
            pass
        return "bam" if first[:4] == b"BAM\1" else "sam.gz"
    return "sam"


@dataclass
class AlignmentFile:
    header: SamHeader
    batch: ReadBatch
    format: str = "sam"


def read_alignments(path: str, threads: int = 0,
                    reference: str | None = None) -> AlignmentFile:
    """Read a whole SAM/BAM file into a columnar batch.  ``reference``
    names a FASTA used for CRAM decode (-T/--reference)."""
    from ..core import metrics
    from . import hfile
    if path == "-":
        data = sys.stdin.buffer.read()
    else:
        path = hfile.resolve(path)
        with open(path, "rb") as f:
            data = f.read()
    with metrics.stage("read+decode", len(data), "bytes"):
        af = _read_from_bytes(data, threads, reference)
    metrics.add("decode.records", 0.0, af.batch.n, "reads")
    return af


def _read_from_bytes(data: bytes, threads: int = 0,
                     reference: str | None = None) -> AlignmentFile:
    if data[:4] == b"CRAM":
        from .cram_decode import read_cram
        fai = None
        if reference:
            from . import fasta as fastamod
            fai = fastamod.load_fasta(reference)
        header, batch = read_cram(data, fai=fai)
        return AlignmentFile(header=header, batch=batch, format="cram")
    fmt = "sam"
    if data[:2] == b"\x1f\x8b":
        if bgzf.is_bgzf(data):
            arr = bgzf.decompress_arr(data, threads=threads)
            if arr[:4].tobytes() == b"BAM\1":
                header, off = bamio.decode_header(arr)
                batch = bamio.decode_records(arr, off, threads=threads)
                return AlignmentFile(header=header, batch=batch,
                                     format="bam")
            data = arr.tobytes()
        else:
            import zlib
            data = zlib.decompress(data, 47)
    if data[:4] == b"BAM\1":
        arr = np.frombuffer(data, np.uint8)
        header, off = bamio.decode_header(arr)
        batch = bamio.decode_records(arr, off, threads=threads)
        return AlignmentFile(header=header, batch=batch, format="bam")
    header, batch = parse_sam(data)
    return AlignmentFile(header=header, batch=batch, format=fmt)


def infer_output_format(path: str | None, explicit: str | None = None,
                        default: str = "sam") -> str:
    if explicit:
        return explicit.lower()
    if path:
        p = path.lower()
        if p.endswith(".bam"):
            return "bam"
        if p.endswith(".cram"):
            return "cram"
        if p.endswith(".sam.gz"):
            return "sam.gz"
        if p.endswith(".sam"):
            return "sam"
    return default


def cram_ref_lookup(header: SamHeader, reference: str | None):
    """tid -> uppercase reference bytes, via an explicit FASTA (-T) or
    the REF_PATH/REF_CACHE M5 store (htslib cram_ref semantics)."""
    fai = None
    if reference:
        from . import fasta as fastamod
        fai = fastamod.load_fasta(reference)
    cache: dict[int, bytes | None] = {}

    def lookup(tid: int):
        if tid in cache:
            return cache[tid]
        seq = None
        if fai is not None:
            try:
                seq = fai.fetch(header.ref_names[tid])
            except Exception:
                seq = None
        if seq is None:
            from .cram_decode import _ref_path_lookup
            seq = _ref_path_lookup(header, tid)
        if seq is not None:
            seq = bytes(seq).upper()
        cache[tid] = seq
        return seq

    return lookup


class StreamingWriter:
    """Incremental alignment writer (bam / sam / sam.gz): header once,
    then record batches appended as they arrive — the external sort's
    output path (the reference writes merged records one by one at
    bam_sort.c:1956; here a batch at a time)."""

    def __init__(self, path: str | None, header: SamHeader, fmt: str,
                 threads: int = 0, level: int = 6,
                 include_header: bool = True):
        if fmt not in ("bam", "sam", "sam.gz"):
            raise FormatError(f"streaming output not supported for {fmt}")
        self.fmt = fmt
        self.header = header
        self._own = path is not None and path != "-"
        self._f = open(path, "wb") if self._own else sys.stdout.buffer
        if fmt in ("bam", "sam.gz"):
            self._w = bgzf.BgzfWriter(self._f, level=level, threads=threads)
        else:
            self._w = None
        head = (bamio.encode_header(header) if fmt == "bam"
                else header.text.encode("latin-1") if include_header
                else b"")
        if self._w is not None:
            self._w.write(head)
        else:
            self._f.write(head)

    def write_batch(self, batch: ReadBatch) -> None:
        if batch.n == 0:
            return
        payload = (bamio.encode_records(batch) if self.fmt == "bam"
                   else format_records(self.header, batch).encode("latin-1"))
        if self._w is not None:
            self._w.write(payload)
        else:
            self._f.write(payload)

    def close(self) -> None:
        if self._w is not None:
            self._w.close(write_eof=True)
        if self._own:
            self._f.close()
        else:
            self._f.flush()


def write_alignments(path: str | None, header: SamHeader, batch: ReadBatch,
                     fmt: str = "sam", threads: int = 0, level: int = 6,
                     include_header: bool = True,
                     header_only: bool = False,
                     reference: str | None = None,
                     write_index: bool = False,
                     fmt_opts: dict | None = None) -> bytes | None:
    """Write records; path None/'-' writes to stdout."""
    from ..core import metrics
    with metrics.stage("encode+write", batch.n, "reads"):
        return _write_alignments(path, header, batch, fmt, threads, level,
                                 include_header, header_only, reference,
                                 write_index, fmt_opts)


def _write_alignments(path, header, batch, fmt, threads, level,
                      include_header, header_only, reference,
                      write_index, fmt_opts=None) -> bytes | None:
    if fmt == "cram":
        from .cram_encode import encode_cram, write_crai
        version = (3, 0)
        v = (fmt_opts or {}).get("version")
        if v:
            try:
                major, minor = str(v).split(".")
                version = (int(major), int(minor))
            except ValueError:
                pass
            if version not in ((2, 1), (3, 0), (3, 1)):
                raise FormatError("unsupported CRAM version %s" % (v,))
            if version == (2, 1):
                version = (3, 0)   # writer floor, like htslib pre-3.0
        payload, crai = encode_cram(header, batch,
                                    cram_ref_lookup(header, reference),
                                    version=version)
        if path and path != "-" and write_index:
            write_crai(path + ".crai", crai)
        if path is None or path == "-":
            sys.stdout.buffer.write(payload)
            sys.stdout.buffer.flush()
            return None
        with open(path, "wb") as f:
            f.write(payload)
        return None
    if fmt == "bam":
        raw = bamio.encode_header(header)
        if not header_only:
            raw += bamio.encode_records(batch)
        payload = bgzf.compress(raw, level=level, threads=threads)
    else:
        text = header.text if include_header else ""
        if not header_only:
            text += format_records(header, batch)
        payload = text.encode("latin-1")
        if fmt == "sam.gz":
            payload = bgzf.compress(payload, level=level, threads=threads)
    if path is None or path == "-":
        sys.stdout.buffer.write(payload)
        sys.stdout.buffer.flush()
        return None
    with open(path, "wb") as f:
        f.write(payload)
    return None
