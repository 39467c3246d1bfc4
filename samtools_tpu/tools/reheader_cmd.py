"""samtools reheader — replace a BAM header.

Byte-parity target: /root/reference/bam_reheader.c: new header (from a
SAM file or from a -c command transforming the existing header) + the
original records, with a samtools @PG appended unless -P/--no-PG.
BAM in-place is rejected as in the reference; CRAM is unsupported here.

BAM output is a raw BGZF splice (bam_reheader.c:49's architecture): the
new header is deflated into fresh blocks, the tail of the block the old
header ends inside is re-deflated, and every following compressed block
is copied byte-for-byte — the records are never decoded, so reheader
runs at I/O speed and the record bytes cannot drift.
"""

from __future__ import annotations

import subprocess
import sys

from .. import SAMTOOLS_PARITY_VERSION
from ..io.files import read_alignments, write_alignments
from ..io.header import SamHeader
from .common import (UsageError, gnu_getopt, print_error,
                     print_error_errno)


def _cram_header_site(data: bytes):
    """Locate the SAM-header block inside the first container: returns
    (container_start, payload_off, comp_size, method, crc_off)."""
    import struct
    from ..io.cram import itf8, parse_container, parse_file_definition
    major, _minor, pos = parse_file_definition(data)
    cont, i = parse_container(data, pos, major)
    off = i
    method = data[off]
    off += 2  # method, ctype
    _cid, off = itf8(data, off)
    comp, off = itf8(data, off)
    _usize, off = itf8(data, off)
    crc_off = off + comp if major >= 3 else -1
    del struct, cont
    return pos, off, comp, method, crc_off, i


def _reheader_cram_inplace(path: str, new_header) -> int:
    """cram_reheader_inplace (bam_reheader.c:193): rewrite the padded
    SAM-header block in place when the new text fits."""
    import struct
    import zlib
    with open(path, "r+b") as f:
        head = f.read(1 << 22)
        try:
            _pos, poff, comp, method, crc_off, blk_off = \
                _cram_header_site(head)
        except Exception:
            print_error("reheader", "unable to parse CRAM '%s'", path)
            return 1
        text = new_header.text.encode("latin-1")
        payload = struct.pack("<i", len(text)) + text
        if method != 0 or len(payload) > comp:
            print_error(
                "reheader",
                "unable to fit new header into '%s' in place "
                "(need %d bytes raw, block holds %d)",
                path, len(payload), comp if method == 0 else 0)
            return 1
        padded = payload + b"\x00" * (comp - len(payload))
        f.seek(poff)
        f.write(padded)
        if crc_off > 0:
            blk = head[blk_off:poff] + padded
            f.seek(crc_off)
            f.write(struct.pack("<I", zlib.crc32(blk) & 0xFFFFFFFF))
    return 0


def _splice_cram(path: str, new_header, out) -> bool:
    """CRAM reheader to stdout: new header container + byte-for-byte
    copy of every following container (bam_cat-style splice;
    cram_reheader at bam_reheader.c:124)."""
    from ..io.cram_encode import _container_header, encode_block
    import struct
    with open(path, "rb") as f:
        head = f.read(1 << 22)
        if head[:4] != b"CRAM":
            return False
        try:
            pos, _poff, comp, _method, crc_off, i = \
                _cram_header_site(head)
        except Exception:
            return False
        # end of the first container's payload
        from ..io.cram import parse_container, parse_file_definition
        major, _m2, p0 = parse_file_definition(head)
        cont, i2 = parse_container(head, p0, major)
        first_end = i2 + cont.length
        out.write(head[:p0])
        htext = new_header.text.encode("latin-1")
        pad = max(1024, len(htext) // 2)
        hpayload = struct.pack("<i", len(htext)) + htext + b"\x00" * pad
        hblock = encode_block(0, 0, 0, hpayload)
        out.write(_container_header(len(hblock), 0, 0, 0, 0, 0, 0, 1,
                                    [0]))
        out.write(hblock)
        f.seek(first_end)
        while True:
            chunk = f.read(1 << 24)
            if not chunk:
                break
            out.write(chunk)
    return True


class _LazyBam:
    """Header-only view of a BGZF BAM (records untouched)."""

    def __init__(self, path: str, header):
        self.header = header
        self._splice_path = path


class _LazyCram:
    """Header-only view of a CRAM (containers untouched)."""

    def __init__(self, path: str, header):
        self.header = header
        self._cram_path = path


def _open_lazy(path: str):
    """Open for reheader: BGZF BAMs and CRAMs get header-only handles
    (their record bytes will be raw-spliced); everything else falls
    back to the generic reader."""
    try:
        with open(path, "rb") as f:
            magic = f.read(4)
            if magic == b"CRAM":
                import struct
                f.seek(0)
                head = f.read(1 << 22)
                _pos, poff, comp, method, _crc, _i = \
                    _cram_header_site(head)
                from ..io.cram import parse_block, parse_file_definition
                from ..io.header import SamHeader
                major, _m, p0 = parse_file_definition(head)
                from ..io.cram import parse_container
                cont, i2 = parse_container(head, p0, major)
                blk, _ = parse_block(head, i2, major)
                hd = blk.data()
                tlen = struct.unpack_from("<i", hd, 0)[0]
                text = hd[4:4 + tlen].rstrip(b"\x00").decode("latin-1")
                return _LazyCram(path, SamHeader.from_text(text))
    except Exception:
        pass
    try:
        from ..io.stream import BamStream
        st = BamStream(path)
        try:
            return _LazyBam(path, st.header)
        finally:
            st.close()
    except Exception:
        return read_alignments(path)


def _splice_bam(bam_path: str, new_header, out) -> bool:
    """Write new header + raw-copied record blocks; False if the input
    is not a BGZF BAM (caller falls back to decode/re-encode)."""
    import numpy as np
    from ..io import bgzf
    from ..io.bam import encode_header
    from ..io.stream import BamStream
    try:
        st = BamStream(bam_path, threads=2)
    except Exception:
        return False
    try:
        voff = st._hdr_voffset
        cpos, uoff = voff >> 16, voff & 0xFFFF
        out.write(bgzf.compress(encode_header(new_header), level=6,
                                append_eof=False))
        if uoff:
            # the first record shares a block with the old header: that
            # block's tail must be re-deflated from the record offset
            w = st._inflate_span(cpos, 1 << 16)
            end0 = int(w.uoffs[1]) if w.uoffs.size > 1 else w.data.size
            blk = w.data[uoff:end0]
            if blk.size:
                out.write(bgzf.compress(np.asarray(blk).tobytes(),
                                        level=6, append_eof=False))
            cpos += int(w.bsizes[0])
        # raw copy of every remaining compressed block (incl. EOF block)
        with open(bam_path, "rb") as f:
            f.seek(cpos)
            while True:
                chunk = f.read(1 << 24)
                if not chunk:
                    break
                out.write(chunk)
    finally:
        st.close()
    return True


def usage(fp):
    fp.write(
        "Usage: samtools reheader [-P] in.header.sam in.bam > out.bam\n"
        "   or  samtools reheader [-P] -i in.header.sam file.bam\n"
        "   or  samtools reheader [-P] -c CMD in.bam > out.bam\n"
        "\n"
        "Options:\n"
        "    -P, --no-PG      Do not generate a @PG header line\n"
        "    -i, --in-place   Modify the file in-place (CRAM only)\n"
        "    -c, --command    Use CMD to modify the header\n")


def main_reheader(argv: list[str]) -> int:
    no_pg = False
    inplace = False
    external = None
    try:
        opts, args = gnu_getopt(argv, "hiPc:",
                                ["help", "in-place", "no-PG", "command="])
    except UsageError:
        usage(sys.stderr)
        return 1
    for o, v in opts:
        if o in ("-P", "--no-PG"):
            no_pg = True
        elif o in ("-i", "--in-place"):
            inplace = True
        elif o in ("-c", "--command"):
            external = v
        elif o in ("-h", "--help"):
            usage(sys.stdout)
            return 0
        else:
            usage(sys.stderr)
            return 1

    if (len(args) != 2 or external) and (len(args) != 1 or not external):
        usage(sys.stderr)
        return 1

    if external:
        bam_path = args[0]
        try:
            f = _open_lazy(bam_path)
        except OSError as e:
            print_error_errno("reheader", "fail to open file '%s'",
                              bam_path, exc=e)
            return 1
        p = subprocess.run(external, shell=True,
                           input=f.header.text.encode("latin-1"),
                           capture_output=True)
        if p.returncode != 0:
            sys.stderr.write(
                "[main_reheader] failed to read the header from '%s'.\n"
                % external)
            return 1
        new_header = SamHeader.from_text(p.stdout.decode("latin-1"))
    else:
        hdr_path, bam_path = args
        try:
            hf = read_alignments(hdr_path)
        except OSError as e:
            print_error_errno("reheader",
                              "fail to read the header from '%s'",
                              hdr_path, exc=e)
            return 1
        new_header = hf.header
        try:
            f = _open_lazy(bam_path)
        except OSError as e:
            print_error_errno("reheader", "fail to open file '%s'",
                              bam_path, exc=e)
            return 1

    if inplace and getattr(f, "_cram_path", None) is None:
        print_error("reheader", "cannot reheader BAM '%s' in-place",
                    bam_path)
        return 1

    if not no_pg:
        new_header = new_header.add_pg_line(
            "samtools", "samtools",
            "samtools reheader " + " ".join(argv),
            SAMTOOLS_PARITY_VERSION)

    if getattr(f, "_cram_path", None) is not None:
        if not new_header.ref_names:
            new_header.ref_names = f.header.ref_names
            new_header.ref_lens = f.header.ref_lens
        if inplace:
            return _reheader_cram_inplace(f._cram_path, new_header)
        if _splice_cram(f._cram_path, new_header, sys.stdout.buffer):
            return 0
        print_error("reheader", "failed to reheader CRAM '%s'", bam_path)
        return 1

    if getattr(f, "_splice_path", None) is not None:
        if not new_header.ref_names:
            new_header.ref_names = f.header.ref_names
            new_header.ref_lens = f.header.ref_lens
        if _splice_bam(f._splice_path, new_header, sys.stdout.buffer):
            return 0
        f = read_alignments(f._splice_path)  # fallback: full decode

    # records keep their original tids; the new header must supply
    # compatible @SQ lines (no validity checks, as in the reference)
    if not new_header.ref_names:
        new_header.ref_names = f.header.ref_names
        new_header.ref_lens = f.header.ref_lens
    write_alignments(None, new_header, f.batch, fmt="bam",
                     include_header=True)
    return 0
