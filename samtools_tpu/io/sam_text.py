"""SAM text codec: parse SAM into (SamHeader, ReadBatch), format back.

Formatting must be byte-identical to htslib's sam_format1 (consumed by
`samtools view`, reference /root/reference/sam_view.c) — '=' for same-tid
mate, '*' placeholders, %g floats in aux, nt16 seq table.
"""

from __future__ import annotations

import re

import numpy as np

from ..core import aux as auxmod
from ..core.batch import ReadBatch
from ..core.flags import CIGAR_CHARS, SEQ_NT16_STR
from .header import SamHeader

# ASCII -> nt16 code lookup
NT16_LUT = np.full(256, 15, np.uint8)
for _i, _c in enumerate(SEQ_NT16_STR):
    NT16_LUT[ord(_c)] = _i
    NT16_LUT[ord(_c.lower())] = _i
NT16_LUT[ord("u")] = 8
NT16_LUT[ord("U")] = 8

NT16_CHARS = np.frombuffer(SEQ_NT16_STR.encode(), np.uint8)

_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=XB])")
_CIGAR_OP_NUM = {c: i for i, c in enumerate(CIGAR_CHARS)}


class SamParseError(ValueError):
    pass


def parse_cigar(s: str) -> np.ndarray:
    if s == "*":
        return np.empty(0, np.uint32)
    out = []
    pos = 0
    for m in _CIGAR_RE.finditer(s):
        if m.start() != pos:
            raise SamParseError(f"bad CIGAR: {s!r}")
        out.append((int(m.group(1)) << 4) | _CIGAR_OP_NUM[m.group(2)])
        pos = m.end()
    if pos != len(s):
        raise SamParseError(f"bad CIGAR: {s!r}")
    return np.array(out, np.uint32)


def cigar_to_str(cig: np.ndarray) -> str:
    if cig.size == 0:
        return "*"
    return "".join(f"{int(c) >> 4}{CIGAR_CHARS[int(c) & 0xF]}" for c in cig)


def parse_sam(text: bytes | str,
              ref_names: list[str] | None = None,
              ref_lens: list[int] | None = None) -> tuple[SamHeader, ReadBatch]:
    """Parse SAM text.  If the header carries no @SQ lines (and no explicit
    ref list is given), reference names are inferred from the records in
    order of appearance — the permissive analog of `samtools view -t`."""
    if isinstance(text, bytes):
        text = text.decode("latin-1")
    header_lines = []
    tid_map: dict[str, int] = {}
    rows = []
    for line in text.split("\n"):
        if not line:
            continue
        if line[0] == "@":
            header_lines.append(line)
        else:
            rows.append(line)
    header_text = "\n".join(header_lines)
    if header_text:
        header_text += "\n"
    header = SamHeader.from_text(header_text, ref_names, ref_lens)
    # alias-aware (includes @SQ AN names)
    tid_map = dict(header._name2tid)
    infer = not tid_map

    n = len(rows)
    b = ReadBatch(n=n)
    tid = np.empty(n, np.int32)
    pos = np.empty(n, np.int64)
    mapq = np.empty(n, np.uint8)
    flag = np.empty(n, np.uint16)
    mtid = np.empty(n, np.int32)
    mpos = np.empty(n, np.int64)
    tlen = np.empty(n, np.int64)
    qnames, cigars, seqs, quals, auxs = [], [], [], [], []

    for i, line in enumerate(rows):
        f = line.split("\t")
        if len(f) < 11:
            raise SamParseError(f"SAM record with {len(f)} fields")
        qnames.append(f[0].encode("latin-1"))
        flag[i] = int(f[1])
        if f[2] == "*":
            tid[i] = -1
        else:
            if f[2] not in tid_map:
                if not infer:
                    raise SamParseError(f"unknown reference {f[2]!r}")
                tid_map[f[2]] = len(tid_map)
            tid[i] = tid_map[f[2]]
        pos[i] = int(f[3]) - 1
        mapq[i] = int(f[4])
        cigars.append(parse_cigar(f[5]))
        if f[6] == "*":
            mtid[i] = -1
        elif f[6] == "=":
            mtid[i] = tid[i]
        else:
            if f[6] not in tid_map:
                if not infer:
                    raise SamParseError(f"unknown mate reference {f[6]!r}")
                tid_map[f[6]] = len(tid_map)
            mtid[i] = tid_map[f[6]]
        mpos[i] = int(f[7]) - 1
        tlen[i] = int(f[8])
        if f[9] == "*":
            seqs.append(np.empty(0, np.uint8))
        else:
            seqs.append(NT16_LUT[np.frombuffer(f[9].encode("latin-1"), np.uint8)])
        if f[10] == "*":
            quals.append(np.full(len(seqs[-1]), 0xFF, np.uint8))
        else:
            q = np.frombuffer(f[10].encode("latin-1"), np.uint8) - 33
            if len(seqs[-1]) == 0 and len(q) > 0:
                raise SamParseError("QUAL without SEQ")
            quals.append(q.astype(np.uint8))
        if len(seqs[-1]) and len(quals[-1]) != len(seqs[-1]):
            raise SamParseError("SEQ and QUAL length mismatch")
        if len(f) > 11:
            auxs.append(np.frombuffer(
                b"".join(auxmod.sam_field_to_aux(x) for x in f[11:]), np.uint8))
        else:
            auxs.append(np.empty(0, np.uint8))

    b.tid, b.pos, b.mapq, b.flag = tid, pos, mapq, flag
    b.mtid, b.mpos, b.tlen = mtid, mpos, tlen
    b.qname = (np.frombuffer(b"".join(qnames), np.uint8)
               if qnames else np.empty(0, np.uint8))
    b.qname_off = np.concatenate(
        [[0], np.cumsum([len(q) for q in qnames], dtype=np.int64)])
    b.cigar = (np.concatenate(cigars).astype(np.uint32)
               if cigars else np.empty(0, np.uint32))
    b.cigar_off = np.concatenate(
        [[0], np.cumsum([len(c) for c in cigars], dtype=np.int64)])
    b.seq = (np.concatenate(seqs).astype(np.uint8)
             if seqs else np.empty(0, np.uint8))
    b.seq_off = np.concatenate(
        [[0], np.cumsum([len(s) for s in seqs], dtype=np.int64)])
    b.qual = (np.concatenate(quals).astype(np.uint8)
              if quals else np.empty(0, np.uint8))
    b.aux = (np.concatenate(auxs).astype(np.uint8)
             if auxs else np.empty(0, np.uint8))
    b.aux_off = np.concatenate(
        [[0], np.cumsum([len(a) for a in auxs], dtype=np.int64)])
    if infer and tid_map:
        names = list(tid_map.keys())
        header = SamHeader.from_text(header.text, names, [0] * len(names))
    return header, b


def format_record(header: SamHeader, b: ReadBatch, i: int) -> str:
    """One record -> SAM text line (no trailing newline)."""
    qname = b.qname_str(i)
    flag = int(b.flag[i])
    rname = header.ref_name(int(b.tid[i])) if b.tid[i] >= 0 else "*"
    pos = int(b.pos[i]) + 1
    mapq = int(b.mapq[i])
    cig = cigar_to_str(b.cigar_of(i))
    if b.mtid[i] < 0:
        rnext = "*"
    elif b.mtid[i] == b.tid[i]:
        rnext = "="
    else:
        rnext = header.ref_name(int(b.mtid[i]))
    pnext = int(b.mpos[i]) + 1
    tlen = int(b.tlen[i])
    seq = b.seq_of(i)
    if seq.size == 0:
        seq_s = "*"
    else:
        seq_s = bytes(NT16_CHARS[seq]).decode("latin-1")
    qual = b.qual_of(i)
    if qual.size == 0 or (qual == 0xFF).all():
        qual_s = "*"
    else:
        qual_s = bytes((qual + 33).astype(np.uint8)).decode("latin-1")
    fields = [qname, str(flag), rname, str(pos), str(mapq), cig, rnext,
              str(pnext), str(tlen), seq_s, qual_s]
    ab = b.aux_of(i)
    if ab.size:
        fields.extend(auxmod.aux_to_sam_fields(ab))
    return "\t".join(fields)


def format_records(header: SamHeader, b: ReadBatch,
                   idx: np.ndarray | None = None) -> str:
    """Many records -> SAM text (with trailing newline if any records).

    Rides the native batch formatter (samtpu_sam_format — identical
    bytes incl. %g float tags, validated in tests/test_native.py) when
    the library is present; the Python per-record path is the oracle and
    the fallback for malformed aux."""
    import os
    if os.environ.get("SAMTPU_SAM_TEXT_SCALAR") != "1":
        from . import native
        if native.has_sam_format() and b.n:
            blob = getattr(header, "_native_names", None)
            if blob is None:
                names = [header.ref_name(t) for t in
                         range(header.n_refs)]
                raw = "".join(names).encode("latin-1")
                blob = (np.frombuffer(raw, np.uint8),
                        np.concatenate([[0], np.cumsum(
                            [len(n) for n in names])]).astype(np.int64))
                try:
                    header._native_names = blob
                except Exception:
                    pass
            ind = (np.arange(b.n, dtype=np.int64) if idx is None
                   else np.asarray(idx, np.int64))
            got = native.sam_format(b, ind, blob[0], blob[1])
            if got is not None:
                return got
    rng = range(b.n) if idx is None else [int(x) for x in idx]
    lines = [format_record(header, b, i) for i in rng]
    return "".join(line + "\n" for line in lines)
