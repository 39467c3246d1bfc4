"""BAM binary codec: whole-file vectorized decode into ReadBatch columns.

Unlike the reference's one-record-at-a-time ``sam_read1`` pull loop, we
decode in bulk: one pass finds record boundaries, then every column is
extracted with vectorized numpy gathers — the columnar layout device kernels
consume directly.  (Record-boundary scanning and BGZF inflate are the parts
the C++ native module accelerates; the numpy path is the always-available
fallback and the correctness reference.)

BAM layout: SAM spec §4.2; capability parity target: htslib sam.c BAM path
as consumed by e.g. /root/reference/bam_sort.c:3494.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ..core.batch import ReadBatch, ragged_gather_indices
from . import bgzf, native
from .header import SamHeader

BAM_MAGIC = b"BAM\1"

_FIXED = np.dtype([
    ("block_size", "<i4"), ("refID", "<i4"), ("pos", "<i4"),
    ("l_read_name", "u1"), ("mapq", "u1"), ("bin", "<u2"),
    ("n_cigar_op", "<u2"), ("flag", "<u2"), ("l_seq", "<i4"),
    ("next_refID", "<i4"), ("next_pos", "<i4"), ("tlen", "<i4"),
])
FIXED_SIZE = 36  # including block_size


class BamError(RuntimeError):
    pass


def _try_native_scan(data: np.ndarray, start: int):
    try:
        from . import native
        if native.available():
            return native.bam_record_offsets(data, start)
    except Exception:
        pass
    return None


def scan_record_offsets(data: np.ndarray, start: int) -> np.ndarray:
    """Offsets of each record's block_size field.  Sequential by nature
    (each offset depends on the previous block_size); the C++ native module
    does this at memory speed, Python fallback below."""
    got = _try_native_scan(data, start)
    if got is not None:
        return got
    offs = []
    n = data.size
    buf = data.tobytes()  # bytes slicing is faster than ndarray here
    off = start
    while off + 4 <= n:
        bs = int.from_bytes(buf[off:off + 4], "little")
        if bs <= 0 or off + 4 + bs > n:
            raise BamError(f"corrupt BAM record size {bs} at offset {off}")
        offs.append(off)
        off += 4 + bs
    if off != n:
        raise BamError("truncated BAM record at end of stream")
    return np.array(offs, np.int64)


def decode_header(data: np.ndarray) -> tuple[SamHeader, int]:
    """Parse BAM header; return (header, offset_of_first_record).

    Only the header region is materialized as bytes — never the whole
    body (GB-scale copies dominated decode time otherwise).
    """
    if isinstance(data, np.ndarray):
        head = data[:8].tobytes()
    else:
        head = bytes(data[:8])
    if head[:4] != BAM_MAGIC:
        raise BamError("not a BAM stream (bad magic)")
    l_text = struct.unpack_from("<i", head, 4)[0]
    # refs follow the text; parse a generous window incrementally
    win_end = 8 + l_text + 4
    buf = (data[4:win_end].tobytes() if isinstance(data, np.ndarray)
           else bytes(data[4:win_end]))
    text = buf[4:4 + l_text].split(b"\0", 1)[0].decode("latin-1")
    n_ref = struct.unpack_from("<i", buf, 4 + l_text)[0]
    off = win_end
    names, lens = [], []
    for _ in range(n_ref):
        hdr8 = (data[off:off + 8].tobytes()
                if isinstance(data, np.ndarray) else bytes(data[off:off + 8]))
        l_name = struct.unpack_from("<i", hdr8, 0)[0]
        nm = (data[off + 4:off + 4 + l_name - 1].tobytes()
              if isinstance(data, np.ndarray)
              else bytes(data[off + 4:off + 4 + l_name - 1]))
        names.append(nm.decode("latin-1"))
        ln8 = (data[off + 4 + l_name:off + 8 + l_name].tobytes()
               if isinstance(data, np.ndarray)
               else bytes(data[off + 4 + l_name:off + 8 + l_name]))
        lens.append(struct.unpack_from("<i", ln8, 0)[0])
        off += 8 + l_name
    return SamHeader.from_text(text, names, lens), off


def unpack_nibbles(packed: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Expand per-read packed 4-bit seqs (concatenated per-read byte runs,
    each run ceil(l/2) bytes) into one flat array of per-base codes."""
    if packed.size == 0:
        return np.empty(0, np.uint8)
    hi = packed >> 4
    lo = packed & 0xF
    both = np.empty(packed.size * 2, np.uint8)
    both[0::2] = hi
    both[1::2] = lo
    nbytes = (lens + 1) // 2
    starts2 = np.zeros(lens.size, np.int64)
    np.cumsum(nbytes * 2, out=starts2)
    starts2 = np.concatenate([[0], starts2[:-1]])
    gather = ragged_gather_indices(starts2, lens)
    return both[gather]


def pack_nibbles(codes: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Inverse of unpack_nibbles: per-read 4-bit codes -> packed bytes."""
    if codes.size == 0:
        return np.empty(0, np.uint8)
    nbytes = (lens + 1) // 2
    total2 = int((nbytes * 2).sum())
    staging = np.zeros(total2, np.uint8)
    starts2 = np.concatenate([[0], np.cumsum(nbytes * 2)[:-1]])
    scatter = ragged_gather_indices(starts2, lens)
    staging[scatter] = codes
    return (staging[0::2] << 4) | staging[1::2]


def decode_records(data: np.ndarray, start: int,
                   threads: int = 0) -> ReadBatch:
    """Decode all records at data[start:] into a ReadBatch (vectorized)."""
    offs = scan_record_offsets(data, start)
    n = offs.size
    b = ReadBatch(n=n)
    if n == 0:
        return b
    if native.available():
        try:
            cols = native.bam_decode_columns(data, offs, threads or 2)
        except ValueError as e:
            raise BamError(f"corrupt BAM: {e}") from None
        for k, v in cols.items():
            setattr(b, k, v)
        _fixup_long_cigars(b)
        return b
    # fixed fields: gather 36 bytes per record then reinterpret
    fixed_bytes = data[offs[:, None] + np.arange(FIXED_SIZE)]
    fixed = np.ascontiguousarray(fixed_bytes).view(_FIXED).reshape(n)
    b.tid = fixed["refID"].astype(np.int32)
    b.pos = fixed["pos"].astype(np.int64)
    b.mapq = fixed["mapq"].copy()
    b.flag = fixed["flag"].copy()
    b.mtid = fixed["next_refID"].astype(np.int32)
    b.mpos = fixed["next_pos"].astype(np.int64)
    b.tlen = fixed["tlen"].astype(np.int64)

    l_read_name = fixed["l_read_name"].astype(np.int64)
    n_cigar = fixed["n_cigar_op"].astype(np.int64)
    l_seq = fixed["l_seq"].astype(np.int64)
    block_size = fixed["block_size"].astype(np.int64)

    # ragged layout offsets within each record
    qname_start = offs + FIXED_SIZE
    cigar_start = qname_start + l_read_name
    seq_start = cigar_start + 4 * n_cigar
    qual_start = seq_start + (l_seq + 1) // 2
    aux_start = qual_start + l_seq
    rec_end = offs + 4 + block_size

    qname_lens = l_read_name - 1  # drop NUL
    b.qname = data[ragged_gather_indices(qname_start, qname_lens)]
    b.qname_off = np.concatenate([[0], np.cumsum(qname_lens)])

    cig_bytes = data[ragged_gather_indices(cigar_start, 4 * n_cigar)]
    b.cigar = np.ascontiguousarray(cig_bytes).view("<u4").astype(np.uint32)
    b.cigar_off = np.concatenate([[0], np.cumsum(n_cigar)])

    packed = data[ragged_gather_indices(seq_start, (l_seq + 1) // 2)]
    b.seq = unpack_nibbles(packed, l_seq)
    b.seq_off = np.concatenate([[0], np.cumsum(l_seq)])
    b.qual = data[ragged_gather_indices(qual_start, l_seq)]

    aux_lens = rec_end - aux_start
    if (aux_lens < 0).any():
        raise BamError("corrupt BAM: aux length negative")
    b.aux = data[ragged_gather_indices(aux_start, aux_lens)]
    b.aux_off = np.concatenate([[0], np.cumsum(aux_lens)])

    _fixup_long_cigars(b)
    return b


def _fixup_long_cigars(b: ReadBatch):
    """SAM-spec long-CIGAR convention: real cigar moved to CG:B,I aux with a
    kSmN placeholder.  Rare; handled per-record."""
    from ..core import aux as auxmod
    ncig = b.n_cigar
    lseq = b.l_qseq
    cand = np.nonzero(ncig == 2)[0]
    needs = []
    for i in cand:
        c = b.cigar_of(int(i))
        # placeholder is "<l_seq>S<ref_len>N"
        if ((c[0] & 0xF) == 4 and (c[0] >> 4) == lseq[i]
                and (c[1] & 0xF) == 3):
            cg = auxmod.get_value(b.aux_of(int(i)), "CG")
            if cg is not None and cg[0] == "B" and cg[1][0] == "I":
                needs.append((int(i), np.array(cg[1][1], np.uint32)))
    if not needs:
        return
    # rebuild cigar flat/offsets and strip CG tags for affected records
    new_cigs = {i: c for i, c in needs}
    parts, new_aux_parts = [], []
    new_off = [0]
    aux_off = [0]
    for i in range(b.n):
        if i in new_cigs:
            parts.append(new_cigs[i])
            na = auxmod.delete_tags(b.aux_of(i), {"CG"})
            new_aux_parts.append(na)
        else:
            parts.append(b.cigar_of(i))
            new_aux_parts.append(b.aux_of(i))
        new_off.append(new_off[-1] + len(parts[-1]))
        aux_off.append(aux_off[-1] + len(new_aux_parts[-1]))
    b.cigar = (np.concatenate(parts).astype(np.uint32)
               if parts else np.empty(0, np.uint32))
    b.cigar_off = np.array(new_off, np.int64)
    b.aux = (np.concatenate(new_aux_parts).astype(np.uint8)
             if new_aux_parts else np.empty(0, np.uint8))
    b.aux_off = np.array(aux_off, np.int64)


# ---------------------------------------------------------------- file API

@dataclass
class BamFile:
    header: SamHeader
    batch: ReadBatch


def read_bam(path: str, threads: int = 0) -> BamFile:
    raw = bgzf.read_file(path, threads=threads)
    data = np.frombuffer(raw, np.uint8)
    header, off = decode_header(data)
    batch = decode_records(data, off)
    return BamFile(header=header, batch=batch)


def uoffset_to_voffset(uoffs: np.ndarray, coffs: np.ndarray,
                       offsets: np.ndarray) -> np.ndarray:
    """Map uncompressed-stream offsets to BGZF virtual offsets
    ``(coffset << 16) | within_block`` given the block table from
    bgzf.decompress_with_index."""
    blk = np.searchsorted(uoffs, offsets, "right") - 1
    # an offset exactly at the final block boundary maps to the end-of-data
    # sentinel block (uoffs has n_blocks+1 entries, coffs is extended to
    # match by the caller or clamped here)
    blk = np.minimum(blk, coffs.size - 1)
    return ((coffs[blk].astype(np.uint64) << np.uint64(16))
            | (offsets - uoffs[blk]).astype(np.uint64))


def read_bam_indexed(path: str, threads: int = 0):
    """Read a BAM returning (BamFile, vstart, vend) where vstart/vend are
    per-record virtual offsets — the inputs the BAI builder needs."""
    with open(path, "rb") as f:
        comp = f.read()
    raw, coffs, uoffs = bgzf.decompress_with_index(comp, threads=threads)
    # sentinel block at end-of-data so boundary offsets resolve
    coffs = np.append(coffs, len(comp) - len(bgzf.BGZF_EOF)
                      if comp.endswith(bgzf.BGZF_EOF) else len(comp))
    data = np.frombuffer(raw, np.uint8)
    header, off = decode_header(data)
    offs = scan_record_offsets(data, off)
    batch = decode_records(data, off)
    if offs.size:
        sizes = np.diff(np.append(offs, data.size))
        vstart = uoffset_to_voffset(uoffs, coffs, offs)
        rec_end = offs + sizes
        # end offset exactly at a block boundary → voffset of next block
        vend = uoffset_to_voffset(uoffs, coffs, rec_end)
    else:
        vstart = vend = np.empty(0, np.uint64)
    return BamFile(header=header, batch=batch), vstart, vend


def reg2bin(beg: int, end: int) -> int:
    """BAI bin for interval [beg, end) (SAM spec §5.3 algorithm)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def reg2bin_vec(beg: np.ndarray, end: np.ndarray) -> np.ndarray:
    """Vectorized reg2bin."""
    e = end - 1
    out = np.zeros(beg.shape, np.int32)
    done = np.zeros(beg.shape, bool)
    for shift, base in ((14, 4681), (17, 585), (20, 73), (23, 9), (26, 1)):
        hit = (~done) & ((beg >> shift) == (e >> shift))
        out[hit] = base + (beg[hit] >> shift)
        done |= hit
    return out


def encode_header(header: SamHeader) -> bytes:
    text = header.text.encode("latin-1")
    out = [BAM_MAGIC, struct.pack("<i", len(text)), text,
           struct.pack("<i", header.n_refs)]
    for name, ln in zip(header.ref_names, header.ref_lens):
        nb = name.encode("latin-1") + b"\0"
        out.append(struct.pack("<i", len(nb)))
        out.append(nb)
        out.append(struct.pack("<i", ln))
    return b"".join(out)


def encode_records(b: ReadBatch) -> bytes:
    """Vectorized ReadBatch -> raw BAM record stream."""
    n = b.n
    if n == 0:
        return b""
    qname_lens = (b.qname_off[1:] - b.qname_off[:-1]).astype(np.int64)
    n_cigar = b.n_cigar
    l_seq = b.l_qseq
    aux_lens = (b.aux_off[1:] - b.aux_off[:-1]).astype(np.int64)
    seq_bytes = (l_seq + 1) // 2
    block_size = (32 + (qname_lens + 1) + 4 * n_cigar + seq_bytes + l_seq
                  + aux_lens)
    rec_sizes = block_size + 4
    total = int(rec_sizes.sum())
    out = np.zeros(total, np.uint8)
    offs = np.concatenate([[0], np.cumsum(rec_sizes)[:-1]])

    # compute bins from spans
    end = b.pos + np.maximum(b.ref_span(), 1)
    bins = reg2bin_vec(b.pos.astype(np.int64), end.astype(np.int64)).astype(np.uint16)

    fixed = np.zeros(n, dtype=_FIXED)
    fixed["block_size"] = block_size
    fixed["refID"] = b.tid
    fixed["pos"] = b.pos.astype(np.int32)
    fixed["l_read_name"] = (qname_lens + 1).astype(np.uint8)
    fixed["mapq"] = b.mapq
    fixed["bin"] = bins
    fixed["n_cigar_op"] = n_cigar.astype(np.uint16)
    fixed["flag"] = b.flag
    fixed["l_seq"] = l_seq.astype(np.int32)
    fixed["next_refID"] = b.mtid
    fixed["next_pos"] = b.mpos.astype(np.int32)
    fixed["tlen"] = b.tlen.astype(np.int32)
    fb = fixed.view(np.uint8).reshape(n, FIXED_SIZE)
    out[(offs[:, None] + np.arange(FIXED_SIZE))] = fb

    qname_start = offs + FIXED_SIZE
    out[ragged_gather_indices(qname_start, qname_lens)] = b.qname
    # NUL terminators already zero from np.zeros
    cigar_start = qname_start + qname_lens + 1
    cig_u8 = b.cigar.astype("<u4").view(np.uint8)
    out[ragged_gather_indices(cigar_start, 4 * n_cigar)] = cig_u8
    seq_start = cigar_start + 4 * n_cigar
    out[ragged_gather_indices(seq_start, seq_bytes)] = pack_nibbles(b.seq, l_seq)
    qual_start = seq_start + seq_bytes
    out[ragged_gather_indices(qual_start, l_seq)] = b.qual
    aux_start = qual_start + l_seq
    out[ragged_gather_indices(aux_start, aux_lens)] = b.aux
    return out.tobytes()


def write_bam(path: str, header: SamHeader, batch: ReadBatch,
              level: int = 6, threads: int = 0):
    raw = encode_header(header) + encode_records(batch)
    payload = bgzf.compress(raw, level=level, threads=threads)
    with open(path, "wb") as f:
        f.write(payload)
