"""Columnar structure-of-arrays alignment-record batches.

The central data structure of the framework.  Where the reference keeps one
heap-allocated ``bam1_t`` per record and iterates (htslib's pull model), we
keep a whole batch of records as dense numpy columns so that

* fixed-width fields feed straight into JAX device arrays (flagstat, sort
  keys, filter predicates), and
* ragged payloads (cigar/seq/qual/aux) live in flat arrays + ``int64``
  offset vectors, amenable to vectorized expansion (pileup scatter).

Offsets arrays have length ``n+1`` with ``off[0] == 0``; the slice for record
``i`` is ``flat[off[i]:off[i+1]]``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
import numpy as np


def empty_offsets() -> np.ndarray:
    return np.zeros(1, dtype=np.int64)


@dataclass
class ReadBatch:
    """A batch of alignment records in columnar (SoA) form.

    Field semantics match the BAM on-disk record (SAM spec §4.2): ``pos`` is
    0-based, ``tid``/``mtid`` are reference indexes (-1 = unmapped), ``seq``
    holds one 4-bit nt16 code per base (unpacked, one byte each), ``qual`` is
    raw phred (0xFF = absent), ``cigar`` packs ``len<<4 | op``.
    """

    n: int = 0
    # fixed-width columns
    tid: np.ndarray = field(default_factory=lambda: np.empty(0, np.int32))
    pos: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    mapq: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint8))
    flag: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint16))
    mtid: np.ndarray = field(default_factory=lambda: np.empty(0, np.int32))
    mpos: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    tlen: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    # ragged columns: flat + offsets(n+1)
    qname: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint8))
    qname_off: np.ndarray = field(default_factory=empty_offsets)
    cigar: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint32))
    cigar_off: np.ndarray = field(default_factory=empty_offsets)
    seq: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint8))
    seq_off: np.ndarray = field(default_factory=empty_offsets)
    qual: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint8))
    aux: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint8))
    aux_off: np.ndarray = field(default_factory=empty_offsets)

    # ------------------------------------------------------------------ info
    def __len__(self) -> int:
        return self.n

    @property
    def l_qseq(self) -> np.ndarray:
        return (self.seq_off[1:] - self.seq_off[:-1]).astype(np.int64)

    @property
    def n_cigar(self) -> np.ndarray:
        return (self.cigar_off[1:] - self.cigar_off[:-1]).astype(np.int64)

    def qname_str(self, i: int) -> str:
        return bytes(self.qname[self.qname_off[i]:self.qname_off[i + 1]]).decode()

    def cigar_of(self, i: int) -> np.ndarray:
        return self.cigar[self.cigar_off[i]:self.cigar_off[i + 1]]

    def seq_of(self, i: int) -> np.ndarray:
        return self.seq[self.seq_off[i]:self.seq_off[i + 1]]

    def qual_of(self, i: int) -> np.ndarray:
        return self.qual[self.seq_off[i]:self.seq_off[i + 1]]

    def aux_of(self, i: int) -> np.ndarray:
        return self.aux[self.aux_off[i]:self.aux_off[i + 1]]

    # ------------------------------------------------------- derived columns
    def ref_span(self) -> np.ndarray:
        """Reference bases consumed per record (vectorized over the batch).

        Equivalent of htslib's bam_cigar2rlen per record: sum of lens of ops
        in {M, D, N, =, X}.
        """
        if self.n == 0:
            return np.zeros(0, np.int64)
        ops = (self.cigar & 0xF).astype(np.int64)
        lens = (self.cigar >> 4).astype(np.int64)
        consumes_ref = np.array([1, 0, 1, 1, 0, 0, 0, 1, 1, 0], np.int64)
        contrib = lens * consumes_ref[ops]
        csum = np.concatenate([[0], np.cumsum(contrib)])
        spans = csum[self.cigar_off[1:]] - csum[self.cigar_off[:-1]]
        # unmapped / cigar-less records span 0 (callers may treat as 1)
        return spans

    def end_pos(self) -> np.ndarray:
        """0-based exclusive reference end per record (bam_endpos semantics:
        unmapped or cigar-less mapped records get pos+1)."""
        spans = self.ref_span()
        spans = np.where(spans > 0, spans, 1)
        return self.pos + spans

    # ------------------------------------------------------------ selection
    ALL_RAGGED = ("qname", "cigar", "seq", "qual", "aux")

    def take(self, idx: np.ndarray,
             ragged: tuple = ALL_RAGGED) -> "ReadBatch":
        """Gather a new batch of the given record indices (in given order).

        ``ragged`` selects which ragged flats to materialize — offsets are
        always correct (so ``l_qseq``/``n_cigar`` work), but unlisted
        flats come back empty.  Gathering only what a kernel consumes
        skips hundreds of MB of seq/qual copies on 30x batches.
        """
        idx = np.asarray(idx, dtype=np.int64)
        want = set(ragged)
        out = ReadBatch(n=int(idx.size))
        for f in ("tid", "pos", "mapq", "flag", "mtid", "mpos", "tlen"):
            setattr(out, f, getattr(self, f)[idx])
        native = _native_gather()
        for flat, off in (("qname", "qname_off"), ("cigar", "cigar_off"),
                          ("seq", "seq_off"), ("aux", "aux_off")):
            soff = getattr(self, off)
            lens = soff[idx + 1] - soff[idx]
            noff = np.zeros(idx.size + 1, np.int64)
            np.cumsum(lens, out=noff[1:])
            setattr(out, off, noff)
            need_flat = flat in want
            need_qual = flat == "seq" and "qual" in want
            if not (need_flat or need_qual):
                setattr(out, flat, np.empty(0, getattr(self, flat).dtype))
                if flat == "seq":
                    out.qual = np.empty(0, np.uint8)
                continue
            src = getattr(self, flat)
            total = int(noff[-1])
            if native is not None:
                # per-row memcpy gather (no payload-sized index arrays)
                if need_flat and src.size:
                    setattr(out, flat, native(src, soff, idx, noff,
                                              total))
                else:
                    setattr(out, flat, np.empty(0, src.dtype))
                if flat == "seq":
                    out.qual = (native(self.qual, soff, idx, noff, total)
                                if need_qual and self.qual.size
                                else np.empty(0, np.uint8))
                continue
            gather = ragged_gather_indices(soff[idx], lens)
            setattr(out, flat,
                    src[gather] if need_flat and src.size
                    else np.empty(0, src.dtype))
            if flat == "seq":
                out.qual = (self.qual[gather]
                            if need_qual and self.qual.size
                            else np.empty(0, np.uint8))
        return out

    @staticmethod
    def concat(batches: list["ReadBatch"]) -> "ReadBatch":
        batches = [b for b in batches if b.n > 0]
        if not batches:
            return ReadBatch()
        out = ReadBatch(n=sum(b.n for b in batches))
        for f in ("tid", "pos", "mapq", "flag", "mtid", "mpos", "tlen",
                  "qname", "cigar", "seq", "qual", "aux"):
            setattr(out, f, np.concatenate([getattr(b, f) for b in batches]))
        for off in ("qname_off", "cigar_off", "seq_off", "aux_off"):
            parts = [np.zeros(1, np.int64)]
            base = 0
            for b in batches:
                o = getattr(b, off)
                parts.append(o[1:] + base)
                base += int(o[-1])
            setattr(out, off, np.concatenate(parts))
        return out


_NATIVE_GATHER = False


def _native_gather():
    """The C++ ragged row gather when available (lazy, cached)."""
    global _NATIVE_GATHER
    if _NATIVE_GATHER is False:
        try:
            from ..io import native
            _NATIVE_GATHER = (native.ragged_gather
                              if native.has_ragged_gather() else None)
        except Exception:
            _NATIVE_GATHER = None
    return _NATIVE_GATHER


def ragged_gather_indices(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat gather indices for ragged slices: concat(arange(s, s+l))."""
    starts = np.asarray(starts, np.int64)
    lens = np.asarray(lens, np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    # classic repeat/cumsum trick, no Python loop: within a slice step +1,
    # at each slice boundary jump to the next slice's start.
    nonzero = lens > 0
    starts_nz = starts[nonzero]
    lens_nz = lens[nonzero]
    ends_nz = np.cumsum(lens_nz)
    # int32 halves the memory traffic of the two passes when every
    # produced index fits (the common case: flats well under 2^31)
    mx = int((starts_nz + lens_nz).max())
    dt = np.int32 if (mx < (1 << 31) - 1
                      and int(starts_nz.min()) >= 0) else np.int64
    out = np.ones(total, dt)
    out[0] = starts_nz[0]
    out[ends_nz[:-1]] = (starts_nz[1:]
                         - (starts_nz[:-1] + lens_nz[:-1] - 1)).astype(dt)
    return np.cumsum(out)
