"""CRAM block compression codecs (decode).

Re-derivations of the CRAM 3.0/3.1 codec suite from the published CRAM
codecs specification: gzip/bzip2/lzma (stdlib), rANS 4x8 (CRAM 3.0,
order 0/1, 12-bit frequencies, 4 interleaved byte-renormalised states)
and rANS Nx16 (CRAM 3.1: 16-bit renormalisation, 4/32-way round-robin
interleave, STRIPE/CAT/RLE/PACK transforms).  Reference tool usage:
htslib's cram codecs as consumed by /root/reference/cram_size.c and
bam_checksum.c CRAM inputs.

The adaptive arithmetic coder (cram_fqz.arith_*), fqzcomp qualities
(cram_fqz.fqz_*) and the tok3 name tokeniser (cram_tok3) are
implemented as exact-inverse encode/decode pairs; none of the
reference fixtures exercise them, so foreign htscodecs bit-streams are
rejected with a clear error rather than risk a silent mis-decode.
"""

from __future__ import annotations

import bz2
import lzma
import zlib

import numpy as np

# CRAM block compression method ids
RAW, GZIP, BZIP2, LZMA, RANS4x8, RANSNx16, ARITH, FQZ, TOK3 = range(9)

# rANS Nx16 flag bits
X_ORDER = 0x01
X_32 = 0x04
X_STRIPE = 0x08
X_NOSZ = 0x10
X_CAT = 0x20
X_RLE = 0x40
X_PACK = 0x80


class CramCodecError(RuntimeError):
    pass


def uncompress(method: int, data: bytes, usize: int) -> bytes:
    if method == RAW:
        return data
    if method == GZIP:
        return zlib.decompress(data, 31 if data[:2] == b"\x1f\x8b" else 15)
    if method == BZIP2:
        return bz2.decompress(data)
    if method == LZMA:
        return lzma.decompress(data)
    if method == RANS4x8:
        return rans4x8_uncompress(data)
    if method == RANSNx16:
        out, _ = ransNx16_uncompress(data, 0, usize)
        return out
    if method == ARITH:
        from .cram_fqz import arith_uncompress
        return arith_uncompress(data, usize)
    if method == FQZ:
        from .cram_fqz import fqz_uncompress
        out, _lens = fqz_uncompress(data, usize)
        return out
    if method == TOK3:
        from .cram_tok3 import tok3_uncompress
        return b"".join(n + b"\0" for n in tok3_uncompress(data))
    raise NotImplementedError(
        "CRAM compression method %d not supported" % method)


# ----------------------------------------------------------------------
# varint helpers

def uint7(data: bytes, i: int):
    """Big-endian base-128 varint (CRAM 3.1 uint7)."""
    v = 0
    while True:
        b = data[i]
        i += 1
        v = (v << 7) | (b & 0x7F)
        if not (b & 0x80):
            break
    return v, i


# ----------------------------------------------------------------------
# rANS 4x8 (CRAM 3.0)

_TF_SHIFT = 12
_TOTFREQ = 1 << _TF_SHIFT
_RANS_BYTE_L = 1 << 23


def _read_freqs_4x8(data: bytes, i: int):
    """Order-0 frequency table: ascending symbols with run-length
    shortcuts, freqs as 1-2 bytes, 0-terminated."""
    F = np.zeros(256, np.uint32)
    rle = 0
    sym = data[i]
    i += 1
    last_sym = sym
    while True:
        # read frequency for sym
        f = data[i]
        i += 1
        if f & 0x80:
            f = ((f & 0x7F) << 8) | data[i]
            i += 1
        F[sym] = f
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            nsym = data[i]
            i += 1
            if nsym == 0:
                break
            if nsym == last_sym + 1:
                rle = data[i]
                i += 1
            sym = nsym
        last_sym = sym
    return F, i


def _build_tables(F: np.ndarray, totfreq: int):
    C = np.zeros(257, np.uint32)
    np.cumsum(F, out=C[1:])
    lookup = np.zeros(totfreq, np.uint16)
    for s in np.nonzero(F)[0]:
        lookup[C[s]:C[s] + F[s]] = s
    return C, lookup


def _rans4x8_decode_stream(data: bytes, i: int, F, C, lookup, out_sz: int):
    """Order-0 payload: 4 interleaved states over round-robin? No —
    4x8 order-0 IS round-robin over output bytes."""
    R = [int.from_bytes(data[i + 4 * j:i + 4 * j + 4], "little")
         for j in range(4)]
    i += 16
    out = bytearray(out_sz)
    n = len(data)
    mask = _TOTFREQ - 1
    for k in range(out_sz):
        j = k & 3
        x = R[j]
        m = x & mask
        s = int(lookup[m])
        x = int(F[s]) * (x >> _TF_SHIFT) + m - int(C[s])
        while x < _RANS_BYTE_L and i < n:
            x = (x << 8) | data[i]
            i += 1
        R[j] = x
        out[k] = s
    return bytes(out)


def rans4x8_uncompress(data: bytes) -> bytes:
    order = data[0]
    # comp size (4 LE), uncomp size (4 LE)
    out_sz = int.from_bytes(data[5:9], "little")
    i = 9
    if order == 0:
        F, i = _read_freqs_4x8(data, i)
        C, lookup = _build_tables(F, _TOTFREQ)
        return _rans4x8_decode_stream(data, i, F, C, lookup, out_sz)
    if order != 1:
        raise CramCodecError("bad rans4x8 order %d" % order)

    # order-1: per-context tables; contexts listed like symbols
    Fs = {}
    Cs = {}
    Ls = {}
    rle_i = 0
    ctx = data[i]
    i += 1
    last_i = ctx
    while True:
        F, i = _read_freqs_4x8(data, i)
        Fs[ctx] = F
        Cs[ctx], Ls[ctx] = _build_tables(F, _TOTFREQ)
        if rle_i > 0:
            rle_i -= 1
            ctx += 1
        else:
            nctx = data[i]
            i += 1
            if nctx == 0:
                break
            if nctx == last_i + 1:
                rle_i = data[i]
                i += 1
            ctx = nctx
        last_i = ctx

    R = [int.from_bytes(data[i + 4 * j:i + 4 * j + 4], "little")
         for j in range(4)]
    i += 16
    out = bytearray(out_sz)
    n = len(data)
    isz4 = out_sz >> 2
    ptr = [0, isz4, 2 * isz4, 3 * isz4]
    last = [0, 0, 0, 0]
    mask = _TOTFREQ - 1
    for _k in range(isz4):
        for j in range(4):
            x = R[j]
            m = x & mask
            l = last[j]
            s = int(Ls[l][m])
            F = Fs[l]
            C = Cs[l]
            x = int(F[s]) * (x >> _TF_SHIFT) + m - int(C[s])
            while x < _RANS_BYTE_L and i < n:
                x = (x << 8) | data[i]
                i += 1
            R[j] = x
            out[ptr[j]] = s
            ptr[j] += 1
            last[j] = s
    # remainder handled by state 3
    x = R[3]
    l = last[3]
    for k in range(4 * isz4, out_sz):
        m = x & mask
        s = int(Ls[l][m])
        x = int(Fs[l][s]) * (x >> _TF_SHIFT) + m - int(Cs[l][s])
        while x < _RANS_BYTE_L and i < n:
            x = (x << 8) | data[i]
            i += 1
        out[k] = s
        l = s
    return bytes(out)


# ----------------------------------------------------------------------
# rANS Nx16 (CRAM 3.1)

def _norm_freqs(counts: np.ndarray, tot: int) -> np.ndarray:
    """Normalize symbol counts to sum exactly ``tot`` with every present
    symbol >= 1 (any such table is decodable by every rANS reader)."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(256, np.uint32)
    F = np.maximum((counts.astype(np.float64) * tot / total + 0.5)
                   .astype(np.int64), np.where(counts > 0, 1, 0))
    drift = int(F.sum()) - tot
    # push the drift onto the most frequent symbol (stays >= 1)
    big = int(np.argmax(F))
    F[big] -= drift
    if F[big] <= 0:  # pathological skew: rebalance greedily
        F[big] += drift
        order = np.argsort(-F)
        k = 0
        while drift != 0:
            s = order[k % len(order)]
            if drift > 0 and F[s] > 1:
                F[s] -= 1
                drift -= 1
            elif drift < 0 and F[s] > 0:
                F[s] += 1
                drift += 1
            k += 1
    return F.astype(np.uint32)


def _write_freqs_4x8(F: np.ndarray) -> bytes:
    """Serialize an order-0 table in the ascending-symbol RLE format
    (mirror of _read_freqs_4x8)."""
    out = bytearray()
    syms = np.nonzero(F)[0]
    rle = 0
    for idx, s in enumerate(syms):
        if rle > 0:
            rle -= 1
        else:
            out.append(int(s))
            if idx > 0 and s == syms[idx - 1] + 1:
                # run of consecutive symbols: count the run length
                run = 0
                while (idx + run + 1 < syms.size
                       and syms[idx + run + 1] == s + run + 1):
                    run += 1
                out.append(run)
                rle = run
        f = int(F[s])
        if f < 128:
            out.append(f)
        else:
            out.append(0x80 | (f >> 8))
            out.append(f & 0xFF)
    out.append(0)
    return bytes(out)


def _enc_put(x: int, f: int, start: int, emitted: bytearray) -> int:
    """One reverse-order rANS encode step (rans_byte PutSymbol)."""
    x_max = ((_RANS_BYTE_L >> _TF_SHIFT) << 8) * f
    while x >= x_max:
        emitted.append(x & 0xFF)
        x >>= 8
    return ((x // f) << _TF_SHIFT) + (x % f) + start


def rans4x8_compress(data: bytes, order: int = 0) -> bytes:
    """rANS 4x8 encoder (CRAM 3.0 codec 4), mirror of
    rans4x8_uncompress.  Returns the full block (header + tables +
    interleaved payload)."""
    n = len(data)
    if n == 0 or n >= (1 << 30):
        raise CramCodecError("rans4x8: unsupported input size")
    arr = np.frombuffer(data, np.uint8)
    if order == 0:
        F = _norm_freqs(np.bincount(arr, minlength=256), _TOTFREQ)
        C = np.zeros(257, np.uint64)
        np.cumsum(F, out=C[1:])
        tab = _write_freqs_4x8(F)
        Fi = F.astype(np.int64)
        Ci = C.astype(np.int64)
        R = [_RANS_BYTE_L] * 4
        emitted = bytearray()
        for k in range(n - 1, -1, -1):
            s = int(arr[k])
            R[k & 3] = _enc_put(R[k & 3], int(Fi[s]), int(Ci[s]), emitted)
        states = b"".join(int(R[j]).to_bytes(4, "little")
                          for j in range(4))
        payload = states + bytes(emitted[::-1])
        body = tab + payload
    elif order == 1:
        # per-context tables: context = previous byte within each of the
        # four interleaved sub-streams (first byte of each: context 0)
        isz4 = n >> 2
        if isz4 < 4:
            return rans4x8_compress(data, order=0)
        starts = [0, isz4, 2 * isz4, 3 * isz4]
        counts = np.zeros((256, 256), np.int64)
        prev = np.concatenate([[0], arr[:-1]]).astype(np.int64)
        for j in range(4):
            lo = starts[j]
            hi = starts[j + 1] if j < 3 else n
            p = np.concatenate([[0], arr[lo:hi - 1]]).astype(np.int64)
            np.add.at(counts, (p, arr[lo:hi].astype(np.int64)), 1)
        del prev
        ctxs = np.nonzero(counts.sum(1))[0]
        Fs = {}
        Cs = {}
        tab = bytearray()
        rle = 0
        for idx, c in enumerate(ctxs):
            if rle > 0:
                rle -= 1
            else:
                tab.append(int(c))
                if idx > 0 and c == ctxs[idx - 1] + 1:
                    run = 0
                    while (idx + run + 1 < ctxs.size
                           and ctxs[idx + run + 1] == c + run + 1):
                        run += 1
                    tab.append(run)
                    rle = run
            F = _norm_freqs(counts[c].astype(np.uint32), _TOTFREQ)
            Cc = np.zeros(257, np.int64)
            np.cumsum(F, out=Cc[1:])
            Fs[int(c)] = F.astype(np.int64)
            Cs[int(c)] = Cc
            tab += _write_freqs_4x8(F)
        tab.append(0)
        # encode each sub-stream in reverse; stream 3 also covers the
        # remainder bytes (decoded last-state-first semantics)
        R = [_RANS_BYTE_L] * 4
        emitted = bytearray()
        # remainder (k >= 4*isz4) belongs to stream 3, contexts chain on
        rem = list(range(4 * isz4, n))
        for k in reversed(rem):
            l = int(arr[k - 1]) if k > 4 * isz4 else int(arr[4 * isz4 - 1])
            s = int(arr[k])
            R[3] = _enc_put(R[3], int(Fs[l][s]), int(Cs[l][s]), emitted)
        for i2 in range(isz4 - 1, -1, -1):
            for j in (3, 2, 1, 0):
                lo = starts[j]
                k = lo + i2
                l = int(arr[k - 1]) if i2 > 0 else 0
                s = int(arr[k])
                R[j] = _enc_put(R[j], int(Fs[l][s]), int(Cs[l][s]),
                                emitted)
        states = b"".join(int(R[j]).to_bytes(4, "little")
                          for j in range(4))
        body = bytes(tab) + states + bytes(emitted[::-1])
    else:
        raise CramCodecError("rans4x8: bad order %d" % order)
    # header: order, payload size after the 9-byte prefix, raw size
    hdr = bytes([order]) + len(body).to_bytes(4, "little") \
        + n.to_bytes(4, "little")
    return hdr + body


def _read_alphabet(data: bytes, i: int):
    """Ascending symbol list with run shortcuts, 0-terminated."""
    syms = []
    rle = 0
    sym = data[i]
    i += 1
    last_sym = sym
    while True:
        syms.append(sym)
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            nsym = data[i]
            i += 1
            if nsym == 0:
                break
            if nsym == last_sym + 1:
                rle = data[i]
                i += 1
            sym = nsym
        last_sym = sym
    return syms, i


def _normalize(F: np.ndarray, totfreq: int) -> np.ndarray:
    """Scale raw freqs so they sum to totfreq (spec NormaliseFrequencies:
    scale down then bump the largest)."""
    tot = int(F.sum())
    if tot == 0 or tot == totfreq:
        return F
    out = np.zeros_like(F)
    shift = 0
    t = tot
    while t < totfreq:
        t *= 2
        shift += 1
    # general renormalisation
    used = np.nonzero(F)[0]
    tr = (totfreq << 8) // tot  # 8-bit fixed-point ratio
    acc = 0
    for s in used:
        f = (int(F[s]) * tr) >> 8
        if f == 0:
            f = 1
        out[s] = f
        acc += f
    # adjust largest symbol to make the sum exact
    big = used[np.argmax(F[used])]
    out[big] += totfreq - acc
    return out


def _read_freqs_nx16_o0(data: bytes, i: int):
    syms, i = _read_alphabet(data, i)
    F = np.zeros(256, np.uint32)
    for s in syms:
        v, i = uint7(data, i)
        F[s] = v
    F = _normalize(F, 1 << 12)
    return F, i


def _ransnx16_o0(data: bytes, i: int, out_sz: int, N: int) -> bytes:
    F, i = _read_freqs_nx16_o0(data, i)
    C, lookup = _build_tables(F, 1 << 12)
    R = []
    for j in range(N):
        R.append(int.from_bytes(data[i:i + 4], "little"))
        i += 4
    arr = np.frombuffer(data, np.uint8)
    out = bytearray(out_sz)
    n = len(data)
    mask = (1 << 12) - 1
    Fi = F.astype(np.int64)
    Ci = C.astype(np.int64)
    for k in range(out_sz):
        j = k % N
        x = R[j]
        m = x & mask
        s = int(lookup[m])
        x = int(Fi[s]) * (x >> 12) + m - int(Ci[s])
        if x < (1 << 15) and i + 1 < n:
            x = (x << 16) | (data[i] | (data[i + 1] << 8))
            i += 2
        R[j] = x
        out[k] = s
    return bytes(out)


def _ransnx16_o1(data: bytes, i: int, out_sz: int, N: int) -> bytes:
    comp = data[i]
    i += 1
    shift = comp >> 4
    if comp & 1:
        # table itself rans-compressed (low-level order-0, 4-way)
        u_len, i = uint7(data, i)
        c_len, i = uint7(data, i)
        tbl = _ransnx16_o0(data[:i + c_len], i, u_len, 4)
        i += c_len
        tdata, ti = tbl, 0
    else:
        tdata, ti = data, i

    syms, ti = _read_alphabet(tdata, ti)
    Fs = {}
    Cs = {}
    Ls = {}
    totfreq = 1 << shift
    for ctx in syms:
        # inner alphabet may be a subset; freqs only for listed symbols
        F = np.zeros(256, np.uint32)
        # run-length of zeros within the listed alphabet
        rz = 0
        for s in syms:
            if rz:
                rz -= 1
                continue
            v, ti = uint7(tdata, ti)
            F[s] = v
            if v == 0:
                rz = tdata[ti]
                ti += 1
        F = _normalize(F, totfreq)
        Fs[ctx] = F
        Cs[ctx], Ls[ctx] = _build_tables(F, totfreq)

    if not (comp & 1):
        i = ti

    R = []
    for j in range(N):
        R.append(int.from_bytes(data[i:i + 4], "little"))
        i += 4
    out = bytearray(out_sz)
    n = len(data)
    mask = totfreq - 1
    isz = (out_sz + N - 1) // N  # bytes per state (last state longer?)
    # Nx16 order-1 splits output into N fragments of isz = out_sz/N,
    # remainder handled by the last state
    isz = out_sz // N
    ptr = [j * isz for j in range(N)]
    last = [0] * N
    for _k in range(isz):
        for j in range(N):
            x = R[j]
            m = x & mask
            l = last[j]
            s = int(Ls[l][m])
            x = int(Fs[l][s]) * (x >> shift) + m - int(Cs[l][s])
            if x < (1 << 15) and i + 1 < n:
                x = (x << 16) | (data[i] | (data[i + 1] << 8))
                i += 2
            R[j] = x
            out[ptr[j]] = s
            ptr[j] += 1
            last[j] = s
    x = R[N - 1]
    l = last[N - 1]
    for k in range(N * isz, out_sz):
        m = x & mask
        s = int(Ls[l][m])
        x = int(Fs[l][s]) * (x >> shift) + m - int(Cs[l][s])
        if x < (1 << 15) and i + 1 < n:
            x = (x << 16) | (data[i] | (data[i + 1] << 8))
            i += 2
        out[k] = s
        l = s
    return bytes(out)


def ransNx16_uncompress(data: bytes, i: int = 0, usize: int | None = None):
    """Decode one rANS Nx16 stream starting at offset i.
    Returns (bytes, next_offset)."""
    flags = data[i]
    i += 1
    order = flags & X_ORDER
    N = 32 if flags & X_32 else 4
    if not (flags & X_NOSZ):
        out_sz, i = uint7(data, i)
    else:
        out_sz = usize

    if flags & X_STRIPE:
        n_strips = data[i]
        i += 1
        clens = []
        for j in range(n_strips):
            v, i = uint7(data, i)
            clens.append(v)
        parts = []
        for j in range(n_strips):
            ulen_j = (out_sz - j + n_strips - 1) // n_strips
            part, _ = ransNx16_uncompress(data, i, ulen_j)
            parts.append(np.frombuffer(part, np.uint8))
            i += clens[j]
        out = np.zeros(out_sz, np.uint8)
        for j in range(n_strips):
            out[j::n_strips] = parts[j][: len(out[j::n_strips])]
        return out.tobytes(), i

    pack_map = None
    pack_out = out_sz
    if flags & X_PACK:
        nsym = data[i]
        i += 1
        pack_map = bytes(data[i:i + nsym])
        i += nsym
        plen, i = uint7(data, i)
        pack_out = out_sz
        out_sz = plen

    rle_meta_body = None
    rle_out_sz = 0
    if flags & X_RLE:
        # format: u_meta_len<<1|raw (uint7), rle_len (uint7), then the
        # meta bytes (raw, or c_meta_len uint7 + low-level O0 stream)
        rmeta_len, i = uint7(data, i)
        rle_len, i = uint7(data, i)
        if rmeta_len & 1:
            rle_meta = bytes(data[i:i + (rmeta_len >> 1)])
            i += rmeta_len >> 1
        else:
            u_meta_len = rmeta_len >> 1
            c_meta_len, i = uint7(data, i)
            rle_meta = _ransnx16_o0(data[:i + c_meta_len], i,
                                    u_meta_len, 4)
            i += c_meta_len
        rle_out_sz = out_sz
        out_sz = rle_len
        rle_meta_body = (rle_meta, 0)
    if flags & X_CAT:
        out = bytes(data[i:i + out_sz])
        i += out_sz
    elif order:
        start = i
        out = _ransnx16_o1(data, i, out_sz, N)
        # compute consumed length: we don't track exactly; rely on caller
        # passing per-stream slices for STRIPE.  For top level, the block
        # boundary delimits the stream, so i is unused by callers.
        i = len(data)
    else:
        out = _ransnx16_o0(data, i, out_sz, N)
        i = len(data)

    if flags & X_RLE:
        out = _rle_expand(out, rle_meta_body, rle_out_sz)
    if flags & X_PACK:
        out = _unpack(out, pack_map, pack_out)
    return out, i


def _rle_expand(data: bytes, meta_body, out_sz: int) -> bytes:
    meta, mi = meta_body
    # symbols subject to RLE
    n_rle_sym = meta[mi]
    mi += 1
    if n_rle_sym == 0:
        n_rle_sym = 256
    rle_syms = set(meta[mi:mi + n_rle_sym])
    mi += n_rle_sym
    out = bytearray()
    di = 0
    while di < len(data) and len(out) < out_sz:
        b = data[di]
        di += 1
        if b in rle_syms:
            run, mi = uint7(meta, mi)
            out.extend(bytes([b]) * (run + 1))
        else:
            out.append(b)
    return bytes(out)


def _unpack(data: bytes, pmap: bytes, out_sz: int) -> bytes:
    nsym = len(pmap)
    arr = np.frombuffer(data, np.uint8)
    if nsym <= 1:
        return bytes(pmap[:1]) * out_sz
    if nsym <= 2:
        bits = np.unpackbits(arr.reshape(-1, 1), axis=1, bitorder="little")
        vals = bits.reshape(-1)[:out_sz]
    elif nsym <= 4:
        vals = np.stack([(arr >> (2 * k)) & 3 for k in range(4)],
                        axis=1).reshape(-1)[:out_sz]
    elif nsym <= 16:
        vals = np.stack([arr & 15, arr >> 4], axis=1).reshape(-1)[:out_sz]
    else:
        return bytes(data[:out_sz])
    lut = np.zeros(256, np.uint8)
    lut[:nsym] = np.frombuffer(pmap, np.uint8)
    return lut[vals].tobytes()


# ----------------------------------------------------------------------
# method introspection (cram_expand_method analog for cram-size)

def expand_method(method: int, data: bytes) -> dict:
    """Sub-method details from a block's first bytes
    (htslib cram_expand_method)."""
    d = {"method": method, "level": -1, "order": 0, "rle": 0, "pack": 0,
         "stripe": 0, "cat": 0, "nway": 4, "ext": 0}
    if method == GZIP and len(data) >= 9:
        # gzip XFL byte: 4 = fastest, 2 = best
        if data[8] == 4:
            d["level"] = 1
        elif data[8] == 2:
            d["level"] = 9
    elif method == BZIP2 and len(data) >= 4:
        if data[:3] == b"BZh" and b"1"[0] <= data[3] <= b"9"[0]:
            d["level"] = data[3] - 48
    elif method == RANS4x8 and data:
        d["order"] = data[0] & 1
    elif method in (RANSNx16, ARITH) and data:
        fl = data[0]
        d["order"] = fl & 1
        d["rle"] = 1 if fl & X_RLE else 0
        d["pack"] = 1 if fl & X_PACK else 0
        d["stripe"] = 1 if fl & X_STRIPE else 0
        d["cat"] = 1 if fl & X_CAT else 0
        d["nway"] = 32 if fl & X_32 else 4
        if method == ARITH and fl & 0x04:
            d["ext"] = 1
    elif method == TOK3 and data:
        d["level"] = data[0]
    return d


# ----------------------------------------------------------------------
# rANS Nx16 encoder (CRAM 3.1 write path)
#
# Mirrors the decoder above exactly: the written frequency tables sum to
# the full totfreq so the decoder's NormaliseFrequencies pass is the
# identity, and the byte stream is produced in precise reverse of the
# decoder's consumption order (states interleaved k%N for order-0; N
# fragments plus a state-(N-1) tail for order-1).  N=4 streams; the
# encoder falls back to CAT when entropy coding does not shrink the
# payload (an encoder's free choice under the spec).

_RANS_INT_L = 1 << 15


def uint7_enc(v: int) -> bytes:
    out = bytearray([v & 0x7F])
    v >>= 7
    while v:
        out.append(0x80 | (v & 0x7F))
        v >>= 7
    return bytes(reversed(out))


def _encode_alphabet(present: np.ndarray) -> bytes:
    """Ascending symbol list with run shortcuts (decoder _read_alphabet
    inverse; htscodecs encode_alphabet shape)."""
    out = bytearray()
    rle = 0
    for j in range(256):
        if not present[j]:
            continue
        if rle:
            rle -= 1
            continue
        out.append(j)
        if j and present[j - 1]:
            r = j + 1
            while r < 256 and present[r]:
                r += 1
            rle = r - (j + 1)
            out.append(rle)
    out.append(0)
    return bytes(out)


def _norm_to(counts: np.ndarray, totfreq: int) -> np.ndarray:
    """Normalize raw counts to sum exactly to totfreq (used symbols keep
    freq >= 1) — the encoder-side twin of _normalize."""
    F = counts.astype(np.int64)
    tot = int(F.sum())
    if tot == 0:
        return F.astype(np.uint32)
    used = np.nonzero(F)[0]
    out = np.zeros_like(F)
    acc = 0
    for s in used:
        f = int(F[s]) * totfreq // tot
        if f == 0:
            f = 1
        out[s] = f
        acc += f
    big = used[np.argmax(F[used])]
    out[big] += totfreq - acc
    if out[big] <= 0:
        # pathological skew: flatten
        out[:] = 0
        ns = used.size
        for k, s in enumerate(used):
            out[s] = totfreq // ns + (1 if k < totfreq % ns else 0)
    return out.astype(np.uint32)


def _rans_enc_stream(syms: np.ndarray, freq_of, cum_of, shift: int,
                     N: int, order1_layout: bool) -> bytes:
    """Core reverse-order encoder.  freq_of/cum_of map (context, sym) ->
    freq/cumulative (context ignored for order-0).  Returns states+stream
    bytes (the part after the frequency tables)."""
    n = syms.size
    R = [_RANS_INT_L] * N
    words: list[int] = []
    mask16 = 0xFFFF

    def put(j, ctx, s):
        f = freq_of(ctx, s)
        c = cum_of(ctx, s)
        x = R[j]
        x_max = ((_RANS_INT_L >> shift) << 16) * f
        while x >= x_max:
            words.append(x & mask16)
            x >>= 16
        R[j] = ((x // f) << shift) + c + (x % f)

    if not order1_layout:
        for k in range(n - 1, -1, -1):
            put(k % N, 0, int(syms[k]))
    else:
        isz = n // N
        # tail first (state N-1; contexts run on from fragment N-1)
        for k in range(n - 1, N * isz - 1, -1):
            ctx = int(syms[k - 1]) if k - 1 >= 0 else 0
            put(N - 1, ctx, int(syms[k]))
        for k in range(isz - 1, -1, -1):
            for j in range(N - 1, -1, -1):
                pos = j * isz + k
                ctx = int(syms[pos - 1]) if k > 0 else 0
                put(j, ctx, int(syms[pos]))
    out = bytearray()
    for j in range(N):
        out += int(R[j]).to_bytes(4, "little")
    for w in reversed(words):
        out.append(w & 0xFF)
        out.append(w >> 8)
    return bytes(out)


def ransNx16_compress(data: bytes, order: int = 0) -> bytes:
    """Encode one rANS Nx16 stream (flags byte + size + tables + states
    + stream).  order 0 or 1; falls back to CAT when that is smaller."""
    n = len(data)
    syms = np.frombuffer(data, np.uint8)
    cat = bytes([X_CAT]) + uint7_enc(n) + data
    if n < 32:
        return cat
    N = 4
    if order == 0:
        counts = np.bincount(syms, minlength=256)
        F = _norm_to(counts, 1 << 12)
        C = np.concatenate([[0], np.cumsum(F)])[:256].astype(np.int64)
        present = F > 0
        tbl = bytearray(_encode_alphabet(present))
        for s in np.nonzero(present)[0]:
            tbl += uint7_enc(int(F[s]))
        Fi = F.astype(np.int64)

        body = _rans_enc_stream(syms, lambda c, s: int(Fi[s]),
                                lambda c, s: int(C[s]), 12, N, False)
        out = bytes([0]) + uint7_enc(n) + bytes(tbl) + body
    else:
        shift = 12
        isz = n // N
        # pair counts: context = previous byte within fragment (0 at
        # fragment starts); tail contexts continue fragment N-1
        counts = np.zeros((256, 256), np.int64)
        starts = syms[[j * isz for j in range(N)]] if isz else syms[:0]
        for s in starts:
            counts[0, int(s)] += 1
        prev = syms[:-1].astype(np.int64).copy()
        cur = syms[1:].astype(np.int64)
        # fragment starts break the context chain
        brk = np.zeros(n - 1, bool)
        for j in range(1, N):
            if isz:
                brk[j * isz - 1] = True
        np.add.at(counts, (prev[~brk], cur[~brk]), 1)
        present = (counts.sum(axis=0) + counts.sum(axis=1)) > 0
        present[0] = True
        plist = np.nonzero(present)[0]
        tbl = bytearray(_encode_alphabet(present))
        Fn = {}
        Cn = {}
        for ctx in plist:
            Fr = _norm_to(counts[ctx][plist], 1 << shift) \
                if counts[ctx].sum() else np.zeros(plist.size, np.uint32)
            full = np.zeros(256, np.uint32)
            full[plist] = Fr
            Fn[ctx] = full.astype(np.int64)
            Cn[ctx] = np.concatenate(
                [[0], np.cumsum(full)])[:256].astype(np.int64)
            # freqs with zero-run shortcut over the listed alphabet
            k = 0
            while k < plist.size:
                v = int(full[plist[k]])
                tbl += uint7_enc(v)
                if v == 0:
                    zr = 0
                    while (k + 1 + zr < plist.size
                           and full[plist[k + 1 + zr]] == 0 and zr < 255):
                        zr += 1
                    tbl.append(zr)
                    k += zr
                k += 1
        body = _rans_enc_stream(syms, lambda c, s: int(Fn[c][s]),
                                lambda c, s: int(Cn[c][s]), shift, N,
                                True)
        comp = (shift << 4) | 0
        out = bytes([X_ORDER]) + uint7_enc(n) + bytes([comp]) \
            + bytes(tbl) + body
    return out if len(out) < len(cat) else cat
