"""BAM auxiliary-field (tag) encoding/decoding.

Layout per SAM spec §4.2.4: tag[2] type[1] value; types A c C s S i I f d Z H
B (B = subtype + count + array).  SAM text renders all integer types as ``i``.

Reference analog: htslib's bam_aux_* family (used all over /root/reference,
e.g. sam_view.c's tag filters).
"""

from __future__ import annotations

import struct
import numpy as np

_INT_TYPES = {
    ord("c"): (1, "<b"), ord("C"): (1, "<B"),
    ord("s"): (2, "<h"), ord("S"): (2, "<H"),
    ord("i"): (4, "<i"), ord("I"): (4, "<I"),
}
_B_SIZES = {ord("c"): 1, ord("C"): 1, ord("s"): 2, ord("S"): 2,
            ord("i"): 4, ord("I"): 4, ord("f"): 4}
_B_FMTS = {ord("c"): "b", ord("C"): "B", ord("s"): "h", ord("S"): "H",
           ord("i"): "i", ord("I"): "I", ord("f"): "f"}


class AuxError(ValueError):
    pass


def skip_one(buf: bytes | np.ndarray, i: int) -> int:
    """Return offset just past the aux field starting at i (at its tag)."""
    t = buf[i + 2]
    j = i + 3
    if t == ord("A"):
        return j + 1
    if t in _INT_TYPES:
        return j + _INT_TYPES[t][0]
    if t == ord("f"):
        return j + 4
    if t == ord("d"):
        return j + 8
    if t in (ord("Z"), ord("H")):
        while j < len(buf) and buf[j] != 0:
            j += 1
        return j + 1
    if t == ord("B"):
        sub = buf[j]
        n = int.from_bytes(bytes(buf[j + 1:j + 5]), "little")
        return j + 5 + n * _B_SIZES[sub]
    raise AuxError(f"unknown aux type {chr(t)!r}")


def iter_tags(buf):
    """Yield (tag:str, type_char:str, start, end) for each aux field."""
    i = 0
    n = len(buf)
    while i + 3 <= n:
        end = skip_one(buf, i)
        yield (chr(buf[i]) + chr(buf[i + 1]), chr(buf[i + 2]), i, end)
        i = end


def find_tag(buf, tag: str):
    """Return (start, end) span of tag, or None."""
    t0, t1 = ord(tag[0]), ord(tag[1])
    i = 0
    n = len(buf)
    while i + 3 <= n:
        end = skip_one(buf, i)
        if buf[i] == t0 and buf[i + 1] == t1:
            return i, end
        i = end
    return None


def get_value(buf, tag: str):
    """(type_char, decoded value) of tag, or None if absent."""
    span = find_tag(buf, tag)
    if span is None:
        return None
    return chr(buf[span[0] + 2]), decode_value(buf, span[0])


def decode_value(buf, i: int):
    b = bytes(buf[i:skip_one(buf, i)])
    t = b[2]
    body = b[3:]
    if t == ord("A"):
        return chr(body[0])
    if t in _INT_TYPES:
        return struct.unpack(_INT_TYPES[t][1], body)[0]
    if t == ord("f"):
        return struct.unpack("<f", body)[0]
    if t == ord("d"):
        return struct.unpack("<d", body)[0]
    if t in (ord("Z"), ord("H")):
        return body[:-1].decode("latin-1")
    if t == ord("B"):
        sub = body[0]
        n = struct.unpack("<I", body[1:5])[0]
        fmt = "<" + _B_FMTS[sub] * n
        return (chr(sub), list(struct.unpack(fmt, body[5:5 + n * _B_SIZES[sub]])))
    raise AuxError(f"unknown aux type {chr(t)!r}")


def _fmt_float(x: float) -> str:
    """htslib renders floats with %g."""
    return "%g" % x


def field_to_sam(buf, i: int) -> str:
    """One aux field -> SAM text ``TAG:T:VALUE``."""
    end = skip_one(buf, i)
    tag = chr(buf[i]) + chr(buf[i + 1])
    t = buf[i + 2]
    v = decode_value(buf, i)
    if t == ord("A"):
        return f"{tag}:A:{v}"
    if t in _INT_TYPES:
        return f"{tag}:i:{v}"
    if t == ord("f"):
        return f"{tag}:f:{_fmt_float(v)}"
    if t == ord("d"):
        return f"{tag}:d:{_fmt_float(v)}"
    if t == ord("Z"):
        return f"{tag}:Z:{v}"
    if t == ord("H"):
        return f"{tag}:H:{v}"
    if t == ord("B"):
        sub, vals = v
        if sub == "f":
            body = ",".join(_fmt_float(x) for x in vals)
        else:
            body = ",".join(str(x) for x in vals)
        return f"{tag}:B:{sub}" + ("," + body if vals else "")
    raise AuxError(f"unknown aux type {chr(t)!r}")


def aux_to_sam_fields(buf) -> list[str]:
    out = []
    i = 0
    n = len(buf)
    while i + 3 <= n:
        out.append(field_to_sam(buf, i))
        i = skip_one(buf, i)
    return out


def _best_int_type(v: int) -> tuple[str, str]:
    """Smallest BAM int type for a SAM `i` value (htslib picks the smallest
    fitting type when converting SAM->BAM)."""
    if v >= 0:
        if v <= 0xFF:
            return "C", "<B"
        if v <= 0xFFFF:
            return "S", "<H"
        if v <= 0xFFFFFFFF:
            return "I", "<I"
    else:
        if v >= -0x80:
            return "c", "<b"
        if v >= -0x8000:
            return "s", "<h"
        if v >= -0x80000000:
            return "i", "<i"
    raise AuxError(f"integer aux value out of range: {v}")


def sam_field_to_aux(field: str) -> bytes:
    """SAM text aux field -> BAM bytes."""
    if len(field) < 5 or field[2] != ":" or field[4] != ":":
        raise AuxError(f"malformed aux field: {field!r}")
    tag = field[:2].encode("latin-1")
    t = field[3]
    val = field[5:]
    if t == "A":
        return tag + b"A" + val[:1].encode("latin-1")
    if t in "iIcCsS":
        # SAM text ints may carry any integer type letter; htslib stores
        # the smallest fitting type and renders back as 'i'
        tc, fmt = _best_int_type(int(val))
        return tag + tc.encode() + struct.pack(fmt, int(val))
    if t == "f":
        return tag + b"f" + struct.pack("<f", float(val))
    if t == "d":
        return tag + b"d" + struct.pack("<d", float(val))
    if t == "Z":
        return tag + b"Z" + val.encode("latin-1") + b"\0"
    if t == "H":
        return tag + b"H" + val.encode("latin-1") + b"\0"
    if t == "B":
        parts = val.split(",")
        sub = parts[0]
        vals = parts[1:]
        if sub == "f":
            data = struct.pack("<%df" % len(vals), *[float(x) for x in vals])
        else:
            data = struct.pack("<%d%s" % (len(vals), _B_FMTS[ord(sub)]),
                               *[int(x) for x in vals])
        return tag + b"B" + sub.encode() + struct.pack("<I", len(vals)) + data
    raise AuxError(f"unknown SAM aux type {t!r}")


def delete_tags(buf: np.ndarray, tags: set[str]) -> np.ndarray:
    """Return aux bytes with the given tags removed."""
    keep = []
    for tag, _t, s, e in iter_tags(buf):
        if tag not in tags:
            keep.append(buf[s:e])
    if not keep:
        return np.empty(0, np.uint8)
    return np.concatenate(keep)


def keep_tags(buf: np.ndarray, tags: set[str]) -> np.ndarray:
    keep = []
    for tag, _t, s, e in iter_tags(buf):
        if tag in tags:
            keep.append(buf[s:e])
    if not keep:
        return np.empty(0, np.uint8)
    return np.concatenate(keep)


def update_str_tag(buf: np.ndarray, tag: str, value: str) -> np.ndarray:
    """htslib bam_aux_update_str semantics: replace an existing tag in
    place (preserving its position) or append at the end."""
    blob = np.frombuffer(tag.encode() + b"Z" + value.encode("latin-1")
                         + b"\0", np.uint8)
    span = find_tag(buf, tag)
    if span is None:
        return np.concatenate([np.asarray(buf, np.uint8), blob])
    s, e = span
    return np.concatenate([np.asarray(buf[:s], np.uint8), blob,
                           np.asarray(buf[e:], np.uint8)])


def update_int_tag(buf: np.ndarray, tag: str, value: int) -> np.ndarray:
    """bam_aux_update_int analog (smallest fitting type; replaces in
    place)."""
    tc, fmt = _best_int_type(int(value))
    blob = np.frombuffer(tag.encode() + tc.encode()
                         + struct.pack(fmt, int(value)), np.uint8)
    span = find_tag(buf, tag)
    if span is None:
        return np.concatenate([np.asarray(buf, np.uint8), blob])
    s, e = span
    return np.concatenate([np.asarray(buf[:s], np.uint8), blob,
                           np.asarray(buf[e:], np.uint8)])


# ----------------------------------------------------------- batch helpers

def batch_tag_values(batch, tag: str):
    """Object array: decoded value of ``tag`` per record (None if absent).
    Per-record loop on the host (a native fast path can replace it)."""
    out = np.empty(batch.n, object)
    aux = batch.aux
    off = batch.aux_off
    for i in range(batch.n):
        sub = aux[off[i]:off[i + 1]]
        got = get_value(sub, tag)
        out[i] = None if got is None else got[1]
    return out


def batch_tag_str_values(batch, tag: str):
    """Like batch_tag_values, but rendered the way view's -d/-D filter
    compares them (sam_view.c:189-208): ints via %d, A as the char,
    Z/H as the string; floats are not usable as filter values."""
    out = np.empty(batch.n, object)
    aux = batch.aux
    off = batch.aux_off
    for i in range(batch.n):
        sub = aux[off[i]:off[i + 1]]
        got = get_value(sub, tag)
        if got is None:
            out[i] = None
            continue
        t, v = got
        if t in "cCsSiI":
            out[i] = str(v)
        elif t == "A":
            out[i] = v
        elif t in "ZH":
            out[i] = v
        else:
            out[i] = None
    return out


def batch_adjust_tags(batch, keep: set[str] | None = None,
                      remove: set[str] | None = None):
    """Rewrite the batch's aux columns keeping/removing tag sets
    (view -x/--keep-tag, sam_view.c adjust_tags).  In place."""
    aux = batch.aux
    off = batch.aux_off
    parts = []
    new_off = np.zeros(batch.n + 1, np.int64)
    for i in range(batch.n):
        sub = aux[off[i]:off[i + 1]]
        if keep is not None:
            sub = keep_tags(sub, keep)
        elif remove:
            sub = delete_tags(sub, remove)
        parts.append(sub)
        new_off[i + 1] = new_off[i] + len(sub)
    batch.aux = (np.concatenate(parts).astype(np.uint8)
                 if parts else np.empty(0, np.uint8))
    batch.aux_off = new_off
