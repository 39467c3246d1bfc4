"""samtools samples — list samples from @RG headers.

Parity target: /root/reference/bam_samples.c (SM or -T tag values, one
row per sample per file; -i index test column; -f/-F reference match).
"""

from __future__ import annotations

import os
import sys

from ..io import bgzf
from ..io.bam import decode_header
from ..io.files import detect_format
from ..io.sam_text import parse_sam
from .common import UsageError, gnu_getopt, print_error, print_error_errno


def _read_header(path: str):
    import numpy as np
    fmt = detect_format(path)
    if fmt in ("bam", "bam_raw"):
        data = np.frombuffer(bgzf.read_file(path), np.uint8)
        header, _ = decode_header(data)
        return header
    text_lines = []
    data = bgzf.read_file(path)
    for line in data.split(b"\n"):
        if line.startswith(b"@"):
            text_lines.append(line.decode("latin-1"))
        else:
            break
    from ..io.header import SamHeader
    return SamHeader.from_text("\n".join(text_lines) + "\n"
                               if text_lines else "")


def main_samples(argv: list[str]) -> int:
    tag = "SM"
    header_row = False
    test_index = False
    out_path = None
    fastas: list = []
    use_index_files = False
    try:
        opts, args = gnu_getopt(argv, "?hiT:o:f:F:X", [])
    except UsageError:
        return 1
    for o, v in opts:
        if o == "-h":
            header_row = True
        elif o == "-i":
            test_index = True
        elif o == "-T":
            if len(v) != 2:
                print_error("samples", 'Length of tag "%s" is not 2.', v)
                return 1
            tag = v
        elif o == "-o":
            out_path = v
        elif o == "-f":
            fastas.append(v)
        elif o == "-F":
            try:
                fastas.extend(l.strip() for l in open(v) if l.strip())
            except OSError as e:
                print_error_errno("samples", 'Cannot open "%s"', v, exc=e)
                return 1
        elif o == "-X":
            use_index_files = True
        elif o == "-?":
            return 0

    out = open(out_path, "w") if out_path else sys.stdout
    if header_row:
        out.write(f"#{tag}\tPATH")
        if test_index:
            out.write("\tINDEX")
        if fastas:
            out.write("\tREFERENCE")
        out.write("\n")

    fa_indexes = []
    if fastas:
        from ..io.fasta import load_fasta
        for fa in fastas:
            try:
                fa_indexes.append((fa, load_fasta(fa)))
            except OSError as e:
                print_error_errno("samples",
                                  'Cannot load index from "%s"', fa, exc=e)
                return 1

    if not args:
        args = [l.strip() for l in sys.stdin if l.strip()]

    files = args
    idx_files = [None] * len(files)
    if use_index_files:
        if "\t" in (files[0] if files else ""):
            pairs = [f.split("\t") for f in files]
            files = [p[0] for p in pairs]
            idx_files = [p[1] if len(p) > 1 else None for p in pairs]
        else:
            n = len(files) // 2
            idx_files = files[n:] + [None] * (len(files) - 2 * n)
            files = files[:n]

    rc = 0
    for path, idxf in zip(files, idx_files):
        try:
            header = _read_header(path)
        except OSError as e:
            print_error_errno("samples", 'Cannot open "%s"', path, exc=e)
            rc = 1
            continue
        has_index = False
        if test_index:
            if idxf:
                has_index = os.path.exists(idxf)
            else:
                from ..io.index import find_index_file
                has_index = find_index_file(path) is not None
        samples = []
        seen = set()
        for val in header.find_tag_values("RG", tag):
            if val not in seen:
                seen.add(val)
                samples.append(val)
        if not samples:
            samples = ["."]
        ref = None
        if fa_indexes:
            for fa, fidx in fa_indexes:
                if (fidx.nseq() == header.n_refs
                        and all(fidx.order[i] == header.ref_names[i]
                                and fidx.length(fidx.order[i])
                                == header.ref_lens[i]
                                for i in range(header.n_refs))):
                    ref = fa
                    break
        for s in samples:
            out.write(f"{s}\t{path}")
            if test_index:
                out.write("\tY" if has_index else "\tN")
            if fa_indexes:
                out.write("\t" + (ref if ref else "."))
            out.write("\n")
    if out_path:
        out.close()
    return rc
