#!/usr/bin/env python3
"""Generate roff man pages for every samtools_tpu subcommand.

The reference ships 42 hand-written pages in doc/ (one per subcommand +
samtools.1).  Here each page is generated from the tool's own usage
text so it can never drift from the implementation: NAME, SYNOPSIS,
DESCRIPTION (usage dump), plus the shared global options.  Regenerate
with `python scripts/gen_manpages.py` after changing a tool's usage.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from samtools_tpu import SAMTOOLS_PARITY_VERSION  # noqa: E402
from samtools_tpu.tools import COMMANDS  # noqa: E402

ONELINE = {
    "view": "SAM/BAM/CRAM conversion, filtering and subsampling",
    "sort": "sort alignments by coordinate, name, tag or minimiser",
    "index": "build BAI/CSI index for a coordinate-sorted BAM",
    "mpileup": "textual pileup of aligned reads (BAQ-aware)",
    "depth": "per-position read depth",
    "flagstat": "flag census with QC-pass/fail split",
    "idxstats": "per-contig mapped/unmapped counts from the index",
    "stats": "comprehensive per-file statistics (former bamcheck)",
    "consensus": "FASTA/FASTQ/pileup consensus calling",
    "merge": "merge sorted files with header translation",
    "markdup": "mark (optical) duplicates on sorted input",
    "fixmate": "fill mate coordinates and flags on name-grouped input",
    "collate": "group reads by name without a full sort",
    "fastq": "convert alignments back to FASTQ",
    "fasta": "convert alignments back to FASTA",
    "faidx": "index/extract FASTA",
    "fqidx": "index/extract FASTQ",
    "dict": "create a sequence dictionary (@SQ with MD5)",
    "calmd": "recompute MD/NM tags against the reference",
    "reheader": "replace a BAM/CRAM header",
    "cat": "concatenate files without decoding",
    "split": "split by read group or tag value",
    "addreplacerg": "add or replace read-group lines/tags",
    "quickcheck": "cheap integrity sniff (exit status oriented)",
    "head": "print the header and first records",
    "samples": "list sample names used in files",
    "reset": "strip alignment information back to unmapped reads",
    "depad": "convert padded to unpadded alignments",
    "flags": "explain SAM flag values",
    "tview": "interactive text alignment viewer",
    "bedcov": "summed depth per BED region",
    "coverage": "per-contig coverage table or histogram",
    "cram-size": "CRAM data-series size report",
    "phase": "het-SNP calling and read-backed phasing",
    "targetcut": "fosmid-pool target cutting",
    "rmdup": "legacy duplicate removal",
    "checksum": "order-agnostic content checksums",
    "ampliconclip": "clip primer regions per BED",
    "ampliconstats": "amplicon project statistics",
    "import": "FASTQ/FASTA to unmapped SAM/BAM/CRAM",
    "reference": "reconstruct the reference from CRAM/MD tags",
    "wgsim": "read simulator",
    "md5fa": "per-sequence MD5 of a FASTA",
    "md5sum-lite": "md5sum clone",
    "seq_cache_populate": "populate a REF_CACHE directory",
    "ace2sam": "ACE assembly to SAM converter",
    "maq2sam": "MAQ .map to SAM converter",
    "bowtie2sam": "bowtie text output to SAM converter",
    "psl2sam": "BLAT PSL to SAM converter",
    "soap2sam": "SOAP output to SAM converter",
    "zoom2sam": "ZOOM output to SAM converter",
    "novo2sam": "novoalign output to SAM converter",
    "export2sam": "Illumina GERALD export to SAM converter",
    "fasta-sanitize": "rewrite FASTA names to the SAM alphabet",
    "plot-bamstats": "plot `stats` output",
    "plot-ampliconstats": "plot `ampliconstats` output",
}

GLOBAL = """.SH GLOBAL OPTIONS
Most subcommands accept the shared htslib-style options:
.TP
.B --input-fmt FMT[,OPT=VAL], --output-fmt FMT[,OPT=VAL]
Force input/output format (sam, bam, cram) and format options
(e.g. level=5, version=3.1).
.TP
.B --reference FILE
Reference FASTA (required for CRAM).
.TP
.B -@, --threads N
Worker threads for the native BGZF codec.
.TP
.B --write-index
Build the output index while writing.
.TP
.B --verbosity N
Log level; 3+ adds per-stage timing counters.
.SH ENVIRONMENT
.TP
.B SAMTPU_DEVICE=0|1|auto
Host / device / size-gated dispatch of the TPU kernels.
.TP
.B SAMTPU_SHARDS=N|all
Shard the tool across N mesh devices (flagstat, depth, mpileup,
consensus).
"""


def usage_of(name: str) -> str:
    mod_name, fn = COMMANDS[name]
    try:
        import importlib
        mod = importlib.import_module(mod_name)
    except Exception:
        return ""
    buf = io.StringIO()
    u = getattr(mod, "usage", None)
    if u is None:
        return ""
    try:
        with contextlib.redirect_stdout(buf):
            try:
                u(buf)
            except TypeError:
                u()
    except Exception:
        return ""
    return buf.getvalue()


def roff_escape(s: str) -> str:
    out = []
    for line in s.split("\n"):
        line = line.replace("\\", "\\\\")
        if line.startswith(".") or line.startswith("'"):
            line = "\\&" + line
        out.append(line)
    return "\n".join(out)


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    doc = os.path.join(here, "doc")
    os.makedirs(doc, exist_ok=True)
    names = sorted(COMMANDS)
    for name in names:
        one = ONELINE.get(name, "samtools_tpu subcommand")
        usage = usage_of(name)
        page = [
            '.TH SAMTOOLS_TPU-%s 1 "%s" "samtools_tpu"'
            % (name.upper().replace(" ", "-"), SAMTOOLS_PARITY_VERSION),
            ".SH NAME",
            "samtools_tpu-%s \\- %s" % (name, one),
            ".SH SYNOPSIS",
            ".B python -m samtools_tpu %s" % name,
            ".RI [ options ]",
            ".SH DESCRIPTION",
            "TPU-native rebuild of `samtools %s`; flags and output are"
            % name,
            "byte-compatible with the reference implementation.",
        ]
        if usage.strip():
            page += [".SH USAGE", ".nf", roff_escape(usage.rstrip()),
                     ".fi"]
        page.append(GLOBAL.rstrip())
        page += [".SH SEE ALSO",
                 ".BR samtools_tpu (1)"]
        with open(os.path.join(doc, "samtools_tpu-%s.1" % name),
                  "w") as f:
            f.write("\n".join(page) + "\n")
    # umbrella page
    lines = ['.TH SAMTOOLS_TPU 1 "%s" "samtools_tpu"'
             % SAMTOOLS_PARITY_VERSION,
             ".SH NAME",
             "samtools_tpu \\- TPU-native toolkit for SAM/BAM/CRAM data",
             ".SH SYNOPSIS",
             ".B python -m samtools_tpu",
             ".I subcommand",
             ".RI [ options ]",
             ".SH DESCRIPTION",
             "A from-scratch TPU-native (JAX/XLA/Pallas) rebuild of the",
             "samtools toolkit: identical CLIs and byte-identical output,",
             "with the pileup/statistics kernels running as device",
             "segment-sums and the I/O layer in native C++.",
             ".SH SUBCOMMANDS"]
    for name in names:
        lines += [".TP", ".B %s" % name,
                  ONELINE.get(name, "")]
    lines.append(GLOBAL.rstrip())
    with open(os.path.join(doc, "samtools_tpu.1"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote %d pages to %s" % (len(names) + 1, doc))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
