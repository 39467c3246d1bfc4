"""SAM FLAG bits and CIGAR op constants.

These are the public SAM specification constants (also listed in the
reference's ``bam_flags.c`` usage text, /root/reference/bam_flags.c:40-60).
"""

# SAM flag bits
FPAIRED = 0x1
FPROPER_PAIR = 0x2
FUNMAP = 0x4
FMUNMAP = 0x8
FREVERSE = 0x10
FMREVERSE = 0x20
FREAD1 = 0x40
FREAD2 = 0x80
FSECONDARY = 0x100
FQCFAIL = 0x200
FDUP = 0x400
FSUPPLEMENTARY = 0x800

FLAG_NAMES = [
    ("PAIRED", FPAIRED),
    ("PROPER_PAIR", FPROPER_PAIR),
    ("UNMAP", FUNMAP),
    ("MUNMAP", FMUNMAP),
    ("REVERSE", FREVERSE),
    ("MREVERSE", FMREVERSE),
    ("READ1", FREAD1),
    ("READ2", FREAD2),
    ("SECONDARY", FSECONDARY),
    ("QCFAIL", FQCFAIL),
    ("DUP", FDUP),
    ("SUPPLEMENTARY", FSUPPLEMENTARY),
]

# CIGAR operations, BAM encoding order "MIDNSHP=X"
CMATCH = 0
CINS = 1
CDEL = 2
CREF_SKIP = 3
CSOFT_CLIP = 4
CHARD_CLIP = 5
CPAD = 6
CEQUAL = 7
CDIFF = 8
CBACK = 9

CIGAR_CHARS = "MIDNSHP=XB"
CIGAR_SHIFT = 4
CIGAR_MASK = 0xF

# Per-op: does the op consume query / reference bases?
CIGAR_CONSUMES_QUERY = [1, 1, 0, 0, 1, 0, 0, 1, 1, 0]
CIGAR_CONSUMES_REF = [1, 0, 1, 1, 0, 0, 0, 1, 1, 0]

# 4-bit base codes (seq_nt16): =ACMGRSVTWYHKDBN
SEQ_NT16_STR = "=ACMGRSVTWYHKDBN"

# ASCII base -> 4-bit code
SEQ_NT16_TABLE = {}
for _i, _c in enumerate(SEQ_NT16_STR):
    SEQ_NT16_TABLE[_c] = _i
    SEQ_NT16_TABLE[_c.lower()] = _i
# IUPAC extras map onto the 16-code table
for _c, _v in {
    "a": 1, "c": 2, "g": 4, "t": 8, "u": 8, "n": 15,
}.items():
    SEQ_NT16_TABLE.setdefault(_c, _v)
    SEQ_NT16_TABLE.setdefault(_c.upper(), _v)

UNMAPPED_TID = -1
