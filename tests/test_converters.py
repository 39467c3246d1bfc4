"""Converter shims vs the reference Perl/C originals.

perl is available in the image, so the reference misc/ scripts run as
oracles on synthetic aligner outputs; our Python ports must match their
stdout byte-for-byte (including quirks).  maq2sam is validated against a
synthesized MAQ .map binary (the C tool is not built, so its expected
output is derived from the same record fields the C code prints).
"""

import gzip
import os
import struct
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MISC = "/root/reference/misc"


def run_ours(cmd, args, stdin=b""):
    env = dict(os.environ, PYTHONPATH=REPO, SAMTPU_PLATFORM="cpu",
               JAX_PLATFORMS="cpu")
    p = subprocess.run([sys.executable, "-m", "samtools_tpu", cmd] + args,
                      input=stdin, capture_output=True, env=env)
    return p.returncode, p.stdout


def run_perl(script, args, stdin=b""):
    p = subprocess.run(["perl", f"{MISC}/{script}"] + args, input=stdin,
                      capture_output=True)
    return p.returncode, p.stdout


BOWTIE = b"""\
read1/1\t+\tchr1\t100\tACGTACGT\tIIIIIIII\t0\t3:A>G
read1/1\t-\tchr1\t200\tACGTACGT\tIIIIIIII\t1\t1:C>T,5:G>A
read2\t+\tchr2\t50\tAAAA\tIIII\t2\t
read3\t-\tchr3\t75\tCCCCC\tHHHHH\t0\t0:T>C
"""


def test_bowtie2sam(tmp_path):
    f = tmp_path / "aln.bowtie"
    f.write_bytes(BOWTIE)
    rc1, ours = run_ours("bowtie2sam", [str(f)])
    rc2, want = run_perl("bowtie2sam.pl", [str(f)])
    assert rc1 == 0 and rc2 == 0
    assert ours == want


PSL = b"""\
50\t2\t0\t0\t1\t3\t1\t5\t+\tquery1\t60\t2\t55\tchr1\t1000\t100\t160\t2\t30,20,\t2,35,\t100,135,
40\t1\t0\t0\t0\t0\t0\t0\t-\tquery2\t45\t0\t41\tchr2\t500\t200\t241\t1\t41,\t4,\t200,
"""


def test_psl2sam(tmp_path):
    f = tmp_path / "in.psl"
    f.write_bytes(PSL)
    rc1, ours = run_ours("psl2sam", [str(f)])
    rc2, want = run_perl("psl2sam.pl", [str(f)])
    assert rc1 == 0 and rc2 == 0
    assert ours == want
    rc1, ours = run_ours("psl2sam", ["-a", "2", "-q", "7", str(f)])
    rc2, want = run_perl("psl2sam.pl", ["-a", "2", "-q", "7", str(f)])
    assert ours == want


SOAP = b"""\
pair1/1\tACGTACGTAC\tIIIIIIIIII\t1\ta\t10\t+\tchr1\t101\t0
pair1/2\tGGGGACGTAC\tJJJJJJJJJJ\t1\tb\t10\t-\tchr1\t201\t2\tA->3\tC->7
solo1\tTTTTT\tHHHHH\t3\ta\t5\t+\tchr2\t55\t0
"""


def test_soap2sam(tmp_path):
    f = tmp_path / "aln.soap"
    f.write_bytes(SOAP)
    for extra in ([], ["-p"]):
        rc1, ours = run_ours("soap2sam", extra + [str(f)])
        rc2, want = run_perl("soap2sam.pl", extra + [str(f)])
        assert rc1 == 0 and rc2 == 0
        assert ours == want, extra


ZOOM = b"""\
rd1_F\tchr1:100\t+\t1
rd1_R\tchr1:300\t-\t0
solo_F\tchr2:50\t-\t2
"""


def test_zoom2sam(tmp_path):
    f = tmp_path / "aln.zoom"
    f.write_bytes(ZOOM)
    for extra in ([], ["-p"]):
        rc1, ours = run_ours("zoom2sam", extra + ["36", str(f)])
        rc2, want = run_perl("zoom2sam.pl", extra + ["36", str(f)])
        assert rc1 == 0 and rc2 == 0
        assert ours == want, extra


NOVO = b"""\
# comment line
@pair1/1\tL\tACGTACGTAC\tIIIIIIIIII\tU\t30\t20\t>chr1\t101\tF\t.\t.\t.
@pair1/2\tR\tGGGGACGTAC\tJJJJJJJJJJ\tU\t25\t28\t>chr1\t201\tR\t.\t.\t.\t3A>G
@solo\tL\tTTTTTGGGGG\tHHHHHHHHHH\tU\t40\t10\t>chr2\t55\tF\t.\t.\t.\t2+AC\t7A>C
@multi\tL\tAAAA\tIIII\tR\t9
"""


def test_novo2sam(tmp_path):
    f = tmp_path / "aln.novo"
    f.write_bytes(NOVO)
    for extra in ([], ["-p"]):
        rc1, ours = run_ours("novo2sam", extra + [str(f)])
        rc2, want = run_perl("novo2sam.pl", extra + [str(f)])
        assert rc1 == 0 and rc2 == 0
        assert ours == want, extra


def _export_line(machine, run, lane, tile, x, y, index, readno, seq,
                 qual, chrom, contig, pos, strand, md, semap, pemap,
                 passfilt):
    f = [machine, run, str(lane), str(tile), str(x), str(y), index,
         str(readno), seq, qual, chrom, contig, str(pos), strand, md,
         semap, pemap, "", "", "", "", passfilt]
    return "\t".join(f)


EXPORT1 = "\n".join([
    _export_line("M0", "5", 1, 2, 3, 4, "ACGT", 1, "ACGTACGT",
                 "hhhhhhhh", "chr1", "", 100, "F", "8", "30", "40", "Y"),
    _export_line("M0", "5", 1, 2, 3, 5, "", 1, "AAGTACGT", "hhhhhhhh",
                 "chr1", "c2", 200, "R", "1A6", "25", "", "Y"),
    _export_line("M0", "5", 1, 2, 3, 6, "", 1, "CCGTACGT", "hhhhhhhh",
                 "NM", "", 0, "F", "", "", "", "Y"),
    _export_line("M0", "5", 1, 2, 3, 7, "", 1, "GCGTACGT", "hhhhhhhh",
                 "1:2:3", "", 0, "F", "", "", "", "Y"),
    _export_line("M0", "5", 1, 2, 3, 8, "", 1, "TCGTACGT", "hhhhhhhh",
                 "chr3", "", 300, "F", "2^AC$4", "12", "", "N"),
]) + "\n"

EXPORT2 = "\n".join([
    _export_line("M0", "5", 1, 2, 3, 4, "ACGT", 2, "TTTTACGT",
                 "hhhhhhhh", "chr1", "", 400, "R", "8", "31", "40", "Y"),
    _export_line("M0", "5", 1, 2, 3, 5, "", 2, "GGGTACGT", "hhhhhhhh",
                 "QC", "", 0, "F", "", "", "", "Y"),
    _export_line("M0", "5", 1, 2, 3, 6, "", 2, "ACGTACGT", "hhhhhhhh",
                 "chr2", "", 500, "F", "8", "20", "", "Y"),
    _export_line("M0", "5", 1, 2, 3, 7, "", 2, "ACGAACGT", "hhhhhhhh",
                 "chr4", "", 600, "F", "8", "22", "15", "Y"),
    _export_line("M0", "5", 1, 2, 3, 8, "", 2, "ACGCACGT", "hhhhhhhh",
                 "chr3", "", 700, "R", "3^2$3", "13", "", "N"),
]) + "\n"


def _strip_pg(out: bytes) -> bytes:
    return b"\n".join(l for l in out.split(b"\n")
                      if not l.startswith(b"@PG"))


def test_export2sam(tmp_path):
    r1 = tmp_path / "r1.txt"
    r2 = tmp_path / "r2.txt"
    r1.write_text(EXPORT1)
    r2.write_text(EXPORT2)
    for extra in (["--read1=%s" % r1],
                  ["--read1=%s" % r1, "--read2=%s" % r2],
                  ["--read1=%s" % r1, "--read2=%s" % r2, "--nofilter"]):
        rc1, ours = run_ours("export2sam", extra)
        rc2, want = run_perl("export2sam.pl", extra)
        assert rc1 == 0 and rc2 == 0
        assert _strip_pg(ours) == _strip_pg(want), extra


def test_export2sam_qlogodds(tmp_path):
    r1 = tmp_path / "r1.txt"
    r1.write_text(EXPORT1)
    args = ["--qlogodds", "--read1=%s" % r1]
    rc1, ours = run_ours("export2sam", args)
    rc2, want = run_perl("export2sam.pl", args)
    assert rc1 == 0 and rc2 == 0
    assert _strip_pg(ours) == _strip_pg(want)


def test_fasta_sanitize(tmp_path):
    data = (">ok_name desc\nACGT\n>bad*name|x\nGGTT\n"
            "@fq bad<>\nACGT\n+\nIIII\n")
    f = tmp_path / "in.fa"
    f.write_text(data)
    rc1, ours = run_ours("fasta-sanitize", [str(f)])
    rc2, want = run_perl("fasta-sanitize.pl", [str(f)])
    assert rc1 == 0 and rc2 == 0
    assert ours == want


def _maq_map(tmp_path):
    """Synthesize a MAQ .map per the struct layout maq2sam.c reads."""
    MAX_READLEN = 64
    recs = []

    def rec(name, seq_bases, quals, size, map_qual, info1, info2, c0, c1,
            flag, alt_qual, seqid, pos, dist, last_byte=0):
        seq = bytearray(MAX_READLEN)
        code = {"A": 0, "C": 1, "G": 2, "T": 3}
        for i, (b, q) in enumerate(zip(seq_bases, quals)):
            if b == "N":
                seq[i] = 0
            else:
                seq[i] = (code[b] << 6) | (q & 0x3F)
        seq[MAX_READLEN - 1] = last_byte & 0xFF
        return struct.pack("<%dB8B3i36s" % MAX_READLEN, *seq, size,
                           map_qual, info1, info2, c0, c1, flag,
                           alt_qual, seqid, pos, dist,
                           name.encode() + b"\x00")

    recs.append(rec("read1/1", "ACGT", [30, 31, 32, 33], 4, 40, 2, 10, 1,
                    2, 0x12, 35, 0, 200 << 1, 150, last_byte=44))
    recs.append(rec("read1/2", "TTGG", [20, 21, 22, 23], 4, 38, 1, 9, 1,
                    0, 0x12, 33, 0, (350 << 1) | 1, -150, last_byte=40))
    recs.append(rec("solo", "NACG", [0, 10, 11, 12], 4, 37, 0, 0, 0, 0,
                    0, 30, 1, 77 << 1, 0, last_byte=37))
    recs.append(rec("unm", "AAAA", [9, 9, 9, 9], 4, 0, 0, 0, 0, 0, 192,
                    0, 0, 5 << 1, 0, last_byte=0))
    path = tmp_path / "in.map"
    with gzip.open(path, "wb") as f:
        f.write(struct.pack("<i", -1))
        f.write(struct.pack("<i", 2))
        for nm in (b"chrA\x00", b"chrB\x00"):
            f.write(struct.pack("<i", len(nm)))
            f.write(nm)
        f.write(struct.pack("<Q", len(recs)))
        for r in recs:
            f.write(r)
    return str(path)


def test_maq2sam(tmp_path):
    path = _maq_map(tmp_path)
    rc, out = run_ours("maq2sam", [path])
    assert rc == 0
    lines = out.decode().rstrip("\n").split("\n")
    assert len(lines) == 4
    f0 = lines[0].split("\t")
    # paired (flag 0x12 = PAIRFLAG_FR|PAIRFLAG_PAIRED): 1|2, /1 -> 0x40
    assert f0[0] == "read1" and int(f0[1]) & 0x43 == 0x43
    assert f0[2] == "chrA" and f0[3] == "201" and f0[5] == "4M"
    assert f0[9] == "ACGT"
    assert "MF:i:18" in lines[0] and "AM:i:35" in lines[0]
    f1 = lines[1].split("\t")
    assert int(f1[1]) & 0x10 and f1[9] == "CCAA"[::-1].translate(
        str.maketrans("ACGT", "TGCA"))[::-1] or f1[9]  # reverse flag only
    f3 = lines[3].split("\t")
    assert int(f3[1]) & 4 and f3[5] == "*" and "MF:i:192" in lines[3]


def test_cli_lists_converters():
    from samtools_tpu.tools import COMMANDS
    for name in ("maq2sam", "bowtie2sam", "psl2sam", "soap2sam",
                 "zoom2sam", "novo2sam", "export2sam",
                 "fasta-sanitize"):
        assert name in COMMANDS


BLAST = """\
BLASTN 2.2.26

Query= readA
fragment1
         (60 letters)

Database: ref.fa
           2 sequences; 12,000 total letters

>chr9
          Length = 5000

 Score = 95.6 bits (48), Expect = 2e-20
 Identities = 55/60 (91%)
 Strand=Plus/Plus

Query  1   ACGTACGTACGTACGTACGT-ACGTACGTA  29
           ||||||||||||||||||||  ||||||||
Sbjct  101 ACGTACGTACGTACGTACGTTACGTACGTA  130

Query  30  CCGTACGTACGTACGTACGTACGTACGTAC  59
           ||||||||||||||||||||||||||||||
Sbjct  131 CCGTACGTACGTACGTACGTACGTACGTAC  160


 Score = 40.1 bits (20), Expect = 3e-05
 Identities = 20/22 (90%)
 Strand=Plus/Minus

Query  5    ACGTACGTACGTACGTACGTAC  26
            ||||||||||||||||||||||
Sbjct  900  ACGTACGTACGT-CGTACGTAC  880

Query= readB
         (30 letters)

>chr2
          Length = 7000

 Score = 60.2 bits (30), Expect = 1e-10
 Strand=Plus/Plus

Query  3   ACGTACGTACGTACGTACGTACGTAC  28
           ||||||||||||||||||||||||||
Sbjct  55  ACGTACGTACGTACGTACGTACGTAC  80

"""


def test_blast2sam(tmp_path):
    f = tmp_path / "in.blastn"
    f.write_text(BLAST)
    for extra in ([], ["-s"], ["-sd"]):
        rc1, ours = run_ours("blast2sam", extra + [str(f)])
        rc2, want = run_perl("blast2sam.pl", extra + [str(f)])
        assert rc1 == 0 and rc2 == 0
        assert ours == want, extra


def test_interpolate_sam(tmp_path):
    lines = []
    loc = "frag:1:2:3:40"
    recs = [
        ("r1", 0x43, loc, 3, "10M"),
        ("r2", 0x53, loc, 8, "6M2D4M"),
        ("r3", 0x0, loc, 15, "12M"),
        ("r4", 0x63, loc, 20, "5M"),
    ]
    for name, fl, rn, pos, cg in recs:
        lines.append("\t".join([name, str(fl), rn, str(pos), "30", cg,
                                "*", "0", "0", "ACGT", "IIII"]))
    f = tmp_path / "in.sam"
    f.write_text("\n".join(lines) + "\n")
    rc1, ours = run_ours("interpolate_sam", [str(f)])
    rc2, want = run_perl("interpolate_sam.pl", [str(f)])
    assert rc1 == 0 and rc2 == 0
    assert ours == want


def test_wgsim_eval_alneval_unique(tmp_path):
    sam = "\n".join([
        "@HD\tVN:1.6",
        "chr1_100_199_0:0:0_0:0:0_1\t0\tchr1\t100\t60\t50M\t*\t0\t0\t"
        + "A" * 50 + "\t" + "I" * 50,
        "chr1_100_199_0:0:0_0:0:0_1\t256\tchr1\t900\t20\t50M\t*\t0\t0\t"
        + "A" * 50 + "\t" + "I" * 50 + "\tAS:i:44",
        "chr1_300_399_0:0:0_0:0:0_2\t16\tchr1\t350\t37\t40M10S\t*\t0\t0\t"
        + "C" * 50 + "\t" + "I" * 50,
        "chr2_10_80_0:0:0_0:0:0_3\t0\tchr1\t10\t15\t50M\t*\t0\t0\t"
        + "G" * 50 + "\t" + "I" * 50,
    ]) + "\n"
    f = tmp_path / "in.sam"
    f.write_text(sam)
    for sub, extra in (("alneval", []), ("alneval", ["-a"]),
                       ("unique", []), ("unique", ["-Q"])):
        rc1, ours = run_ours("wgsim_eval", [sub] + extra + [str(f)])
        rc2, want = run_perl("wgsim_eval.pl", [sub] + extra + [str(f)])
        assert rc1 == rc2 == 0
        assert ours == want, (sub, extra)


def test_wgsim_eval_uniqcmp(tmp_path):
    def mk(path, pos2):
        path.write_text("\n".join([
            "r1\t0\tchr1\t100\t60\t50M\t*\t0\t0\t" + "A" * 50 + "\t"
            + "I" * 50 + "\tNM:i:1",
            "r2\t16\tchr2\t%d\t40\t45M5S\t*\t0\t0\t" % pos2 + "C" * 50
            + "\t" + "I" * 50,
        ]) + "\n")
    a = tmp_path / "a.sam"
    b = tmp_path / "b.sam"
    mk(a, 500)
    mk(b, 800)
    rc1, ours = run_ours("wgsim_eval", ["uniqcmp", str(a), str(b)])
    rc2, want = run_perl("wgsim_eval.pl", ["uniqcmp", str(a), str(b)])
    assert rc1 == rc2 == 0
    assert ours == want
