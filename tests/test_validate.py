"""SAM validity checker + datatest-style I/O matrix.

Models the reference's Picard ValidateSamFile step (reference
tests/datatest.py:68-108): every {fq,sam,bam} input x {sam,bam} output
combination must produce structurally valid SAM/BAM, and re-aligning an
aligned file must reproduce the same mapped positions.
"""
import numpy as np
import pytest

from snap_rnaseq_tpu.cli import main as cli_main
from snap_rnaseq_tpu.io.validate import (validate_bam, validate_records,
                                         validate_sam)
from snap_rnaseq_tpu.utils.tables import decode_bases, reverse_complement_codes

HDR = b"@HD\tVN:1.4\n@SQ\tSN:chr1\tLN:1000\n"


def _v(body: bytes):
    return validate_records((HDR + body).splitlines())


def test_validator_accepts_valid():
    assert _v(b"r1\t0\tchr1\t10\t60\t4=\t*\t0\t0\tACGT\tIIII\n") == []
    assert _v(b"u\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII\n") == []
    # valid pair
    assert _v(
        b"p\t99\tchr1\t10\t60\t4=\t=\t100\t94\tACGT\tIIII\n"
        b"p\t147\tchr1\t100\t60\t4=\t=\t10\t-94\tACGT\tIIII\n") == []


def test_validator_catches_errors():
    # CIGAR length != SEQ length
    assert any("CIGAR length" in e for e in
               _v(b"r\t0\tchr1\t10\t60\t5=\t*\t0\t0\tACGT\tIIII\n"))
    # alignment runs past the reference end
    assert any("past end" in e for e in
               _v(b"r\t0\tchr1\t999\t60\t4=\t*\t0\t0\tACGT\tIIII\n"))
    # mapped read without CIGAR
    assert any("no CIGAR" in e for e in
               _v(b"r\t0\tchr1\t10\t60\t*\t*\t0\t0\tACGT\tIIII\n"))
    # unmapped read with CIGAR
    assert any("unmapped read has CIGAR" in e for e in
               _v(b"r\t4\tchr1\t10\t0\t4=\t*\t0\t0\tACGT\tIIII\n"))
    # mate flags on unpaired read
    assert any("flag set on unpaired" in e for e in
               _v(b"r\t64\tchr1\t10\t60\t4=\t*\t0\t0\tACGT\tIIII\n"))
    # RNAME not in header
    assert any("not in header" in e for e in
               _v(b"r\t0\tchrX\t10\t60\t4=\t*\t0\t0\tACGT\tIIII\n"))
    # mate not found
    assert any("mate not found" in e for e in
               _v(b"p\t99\tchr1\t10\t60\t4=\t=\t100\t94\tACGT\tIIII\n"))
    # PNEXT disagrees with the mate's POS
    assert any("PNEXT" in e for e in _v(
        b"p\t99\tchr1\t10\t60\t4=\t=\t90\t94\tACGT\tIIII\n"
        b"p\t147\tchr1\t100\t60\t4=\t=\t10\t-94\tACGT\tIIII\n"))
    # asymmetric TLEN
    assert any("TLEN" in e and "symmetric" in e for e in _v(
        b"p\t99\tchr1\t10\t60\t4=\t=\t100\t94\tACGT\tIIII\n"
        b"p\t147\tchr1\t100\t60\t4=\t=\t10\t-90\tACGT\tIIII\n"))
    # SEQ/QUAL length mismatch
    assert any("QUAL" in e for e in
               _v(b"r\t0\tchr1\t10\t60\t4=\t*\t0\t0\tACGT\tIII\n"))


@pytest.fixture(scope="module")
def matrixdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("datatest")
    rng = np.random.default_rng(11)
    chrom = decode_bases(rng.integers(0, 4, 5000, dtype=np.uint8))
    with open(d / "ref.fa", "wb") as f:
        f.write(b">chr1\n" + chrom + b"\n")
    assert cli_main(["index", str(d / "ref.fa"), str(d / "idx")]) == 0

    codes = np.frombuffer(chrom, np.uint8)
    from snap_rnaseq_tpu.utils.tables import encode_bases
    g = encode_bases(chrom)
    L = 100
    with open(d / "reads.fq", "wb") as f:
        for i in range(8):
            start = 200 + 500 * i
            c = g[start:start + L].copy()
            if i % 3 == 0:
                c[37] = (c[37] + 1) % 4
            if i % 2:
                c = reverse_complement_codes(c)
            f.write(b"@rd%d\n" % i + decode_bases(c) + b"\n+\n" +
                    b"I" * L + b"\n")
    return d


@pytest.mark.slow
def test_datatest_matrix(matrixdir):
    d = matrixdir
    # fq -> {sam, bam}
    assert cli_main(["single", str(d / "idx"), str(d / "reads.fq"),
                     "-o", str(d / "fq_out.sam")]) == 0
    assert cli_main(["single", str(d / "idx"), str(d / "reads.fq"),
                     "-o", str(d / "fq_out.bam")]) == 0
    assert validate_sam(d / "fq_out.sam") == []
    assert validate_bam(d / "fq_out.bam") == []

    def mapped_positions(parse_lines):
        out = {}
        for ln in parse_lines:
            if ln.startswith(b"@"):
                continue
            f = ln.split(b"\t")
            if not int(f[1]) & 4:
                out[f[0].decode()] = (f[2].decode(), int(f[3]))
        return out

    with open(d / "fq_out.sam", "rb") as f:
        truth = mapped_positions(f.read().splitlines())
    assert len(truth) == 8

    # {sam, bam} inputs -> {sam, bam} outputs
    for src in ("fq_out.sam", "fq_out.bam"):
        for dst_ext in ("sam", "bam"):
            dst = d / f"re_{src.split('.')[1]}_{dst_ext}.{dst_ext}"
            assert cli_main(["single", str(d / "idx"), str(d / src),
                             "-o", str(dst)]) == 0
            if dst_ext == "sam":
                assert validate_sam(dst) == []
                with open(dst, "rb") as f:
                    lines = f.read().splitlines()
            else:
                assert validate_bam(dst) == []
                from snap_rnaseq_tpu.io.validate import bam_to_sam_lines
                lines = list(bam_to_sam_lines(dst))
            assert mapped_positions(lines) == truth


def test_golden_outputs_are_valid():
    import os
    gold = os.path.join(os.path.dirname(__file__), "golden")
    for name in sorted(os.listdir(gold)):
        if name.endswith(".sam"):
            errs = validate_sam(os.path.join(gold, name))
            assert errs == [], (name, errs[:5])
