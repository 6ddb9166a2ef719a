"""I/O format stack tests: native BGZF, BAM round-trip, sorted output,
SAM/BAM input readers, Range parameters, ROC tool.

Models the reference's filetest.py I/O matrix ({FQ,FQZ,SAM,BAM} x
{sorted,unsorted} x {SAM,BAM}) at unit granularity.
"""
import gzip
import io
import os

import numpy as np
import pytest

from snap_rnaseq_tpu import native
from snap_rnaseq_tpu.index.genome import genome_from_codes
from snap_rnaseq_tpu.io.bam import (make_bam_header_block, pack_aux,
                                    pack_bam_record)
from snap_rnaseq_tpu.io.readers import (bam_records, open_paired_read_supplier,
                                        read_bam, read_sam)
from snap_rnaseq_tpu.io.sam import make_header
from snap_rnaseq_tpu.io.writers import _SortedSpill, open_output
from snap_rnaseq_tpu.utils.range_param import Range


def test_bgzf_roundtrip():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 4, 300_000, dtype=np.uint8).tobytes()
    z = native.bgzf_compress(data, eof=True)
    # standard gzip can read BGZF
    assert gzip.GzipFile(fileobj=io.BytesIO(z)).read() == data
    assert native.bgzf_decompress(z) == data
    # empty payload with EOF block only
    z0 = native.bgzf_compress(b"", eof=True)
    assert native.bgzf_decompress(z0) == b""


def test_bam_record_roundtrip(tmp_path):
    genome = genome_from_codes(np.zeros(1000, np.uint8), name="chrT")
    header = make_header(genome)
    path = str(tmp_path / "t.bam")
    writer, is_bam = open_output(path, genome, header)
    assert is_bam
    rec = pack_bam_record(b"q1", 0, 0, 41, 60, [(4, "="), (1, "X"), (3, "=")],
                          -1, -1, 0, b"ACGTACGT", b"IIIIJJJJ",
                          pack_aux("RG1", "SNAP", 1))
    writer.write_record(41, rec)
    writer.close()
    recs = list(bam_records(path))
    assert len(recs) == 1
    r = recs[0]
    assert r["qname"] == b"q1" and r["pos"] == 41 and r["mapq"] == 60
    assert r["cigar"] == [(4, "="), (1, "X"), (3, "=")]
    assert r["seq"] == b"ACGTACGT" and r["qual"] == b"IIIIJJJJ"
    assert r["refs"] == [("chrT", 1000)]
    assert b"RGZRG1\x00" in r["aux"] and b"NMi" in r["aux"]


def test_sorted_spill_orders_records():
    s = _SortedSpill(spill_bytes=200)  # force multiple spill runs
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 10_000, 300)
    for i, k in enumerate(keys):
        s.add(int(k), f"{k}:{i};".encode())
    out = list(s.merge())
    got = [int(b.split(b":")[0]) for b in out]
    assert got == sorted(got)
    assert len(out) == 300


def test_sam_input_unrc(tmp_path):
    # a reverse-strand SAM record must come back as-sequenced
    sam = (b"@HD\tVN:1.4\n"
           b"r1\t16\tchr1\t100\t60\t4=\t*\t0\t0\tACGT\tIJKL\n"
           b"r2\t0\tchr1\t200\t60\t4=\t*\t0\t0\tGGTT\tMNOP\n"
           b"r3\t4\t*\t0\t0\t*\t*\t0\t0\tTTTT\tQRST\n")
    p = tmp_path / "in.sam"
    p.write_bytes(sam)
    reads = list(read_sam(str(p)))
    assert reads[0].seq == b"ACGT"[::-1].translate(
        bytes.maketrans(b"ACGT", b"TGCA"))  # un-RC of ACGT
    assert reads[0].qual == b"IJKL"[::-1]
    assert reads[1].seq == b"GGTT" and reads[1].qual == b"MNOP"
    assert reads[2].seq == b"TTTT"


def test_paired_interleaved_matching(tmp_path):
    sam = (b"r1\t0\tchr1\t1\t60\t4=\t*\t0\t0\tAAAA\tIIII\n"
           b"r2\t0\tchr1\t1\t60\t4=\t*\t0\t0\tCCCC\tIIII\n"
           b"r1\t0\tchr1\t9\t60\t4=\t*\t0\t0\tGGGG\tIIII\n"
           b"r2\t0\tchr1\t9\t60\t4=\t*\t0\t0\tTTTT\tIIII\n")
    p = tmp_path / "pairs.sam"
    p.write_bytes(sam)
    pairs = list(open_paired_read_supplier(str(p)))
    assert len(pairs) == 2
    # reference order: (arriving read, stored mate)
    # (PairedReadMatcher.cpp:148-188 sets read1=current, read2=matched)
    assert {(a.seq, b.seq) for a, b in pairs} == \
        {(b"GGGG", b"AAAA"), (b"TTTT", b"CCCC")}


def test_paired_interleaved_orphan_dropped(tmp_path, capfd):
    # a read whose mate never appears is dropped with a warning, not an
    # error (PairedReadMatcher.cpp:104-110 discards leftover unmatched reads)
    sam = (b"r1\t0\tchr1\t1\t60\t4=\t*\t0\t0\tAAAA\tIIII\n"
           b"orphan\t0\tchr1\t5\t60\t4=\t*\t0\t0\tCCCC\tIIII\n"
           b"r1\t0\tchr1\t9\t60\t4=\t*\t0\t0\tGGGG\tIIII\n")
    p = tmp_path / "orphan.sam"
    p.write_bytes(sam)
    pairs = list(open_paired_read_supplier(str(p)))
    assert len(pairs) == 1
    assert pairs[0][0].seq == b"GGGG" and pairs[0][1].seq == b"AAAA"
    assert "discarding 1+0 unpaired" in capfd.readouterr().err


def test_paired_interleaved_coordinate_sorted(tmp_path):
    """Mates separated by far more than the matcher window must still pair
    (the reference's overflow-map spill, PairedReadMatcher.cpp:120-138) —
    the coordinate-sorted-SAM-as-input regime where mates sit megabytes
    apart."""
    from snap_rnaseq_tpu.io import readers as rd
    old = rd._MATCH_WINDOW
    rd._MATCH_WINDOW = 8   # tiny window so the test exercises overflow
    try:
        n = 100
        lines = []
        # first mates at positions 1..n, second mates all at the far end —
        # a coordinate-sorted layout with every pair split across the file
        for i in range(n):
            lines.append(b"p%d\t0\tchr1\t%d\t60\t4=\t*\t0\t0\tAAAA\tIIII\n"
                         % (i, i + 1))
        for i in range(n):
            lines.append(b"p%d\t0\tchr1\t%d\t60\t4=\t*\t0\t0\tCCCC\tIIII\n"
                         % (i, 100000 + i))
        p = tmp_path / "coord.sam"
        p.write_bytes(b"".join(lines))
        st = rd.PairMatchStats()
        pairs = list(rd._pair_interleaved(rd.open_read_supplier(str(p)), st))
        assert len(pairs) == n
        assert st.pairs_matched == n
        assert st.orphans_dropped == 0
        assert st.overflow_matched > 0   # the window really spilled
        for a, b in pairs:
            assert a.rid == b.rid and a.seq == b"CCCC" and b.seq == b"AAAA"
    finally:
        rd._MATCH_WINDOW = old


def test_range_parse():
    assert Range.parse("14").values() == [14]
    assert Range.parse("10:2:14").values() == [10, 12, 14]
    assert Range.parse("3:5").values() == [3, 4, 5]
    with pytest.raises(ValueError):
        Range.parse("1:2:3:4")


def test_compute_roc(tmp_path):
    # synthetic wgsim-named reads: one correct, one misaligned
    from snap_rnaseq_tpu.utils.wgsim import wgsim_id
    rng = np.random.default_rng(5)
    genome = genome_from_codes(rng.integers(0, 4, 2000, dtype=np.uint8),
                               name="chr1")
    genome.save(str(tmp_path))
    rid_ok = wgsim_id("chr1", 100, 50)
    rid_bad = wgsim_id("chr1", 100, 50)
    sam = (b"@HD\tVN:1.4\n" +
           rid_ok + b"\t0\tchr1\t101\t60\t50=\t*\t0\t0\t" +
           b"A" * 50 + b"\t" + b"I" * 50 + b"\n" +
           rid_bad + b"\t0\tchr1\t1200\t40\t50=\t*\t0\t0\t" +
           b"A" * 50 + b"\t" + b"I" * 50 + b"\n")
    p = tmp_path / "roc.sam"
    p.write_bytes(sam)
    from snap_rnaseq_tpu.tools.compute_roc import compute_roc
    counts, errors = compute_roc(str(tmp_path), str(p))
    assert counts[60] == 1 and errors[60] == 0
    assert counts[40] == 1 and errors[40] == 1


def test_sorted_bam_dupmark_and_index(tmp_path):
    from snap_rnaseq_tpu.io.writers import open_output
    from snap_rnaseq_tpu.io.bai import BAI_MAGIC
    genome = genome_from_codes(np.zeros(100000, np.uint8), name="chr1")
    header = make_header(genome, sorted_output=True)
    path = str(tmp_path / "dup.bam")
    writer, is_bam = open_output(path, genome, header, sorted_output=True)
    assert is_bam

    def rec(name, pos, flag=0):
        return pack_bam_record(name, flag, 0, pos, 60, [(8, "=")], -1, -1, 0,
                               b"ACGTACGT", b"IIIIIIII", pack_aux(None, None, 0))
    # out-of-order writes; two records at pos 500 (same strand) = duplicates
    writer.write_record(700, rec(b"c", 700))
    writer.write_record(500, rec(b"a", 500))
    writer.write_record(500, rec(b"b", 500))
    writer.write_record(500, rec(b"d", 500, flag=0x10))   # other strand: kept
    writer.close()

    recs = list(bam_records(path))
    assert [r["qname"] for r in recs] == [b"a", b"b", b"d", b"c"]
    flags = {r["qname"]: r["flag"] for r in recs}
    assert flags[b"a"] & 0x400 == 0
    assert flags[b"b"] & 0x400            # duplicate of a
    assert flags[b"d"] & 0x400 == 0       # reverse strand, not a duplicate
    assert flags[b"c"] & 0x400 == 0
    # .bai exists and is structurally sane
    bai = open(path + ".bai", "rb").read()
    assert bai[:4] == BAI_MAGIC
    import struct as _s
    assert _s.unpack_from("<i", bai, 4)[0] == 1   # one reference
    # suppression: -S id -> no bai, no dup flags
    path2 = str(tmp_path / "nodup.bam")
    writer2, _ = open_output(path2, genome, header, sorted_output=True,
                             mark_duplicates=False, build_index=False)
    writer2.write_record(500, rec(b"a", 500))
    writer2.write_record(500, rec(b"b", 500))
    writer2.close()
    assert not os.path.exists(path2 + ".bai")
    assert all(r["flag"] & 0x400 == 0 for r in bam_records(path2))


def test_bam_region_query(tmp_path):
    """bai-backed region queries return exactly the overlapping records."""
    from snap_rnaseq_tpu.io.writers import open_output
    from snap_rnaseq_tpu.io.readers import bam_query, bam_header_refs
    rng = np.random.default_rng(12)
    genome = genome_from_codes(rng.integers(0, 4, 400000, dtype=np.uint8),
                               name="chr1")
    header = make_header(genome, sorted_output=True)
    path = str(tmp_path / "big.bam")
    writer, _ = open_output(path, genome, header, sorted_output=True,
                            mark_duplicates=False)
    N, L = 3000, 80
    positions = sorted(int(p) for p in
                       rng.integers(0, 400000 - L, N))
    for i, pos in enumerate(positions):
        writer.write_record(pos, pack_bam_record(
            b"r%05d" % i, 0, 0, pos, 60, [(L, "=")], -1, -1, 0,
            b"A" * L, b"I" * L, pack_aux(None, None, 0)))
    writer.close()

    refs = bam_header_refs(path)
    assert refs[0][0] == "chr1"

    all_recs = list(bam_records(path))
    assert len(all_recs) == N

    for beg, end in ((0, 1000), (123456, 133456), (399000, 400000),
                     (200000, 200001), (0, 400000)):
        want = sorted(r["qname"] for r in all_recs
                      if r["pos"] < end and r["pos"] + L > beg)
        got = sorted(r["qname"] for r in bam_query(path, "chr1", beg, end))
        assert got == want, (beg, end, len(got), len(want))
    # empty region
    assert list(bam_query(path, 0, 399999, 400000)) in ([],) or all(
        r["pos"] + L > 399999 for r in bam_query(path, 0, 399999, 400000))
