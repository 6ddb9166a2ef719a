"""RNA layer tests: GTF model, transcriptome build, splice CIGAR rewriting,
genome/transcriptome reconciliation, and the end-to-end RNA pipelines.

Models the reference's RNA semantics (GTFReader.cpp, AlignmentFilter.cpp,
LandauVishkin.cpp:119-249) on a synthetic two-chromosome genome with a
three-exon transcript.
"""
import os

import numpy as np
import pytest

from snap_rnaseq_tpu.cli import main as cli_main
from snap_rnaseq_tpu.index.genome import read_fasta_genome
from snap_rnaseq_tpu.rna.gtf import GTFReader
from snap_rnaseq_tpu.rna.splice import insert_splice_junctions
from snap_rnaseq_tpu.rna.transcriptome import build_transcriptome_genome
from snap_rnaseq_tpu.utils.tables import decode_bases, reverse_complement_codes

GTF_TEXT = """\
chr1\ttest\texon\t1001\t1100\t.\t+\t.\tgene_id "G1"; transcript_id "T1"; gene_name "GENE1";
chr1\ttest\texon\t1401\t1500\t.\t+\t.\tgene_id "G1"; transcript_id "T1"; gene_name "GENE1";
chr1\ttest\texon\t2001\t2100\t.\t+\t.\tgene_id "G1"; transcript_id "T1"; gene_name "GENE1";
chr2\ttest\texon\t501\t900\t.\t-\t.\tgene_id "G2"; transcript_id "T2"; gene_name "GENE2";
"""


@pytest.fixture(scope="module")
def rna_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rna")
    rng = np.random.default_rng(123)
    chr1 = decode_bases(rng.integers(0, 4, 6000, dtype=np.uint8))
    chr2 = decode_bases(rng.integers(0, 4, 3000, dtype=np.uint8))
    with open(d / "ref.fa", "wb") as f:
        f.write(b">chr1\n" + chr1 + b"\n>chr2\n" + chr2 + b"\n")
    with open(d / "anno.gtf", "w") as f:
        f.write(GTF_TEXT)
    assert cli_main(["index", str(d / "ref.fa"), str(d / "gidx")]) == 0
    assert cli_main(["transcriptome", str(d / "anno.gtf"), str(d / "ref.fa"),
                     str(d / "tidx")]) == 0
    return d


def test_gtf_model(rna_dir):
    gtf = GTFReader.load(rna_dir / "anno.gtf")
    t1 = gtf.get_transcript("T1")
    assert t1.spliced_length == 300
    assert [i.length for i in t1.introns] == [300, 500]
    # tpos 1 -> first exon base; 1-based genome coords
    assert t1.genomic_position(1, 0) == 1001
    assert t1.genomic_position(100, 0) == 1100
    assert t1.genomic_position(101, 0) == 1401
    assert t1.genomic_position(300, 0) == 2100
    # span overrunning the transcript end -> 0
    assert t1.genomic_position(250, 100) == 0
    # junctions crossed by [51, 151): one junction at tpos 101
    j = t1.junctions(51, 100)
    assert len(j) == 1 and j[0][0] == 101 and j[0][1].length == 300
    # reference quirk: a span ending exactly at the exon boundary still
    # reports the following junction (the EXON >= end check fires one
    # feature too late, GTFReader.cpp:1109-1138)
    j = t1.junctions(1, 100)
    assert [x[0] for x in j] == [101]
    # strictly inside exon 1: no junctions
    assert t1.junctions(1, 99) == []
    # spanning both junctions
    j = t1.junctions(51, 200)
    assert [x[0] for x in j] == [101, 201]
    g1 = gtf.get_gene("G1")
    # default buffer is 1000 (GTFReader.h:290)
    assert g1.check_boundary("chr1", 1001)
    assert g1.check_boundary("chr1", 2100)
    assert g1.check_boundary("chr1", 3000)     # within the 1000 buffer
    assert not g1.check_boundary("chr1", 4000)
    assert not g1.check_boundary("chr2", 1001)
    assert not g1.check_boundary("chr1", 1001, buffer=0)  # start+1 off-by-one
    assert g1.check_boundary("chr1", 1002, buffer=0)
    assert {g.gene_id for g in gtf.interval_genes("chr1", 1050, 1060)} == {"G1"}
    assert gtf.interval_genes("chr1", 5000, 5100) == []


def test_transcriptome_build(rna_dir):
    genome = read_fasta_genome(rna_dir / "ref.fa")
    gtf = GTFReader.load(rna_dir / "anno.gtf")
    tg = build_transcriptome_genome(gtf, genome)
    assert set(tg.piece_names) == {"T1", "T2"}
    off = tg.offset_of_piece("T1")
    c1 = genome.offset_of_piece("chr1")
    want = np.concatenate([genome.codes[c1 + 1000:c1 + 1100],
                           genome.codes[c1 + 1400:c1 + 1500],
                           genome.codes[c1 + 2000:c1 + 2100]])
    got = tg.codes[off:off + 300]
    assert np.array_equal(got, want)


def test_insert_splice_junctions(rna_dir):
    gtf = GTFReader.load(rna_dir / "anno.gtf")
    t1 = gtf.get_transcript("T1")
    # 100-base match starting at tpos 51: crosses the first junction
    toks = insert_splice_junctions(t1, 51, [(100, "=")])
    assert toks == [(50, "="), (300, "N"), (50, "=")]
    # aligned strictly inside an exon: unchanged
    assert insert_splice_junctions(t1, 1, [(99, "=")]) == [(99, "=")]
    # reference quirk (LandauVishkin.cpp:180-225 + the Junctions off-by-one):
    # an op ending exactly at the exon boundary gets a trailing N op
    assert insert_splice_junctions(t1, 1, [(100, "=")]) == \
        [(100, "="), (300, "N")]
    # spanning both junctions
    toks = insert_splice_junctions(t1, 51, [(200, "M")])
    assert toks == [(50, "M"), (300, "N"), (100, "M"), (500, "N"), (50, "M")]
    # insertions don't consume transcript bases; S passes through; the op
    # ending on the boundary takes the N before the insertion
    toks = insert_splice_junctions(t1, 96, [(5, "S"), (5, "="), (2, "I"), (8, "=")])
    assert toks == [(5, "S"), (5, "="), (300, "N"), (2, "I"), (8, "=")]
    # read occupying exon 2 exactly: no junction at the start (the walk
    # never reports it), trailing-N quirk at the end
    toks = insert_splice_junctions(t1, 101, [(100, "=")])
    assert toks == [(100, "="), (500, "N")]


def _write_fastq(path, reads):
    with open(path, "wb") as f:
        for rid, seq in reads:
            f.write(b"@" + rid + b"\n" + seq + b"\n+\n" + b"I" * len(seq) + b"\n")


def _parse_sam(path):
    recs = {}
    for line in open(path, "rb"):
        if line.startswith(b"@"):
            continue
        f = line.decode().rstrip("\n").split("\t")
        recs.setdefault(f[0], []).append(
            dict(flag=int(f[1]), rname=f[2], pos=int(f[3]), mapq=int(f[4]),
                 cigar=f[5], tags=f[11:]))
    return recs


@pytest.mark.slow
def test_rna_single_end(rna_dir, tmp_path):
    d = rna_dir
    genome = read_fasta_genome(d / "ref.fa")
    gtf = GTFReader.load(d / "anno.gtf")
    tg = build_transcriptome_genome(gtf, genome)
    t1 = tg.codes[tg.offset_of_piece("T1"):tg.offset_of_piece("T1") + 300]

    reads = [
        # spliced read: T1 tpos 51..150 (50 bases exon1 + 50 bases exon2)
        (b"spliced", decode_bases(t1[50:150])),
        # exonic read: inside exon 1 -> genome and transcriptome tie,
        # transcriptome wins the tie
        (b"exonic", decode_bases(t1[0:100])),
        # intergenic read: genome-only alignment at chr1:4000
        (b"genomic", decode_bases(
            genome.codes[genome.offset_of_piece("chr1") + 4000:
                         genome.offset_of_piece("chr1") + 4100])),
    ]
    out = tmp_path / "rna.sam"
    _write_fastq(tmp_path / "r.fq", reads)
    assert cli_main(["single", str(d / "gidx"), str(d / "tidx"),
                     str(d / "anno.gtf"), str(tmp_path / "r.fq"),
                     "-o", str(out)]) == 0
    recs = _parse_sam(out)

    sp = recs["spliced"][0]
    assert sp["rname"] == "chr1" and sp["pos"] == 1051
    assert sp["cigar"] == "50=300N50="
    assert "NM:i:0" in sp["tags"]

    ex = recs["exonic"][0]
    assert ex["rname"] == "chr1" and ex["pos"] == 1001
    # exon-boundary-ending read carries the reference's trailing-N quirk
    assert ex["cigar"] == "100=300N"

    gn = recs["genomic"][0]
    assert gn["rname"] == "chr1" and gn["pos"] == 4001
    assert gn["cigar"] == "100="

    # run outputs: read counts + fusion interval files
    prefix = str(tmp_path / "rna")
    assert os.path.exists(prefix + ".gene_id.counts.txt")
    counts = dict(l.split("\t") for l in
                  open(prefix + ".gene_id.counts.txt").read().splitlines())
    assert float(counts["G1"]) >= 2.0   # spliced + exonic both hit G1
    assert os.path.exists(prefix + ".read_intervals.txt")


@pytest.mark.slow
def test_rna_paired_end(rna_dir, tmp_path):
    d = rna_dir
    genome = read_fasta_genome(d / "ref.fa")
    gtf = GTFReader.load(d / "anno.gtf")
    tg = build_transcriptome_genome(gtf, genome)
    t1 = tg.codes[tg.offset_of_piece("T1"):tg.offset_of_piece("T1") + 300]

    # mate 0 forward tpos 11..110 (90 bases exon1 + 10 bases exon2); mate 1
    # RC of tpos 151..250 (50 bases exon2 + 50 bases exon3).  Neither mate
    # ends exactly on an exon boundary — a mate that does walks into a
    # zero-length final segment in the reference's counting walk and the
    # whole fragment goes uncounted (GTFReader.cpp:1540-1580).
    r0 = decode_bases(t1[10:110])
    r1 = decode_bases(reverse_complement_codes(t1[150:250]))
    _write_fastq(tmp_path / "p0.fq", [(b"pair1", r0)])
    _write_fastq(tmp_path / "p1.fq", [(b"pair1", r1)])
    out = tmp_path / "rna_paired.sam"
    # -tmh 32 bounds the multi-hit buffers for CI (default is the
    # reference's 1000, PairedAligner.cpp:584 — same results whenever the
    # actual hit count fits, as here)
    assert cli_main(["paired", str(d / "gidx"), str(d / "tidx"),
                     str(d / "anno.gtf"), str(tmp_path / "p0.fq"),
                     str(tmp_path / "p1.fq"), "-o", str(out),
                     "-tmh", "32"]) == 0
    recs = _parse_sam(out)
    assert len(recs["pair1"]) == 2
    first = [r for r in recs["pair1"] if r["flag"] & 0x40][0]
    second = [r for r in recs["pair1"] if r["flag"] & 0x80][0]
    assert first["rname"] == "chr1" and first["pos"] == 1011
    assert first["cigar"] == "90=300N10="
    assert second["rname"] == "chr1" and second["pos"] == 1451
    assert second["cigar"] == "50=500N50="
    assert second["flag"] & 0x10  # reverse strand
    # paired fragment counted once for gene G1 with full weight on T1
    counts = dict(l.split("\t") for l in
                  open(str(tmp_path / "rna_paired") +
                       ".transcript_id.counts.txt").read().splitlines())
    assert float(counts["T1"]) == 1.0


def test_batch_characterizer_matches_host(tmp_path):
    """Device-side CharacterizeSeeds == the host per-read walk."""
    import numpy as np
    from snap_rnaseq_tpu.index.genome import genome_from_codes
    from snap_rnaseq_tpu.index.hash_index import build_index
    from snap_rnaseq_tpu.models.single import SingleAligner
    from snap_rnaseq_tpu.rna.filter import (BatchCharacterizer,
                                            characterize_seeds)
    from snap_rnaseq_tpu.utils.tables import reverse_complement_codes

    rng = np.random.default_rng(21)
    codes = rng.integers(0, 4, 120000, dtype=np.uint8)
    # a repeated block so some seeds have multi-hit overflow lists
    codes[40000:40200] = codes[1000:1200]
    g = genome_from_codes(codes)
    idx = build_index(g, seed_len=20)
    al = SingleAligner(idx)

    B, L = 24, 100
    reads = np.zeros((B, L), np.uint8)
    pad = int(g.piece_offsets[0])
    for i in range(B):
        s = pad + int(rng.integers(0, 120000 - L))
        r = np.asarray(g.codes[s:s + L]).copy()
        for _ in range(int(rng.integers(0, 3))):
            p = int(rng.integers(0, L))
            r[p] = (r[p] + int(rng.integers(1, 4))) % 4
        if i % 3 == 0:
            r = reverse_complement_codes(r)
        if i == 5:
            r[:] = 4            # all-N: no valid seeds
        reads[i] = r

    bc = BatchCharacterizer(idx, al._dev, al.genome_size, cuckoo=al._cuckoo)
    rows = bc.characterize(reads)
    for i in range(B):
        fwd_d, rc_d = rows(i)
        fwd_h, rc_h = characterize_seeds(idx, reads[i])
        assert fwd_d == fwd_h, i
        assert rc_d == rc_h, i


@pytest.mark.slow
def test_rna_paired_paralog_multihit(tmp_path_factory):
    """Paralog reconciliation through transcriptome multi-hit depth
    (PairedAligner.cpp:584-614 maxHitsToGet): a fragment inside a region
    shared by two near-identical transcripts of one gene must (1) produce
    transcriptome hits in BOTH transcripts, (2) dedup to ONE genomic
    alignment (AlignmentFilter.cpp:113-214 keyed by genome coords), and
    (3) count fractionally 0.5/0.5 across the transcripts with one full
    gene count (GTFTranscript::IncrementReadCount, GTFReader.cpp:1063)."""
    import numpy as np
    d = tmp_path_factory.mktemp("paralog")
    rng = np.random.default_rng(77)
    chr1 = decode_bases(rng.integers(0, 4, 6000, dtype=np.uint8))
    with open(d / "ref.fa", "wb") as f:
        f.write(b">chr1\n" + chr1 + b"\n")
    # TA: exons 1001-1400, 2001-2200, 3001-3300; TB skips the middle exon
    # and starts exon 1 ten bases earlier — NEAR-identical, not identical:
    # exact duplicate exon coordinates dedup to the FIRST transcript's id
    # in the feature index (reference map-insert no-op, GTFReader.cpp:1323)
    # and would mask the fractional split this test asserts.
    gtf = []
    for tid, exons in (("TA", ((1001, 1400), (2001, 2200), (3001, 3300))),
                       ("TB", ((991, 1400), (3001, 3300)))):
        for s, e in exons:
            gtf.append(f'chr1\ttest\texon\t{s}\t{e}\t.\t+\t.\t'
                       f'gene_id "GP"; transcript_id "{tid}"; '
                       f'gene_name "PARA";')
    with open(d / "anno.gtf", "w") as f:
        f.write("\n".join(gtf) + "\n")
    assert cli_main(["index", str(d / "ref.fa"), str(d / "gidx")]) == 0
    assert cli_main(["transcriptome", str(d / "anno.gtf"), str(d / "ref.fa"),
                     str(d / "tidx")]) == 0

    genome = read_fasta_genome(d / "ref.fa")
    gtf_m = GTFReader.load(d / "anno.gtf")
    tg = build_transcriptome_genome(gtf_m, genome)
    ta = tg.codes[tg.offset_of_piece("TA"):tg.offset_of_piece("TA") + 900]
    # both mates inside shared exon 1 (TA tpos == TB tpos there)
    r0 = decode_bases(ta[10:110])
    r1 = decode_bases(reverse_complement_codes(ta[250:350]))
    _write_fastq(d / "p0.fq", [(b"frag", r0)])
    _write_fastq(d / "p1.fq", [(b"frag", r1)])
    out = d / "paralog.sam"
    assert cli_main(["paired", str(d / "gidx"), str(d / "tidx"),
                     str(d / "anno.gtf"), str(d / "p0.fq"), str(d / "p1.fq"),
                     "-o", str(out), "-tmh", "64", "-bs", "64"]) == 0
    recs = _parse_sam(out)
    assert len(recs["frag"]) == 2           # exactly one alignment per mate
    for r in recs["frag"]:
        assert r["rname"] == "chr1"
    first = [r for r in recs["frag"] if r["flag"] & 0x40][0]
    assert first["pos"] == 1011             # genomic coords of exon-1 offset
    counts = dict(l.split("\t") for l in
                  open(str(d / "paralog") + ".transcript_id.counts.txt")
                  .read().splitlines())
    assert float(counts["TA"]) == 0.5 and float(counts["TB"]) == 0.5
    gcounts = dict(l.split("\t") for l in
                   open(str(d / "paralog") + ".gene_id.counts.txt")
                   .read().splitlines())
    assert float(gcounts["GP"]) == 1.0
