"""Golden-file regression for the paired-end and RNA pipelines.

Same strategy as test_golden.py (the reference's datatest golden-SAM
diffing): fixed simulated datasets must produce byte-identical SAM records
across code changes.  Regenerate intentionally with:
    python tests/test_golden_paired_rna.py regen
and review the diff before committing.
"""
import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLDEN_PAIRED = os.path.join(GOLDEN_DIR, "paired_100bp.sam")
GOLDEN_RNA = os.path.join(GOLDEN_DIR, "rna_single_100bp.sam")


def _strip_pg(path):
    lines = [l for l in open(path).read().splitlines()
             if not l.startswith("@PG")]
    return "\n".join(lines) + "\n"


def _build_ref(tmp):
    from snap_rnaseq_tpu.index.genome import read_fasta_genome
    from snap_rnaseq_tpu.utils.tables import decode_bases
    rng = np.random.default_rng(77177)
    chr1 = decode_bases(rng.integers(0, 4, 60000, dtype=np.uint8))
    chr2 = decode_bases(rng.integers(0, 4, 30000, dtype=np.uint8))
    fa = os.path.join(tmp, "ref.fa")
    with open(fa, "wb") as f:
        f.write(b">chr1\n" + chr1 + b"\n>chr2\n" + chr2 + b"\n")
    gtf = os.path.join(tmp, "ann.gtf")
    rows = []
    for gid, tid, chrom, strand, exons in (
            ("gA", "tA1", "chr1", "+", [(2001, 2600), (4001, 4700),
                                        (7001, 7800)]),
            ("gA", "tA2", "chr1", "+", [(2001, 2600), (7001, 7800)]),
            ("gB", "tB1", "chr2", "-", [(9001, 9700), (12001, 12800)])):
        for i, (s, e) in enumerate(exons):
            rows.append(f'{chrom}\tsrc\texon\t{s}\t{e}\t.\t{strand}\t.\t'
                        f'gene_id "{gid}"; transcript_id "{tid}"; '
                        f'exon_number "{i + 1}";')
    open(gtf, "w").write("\n".join(rows) + "\n")
    return fa, gtf, read_fasta_genome(fa)


def _paired_dataset(tmp, g):
    from snap_rnaseq_tpu.utils.tables import decode_bases, reverse_complement_codes
    rng = np.random.default_rng(424242)
    L = 100
    f0 = open(os.path.join(tmp, "r1.fq"), "wb")
    f1 = open(os.path.join(tmp, "r2.fq"), "wb")
    codes = np.asarray(g.codes)
    n = 0
    while n < 48:
        ins = int(rng.integers(220, 420))
        piece = int(rng.integers(0, 2))
        base = int(g.piece_offsets[piece])
        plen = 60000 if piece == 0 else 30000
        s = base + int(rng.integers(0, plen - ins))
        frag = codes[s:s + ins]
        if (frag > 3).any():
            continue
        a = frag[:L].copy()
        b = reverse_complement_codes(frag[ins - L:].copy())
        for r in (a, b):
            for _ in range(int(rng.integers(0, 3))):
                p = int(rng.integers(0, L))
                r[p] = (r[p] + int(rng.integers(1, 4))) % 4
        f0.write(b"@gp%d/1\n" % n + decode_bases(a) + b"\n+\n" + b"I" * L + b"\n")
        f1.write(b"@gp%d/2\n" % n + decode_bases(b) + b"\n+\n" + b"I" * L + b"\n")
        n += 1
    f0.close()
    f1.close()
    return os.path.join(tmp, "r1.fq"), os.path.join(tmp, "r2.fq")


def _rna_dataset(tmp, g, gtf_path):
    """Reads cut from the spliced tA1 transcript + genomic reads."""
    from snap_rnaseq_tpu.rna.gtf import GTFReader
    from snap_rnaseq_tpu.utils.tables import decode_bases, reverse_complement_codes
    rng = np.random.default_rng(515151)
    gtf = GTFReader.load(gtf_path)
    t = gtf.get_transcript("tA1")
    codes = np.asarray(g.codes)
    base = int(g.piece_offsets[0])
    # transcript sequence = concatenated exons (1-based GTF coords)
    tseq = np.concatenate([codes[base + s - 1: base + e]
                           for s, e in ((2001, 2600), (4001, 4700),
                                        (7001, 7800))])
    L = 100
    path = os.path.join(tmp, "reads.fq")
    with open(path, "wb") as f:
        for i in range(24):
            off = int(rng.integers(0, len(tseq) - L))
            r = tseq[off:off + L].copy()
            if i % 4 == 0:
                p = int(rng.integers(0, L))
                r[p] = (r[p] + int(rng.integers(1, 4))) % 4
            if i % 2:
                r = reverse_complement_codes(r)
            f.write(b"@rt%d\n" % i + decode_bases(r) + b"\n+\n" + b"I" * L + b"\n")
        for i in range(12):
            piece = int(rng.integers(0, 2))
            pb = int(g.piece_offsets[piece])
            plen = 60000 if piece == 0 else 30000
            s = pb + int(rng.integers(0, plen - L))
            r = codes[s:s + L].copy()
            if (r > 3).any():
                continue
            f.write(b"@rg%d\n" % i + decode_bases(r) + b"\n+\n" + b"I" * L + b"\n")
    return path


def _run(tmp):
    from snap_rnaseq_tpu.cli import main as cli
    fa, gtf, g = _build_ref(tmp)
    gidx = os.path.join(tmp, "gidx")
    tidx = os.path.join(tmp, "tidx")
    assert cli(["index", fa, gidx]) == 0
    assert cli(["transcriptome", gtf, fa, tidx]) == 0

    r1, r2 = _paired_dataset(tmp, g)
    paired_out = os.path.join(tmp, "paired.sam")
    assert cli(["paired", gidx, r1, r2, "-o", paired_out]) == 0

    rna_reads = _rna_dataset(tmp, g, gtf)
    rna_out = os.path.join(tmp, "rna.sam")
    assert cli(["single", gidx, tidx, gtf, rna_reads, "-o", rna_out]) == 0
    return _strip_pg(paired_out), _strip_pg(rna_out)


@pytest.mark.slow
def test_golden_paired_and_rna(tmp_path):
    got_paired, got_rna = _run(str(tmp_path))
    for path, got in ((GOLDEN_PAIRED, got_paired), (GOLDEN_RNA, got_rna)):
        assert os.path.exists(path), \
            f"golden file missing — run: python {__file__} regen"
        assert got == open(path).read(), path
    # the RNA golden must actually contain spliced records
    assert any("N" in l.split("\t")[5] for l in got_rna.splitlines()
               if l and not l.startswith("@"))


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")   # regen runs without conftest
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        import tempfile
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with tempfile.TemporaryDirectory() as tmp:
            got_paired, got_rna = _run(tmp)
        open(GOLDEN_PAIRED, "w").write(got_paired)
        open(GOLDEN_RNA, "w").write(got_rna)
        print(f"regenerated {GOLDEN_PAIRED} and {GOLDEN_RNA}")
