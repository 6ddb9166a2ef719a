"""Multi-chip sharded alignment on the virtual 8-device CPU mesh: the
sharded engine must produce the same results as the single-chip engine."""
import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from snap_rnaseq_tpu.index.genome import genome_from_codes
from snap_rnaseq_tpu.index.hash_index import build_index
from snap_rnaseq_tpu.models.single import SingleAligner
from snap_rnaseq_tpu.parallel.sharded import ShardedSingleAligner
from snap_rnaseq_tpu.utils.tables import reverse_complement_codes



# full-mesh e2e comparisons are minutes-scale on the CI host
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, 300000, dtype=np.uint8)
    g = genome_from_codes(codes)
    idx = build_index(g, seed_len=20)

    B, L = 32, 100
    starts = rng.integers(0, 300000 - L, B)
    reads = np.stack([codes[s:s + L] for s in starts])
    for i in range(B):
        r = reads[i].copy()
        for _ in range(int(rng.integers(0, 3))):
            p = rng.integers(0, L)
            r[p] = (r[p] + rng.integers(1, 4)) % 4
        if i % 2:
            r = reverse_complement_codes(r)
        reads[i] = r
    quals = np.full((B, L), ord("I"), np.uint8)
    return idx, reads, quals, starts, g


def test_sharded_matches_single_chip(setup):
    idx, reads, quals, starts, g = setup
    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("data", "index"))

    single = SingleAligner(idx, cand_per_read=64, max_seed_slots=32)
    ref = single.align_batch(reads, quals)

    sharded = ShardedSingleAligner(idx, mesh, cand_per_read=64, max_seed_slots=32)
    out = sharded.align_batch(reads, quals)

    np.testing.assert_array_equal(out["result"], ref["result"])
    np.testing.assert_array_equal(out["loc"], ref["loc"])
    np.testing.assert_array_equal(out["direction"], ref["direction"])
    np.testing.assert_array_equal(out["score"], ref["score"])
    np.testing.assert_array_equal(out["mapq"], ref["mapq"])
    # sanity: the reads actually aligned to their simulated origins
    ok = 0
    for i in range(len(starts)):
        want = starts[i] + g.piece_offsets[0]
        if abs(int(out["loc"][i]) - int(want)) <= 2:
            ok += 1
    assert ok >= len(starts) - 1


def test_sharded_paired_matches_single_chip(setup):
    from snap_rnaseq_tpu.models.paired import PairedAligner
    from snap_rnaseq_tpu.parallel.sharded import ShardedPairedAligner

    idx, _, _, _, g = setup
    codes = np.asarray(g.codes)
    rng = np.random.default_rng(11)
    B, L = 16, 100
    r0 = np.zeros((B, L), np.uint8)
    r1 = np.zeros((B, L), np.uint8)
    starts = []
    pad = int(g.piece_offsets[0])
    for i in range(B):
        ins = int(rng.integers(200, 400))
        s = int(rng.integers(pad, pad + 300000 - ins))
        frag = codes[s:s + ins]
        a = frag[:L].copy()
        b = reverse_complement_codes(frag[ins - L:].copy())
        for r in (a, b):
            p = int(rng.integers(0, L))
            r[p] = (r[p] + int(rng.integers(1, 4))) % 4
        r0[i], r1[i] = a, b
        starts.append(s)
    quals = np.full((B, L), ord("I"), np.uint8)

    single = PairedAligner(idx, cand_per_read=64, max_seed_slots=32)
    ref = single.align_batch(r0, quals, r1, quals)

    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("data", "index"))
    sharded = ShardedPairedAligner(idx, mesh, cand_per_read=64,
                                   max_seed_slots=32)
    out = sharded.align_batch(r0, quals, r1, quals)

    for k in ("pair_found", "result0", "loc0", "dir0", "score0", "mapq0",
              "result1", "loc1", "dir1", "score1", "mapq1", "pair_mapq"):
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)
    # pairs land at their simulated origins
    assert (np.abs(out["loc0"].astype(np.int64) - np.asarray(starts)) <= 2).sum() >= B - 1


def test_sharded_rna_pipeline_matches_default(tmp_path):
    """The RNA single-end pipeline with mesh-sharded aligners injected must
    produce byte-identical SAM output to the stock single-chip pipeline."""
    import os
    from snap_rnaseq_tpu.cli import main as cli
    from snap_rnaseq_tpu.models.pipeline import PipelineOptions
    from snap_rnaseq_tpu.rna.pipeline import RnaSingleEndPipeline
    from snap_rnaseq_tpu.index.hash_index import GenomeIndex
    from snap_rnaseq_tpu.utils.tables import decode_bases, reverse_complement_codes

    rng = np.random.default_rng(31)
    chrom = decode_bases(rng.integers(0, 4, 30000, dtype=np.uint8))
    fa = tmp_path / "ref.fa"
    fa.write_bytes(b">chr1\n" + chrom + b"\n")
    gtf = tmp_path / "ann.gtf"
    rows = []
    for i, (s, e) in enumerate([(2001, 2500), (5001, 5600), (8001, 8700)]):
        rows.append(f'chr1\tsrc\texon\t{s}\t{e}\t.\t+\t.\t'
                    f'gene_id "g1"; transcript_id "t1"; exon_number "{i+1}";')
    gtf.write_text("\n".join(rows) + "\n")
    gidx, tidx = str(tmp_path / "gidx"), str(tmp_path / "tidx")
    assert cli(["index", str(fa), gidx]) == 0
    assert cli(["transcriptome", str(gtf), str(fa), tidx]) == 0

    # reads: spliced (cross exon1/exon2 junction) + genomic + mutated
    from snap_rnaseq_tpu.index.genome import read_fasta_genome
    g = read_fasta_genome(str(fa))
    codes = np.asarray(g.codes)
    base = int(g.piece_offsets[0])
    tseq = np.concatenate([codes[base + 2000:base + 2500],
                           codes[base + 5000:base + 5600],
                           codes[base + 8000:base + 8700]])
    L = 100
    fq = tmp_path / "reads.fq"
    with open(fq, "wb") as f:
        for i in range(16):
            off = int(rng.integers(420, 520))  # spans the first junction
            r = tseq[off:off + L].copy()
            if i % 2:
                r = reverse_complement_codes(r)
            f.write(b"@s%d\n" % i + decode_bases(r) + b"\n+\n" + b"I" * L + b"\n")
        for i in range(16):
            s = base + int(rng.integers(0, 30000 - L))
            r = codes[s:s + L].copy()
            p = int(rng.integers(0, L))
            r[p] = (r[p] + 1) % 4
            f.write(b"@g%d\n" % i + decode_bases(r) + b"\n+\n" + b"I" * L + b"\n")

    def run(out_name, **kw):
        out = str(tmp_path / out_name)
        pipe = RnaSingleEndPipeline(
            gidx, tidx, str(gtf),
            options=PipelineOptions(batch_size=32), **kw)
        pipe.run(str(fq), out)
        return "\n".join(l for l in open(out).read().splitlines()
                         if not l.startswith("@PG"))

    want = run("stock.sam", cand_per_read=64, max_seed_slots=32)

    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("data", "index"))
    g_idx_obj = GenomeIndex.load(gidx)
    t_idx_obj = GenomeIndex.load(tidx)
    got = run("sharded.sam",
              g_aligner=ShardedSingleAligner(g_idx_obj, mesh,
                                             cand_per_read=64,
                                             max_seed_slots=32),
              t_aligner=ShardedSingleAligner(t_idx_obj, mesh,
                                             cand_per_read=64,
                                             max_seed_slots=32))
    assert got == want
    assert any("N" in l.split("\t")[5] for l in got.splitlines()
               if l and not l.startswith("@"))
