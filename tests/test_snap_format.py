"""Interop with the reference SNAP on-disk index format.

The fixture tarball (tests/fixtures/snap_oracle.tar.gz) holds *data files
produced by running the reference binary* on a tiny synthetic genome we
generated: a genome index ('snap index'), a transcriptome index + GTF
('snap transcriptome'), and the reference's own SAM output for 200 exact
100bp reads aligned against an index that OUR writer exported (i.e. the
reference binary consumed write_snap_index() output directly).  No reference
code is included — only file-format bytes, which is exactly what an interop
test needs.

Covers:
  * load_snap_index on a real reference-built index == native build_index
    lookups on the identical genome (GenomeIndex.cpp:845-960 semantics);
  * write_snap_index -> load_snap_index roundtrip;
  * GenomeIndex.load / CLI transparently accepting reference-format dirs;
  * full RNA pipeline driven off reference-format genome+transcriptome
    indices, position-level parity with the reference's SAM output.
"""
import os
import tarfile

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "snap_oracle.tar.gz")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    root = tmp_path_factory.mktemp("snap_oracle")
    with tarfile.open(FIXTURE) as tf:
        tf.extractall(root, filter="data")
    return root / "snap_oracle"


def _sampled_lookups(index, n=1500, seed=0):
    from snap_rnaseq_tpu.index.seeds import pack_all_seeds
    fwd, rc, pos = pack_all_seeds(np.asarray(index.genome.codes),
                                  index.seed_len)
    rng = np.random.default_rng(seed)
    sel = rng.choice(len(pos), size=min(n, len(pos)), replace=False)
    return [(int(fwd[i]), int(rc[i])) for i in sel]


def test_load_reference_built_index_matches_native_build(oracle):
    from snap_rnaseq_tpu.index.hash_index import build_index
    from snap_rnaseq_tpu.index.snap_format import load_snap_index

    idx = load_snap_index(str(oracle / "genome_idx"))
    assert idx.seed_len == 20
    assert idx.genome.piece_names == ["chrA", "chrB"]
    assert list(idx.genome.piece_offsets) == [500, 25000]

    native = build_index(idx.genome, idx.seed_len)
    for fwd, rc in _sampled_lookups(idx):
        h1, r1 = idx.lookup_seed(fwd, rc)
        h2, r2 = native.lookup_seed(fwd, rc)
        assert np.array_equal(np.sort(h1), np.sort(h2))
        assert np.array_equal(np.sort(r1), np.sort(r2))


def test_reference_transcriptome_index_loads(oracle):
    from snap_rnaseq_tpu.index.snap_format import load_snap_index

    tidx = load_snap_index(str(oracle / "transcriptome_idx"))
    # 4 transcripts -> 4 pieces; names are the transcript ids
    assert tidx.genome.num_pieces == 4
    assert sorted(tidx.genome.piece_names) == ["tA1", "tA2", "tA3", "tB1"]


def test_write_roundtrip(oracle, tmp_path):
    from snap_rnaseq_tpu.index.genome import read_fasta_genome
    from snap_rnaseq_tpu.index.hash_index import GenomeIndex, build_index
    from snap_rnaseq_tpu.index.snap_format import (is_snap_format_dir,
                                                   load_snap_index,
                                                   write_snap_index)

    g = read_fasta_genome(str(oracle / "fix_ref.fa"))
    native = build_index(g, 20)
    out = tmp_path / "exported"
    write_snap_index(native, str(out))
    assert is_snap_format_dir(str(out))
    again = load_snap_index(str(out))
    assert np.array_equal(np.asarray(again.genome.codes),
                          np.asarray(g.codes))
    for fwd, rc in _sampled_lookups(native, n=800, seed=1):
        a = native.lookup_seed(fwd, rc)
        b = again.lookup_seed(fwd, rc)
        for x, y in zip(a, b):
            assert np.array_equal(x, y)

    # GenomeIndex.load transparently dispatches on the 4-file layout
    via_load = GenomeIndex.load(str(out))
    f, r = _sampled_lookups(native, n=1, seed=2)[0]
    ha, ra = via_load.lookup_seed(f, r)
    hb, rb = native.lookup_seed(f, r)
    assert np.array_equal(ha, hb) and np.array_equal(ra, rb)


@pytest.mark.slow
def test_rna_pipeline_on_reference_indices_matches_reference_sam(
        oracle, tmp_path):
    """Align the fixture reads through our CLI using the reference-format
    genome AND transcriptome index dirs, then compare against the SAM the
    reference binary itself produced for the same inputs."""
    from snap_rnaseq_tpu.cli import main as cli

    out = tmp_path / "ours.sam"
    rc = cli(["single", str(oracle / "genome_idx"),
              str(oracle / "transcriptome_idx"), str(oracle / "fix_ann.gtf"),
              str(oracle / "fix_reads.fq"), "-o", str(out)])
    assert rc == 0

    def parse(path):
        recs = {}
        for line in open(path):
            if line.startswith("@"):
                continue
            f = line.rstrip("\n").split("\t")
            recs[f[0]] = (int(f[1]), f[2], int(f[3]), int(f[4]), f[5])
        return recs

    theirs = parse(str(oracle / "oracle_out.sam"))
    ours = parse(str(out))
    assert set(ours) == set(theirs)

    mismatches = []
    for name, (tflag, trn, tpos, tmapq, tcig) in theirs.items():
        oflag, orn, opos, omapq, ocig = ours[name]
        # reads are exact substrings: both sides must place every uniquely
        # mappable read identically (flag strand bit, chromosome, position)
        if tmapq >= 10:
            if (oflag & 0x10, orn, opos) != (tflag & 0x10, trn, tpos):
                mismatches.append((name, theirs[name], ours[name]))
    assert not mismatches, mismatches[:5]


def _parse_sam(path):
    recs = {}
    for line in open(path):
        if line.startswith("@"):
            continue
        f = line.rstrip("\n").split("\t")
        flag = int(f[1])
        key = (f[0], flag & 0xC0)  # name + first/second-in-pair bits
        recs[key] = (flag, f[2], int(f[3]), int(f[4]), f[5])
    return recs


def _position_agreement(theirs, ours, min_mapq=10):
    total = agree = 0
    bad = []
    for key, (tflag, trn, tpos, tmapq, _) in theirs.items():
        if tmapq < min_mapq or (tflag & 0x4):
            continue
        total += 1
        oflag, orn, opos, _, _ = ours[key]
        if (oflag & 0x10, orn, opos) == (tflag & 0x10, trn, tpos):
            agree += 1
        else:
            bad.append((key, (tflag, trn, tpos), (oflag, orn, opos)))
    return total, agree, bad


def test_mutated_reads_position_parity(oracle, tmp_path):
    """Reads with up to 3 SNPs, half reverse-complemented: our aligner must
    place the reference's confident alignments at the same spot."""
    from snap_rnaseq_tpu.cli import main as cli

    out = tmp_path / "mut.sam"
    assert cli(["single", str(oracle / "genome_idx"),
                str(oracle / "transcriptome_idx"),
                str(oracle / "fix_ann.gtf"),
                str(oracle / "fix_reads_mut.fq"), "-o", str(out)]) == 0
    theirs = _parse_sam(str(oracle / "oracle_mut.sam"))
    ours = _parse_sam(str(out))
    assert set(ours) == set(theirs)
    total, agree, bad = _position_agreement(theirs, ours)
    # identical seed schedules + LV semantics: demand full agreement; if a
    # deliberate behavior change ever breaks a case, inspect `bad` first.
    assert agree == total, (total - agree, bad[:5])


@pytest.mark.slow
def test_wgsim_pairs_position_and_mapq_parity(oracle, tmp_path):
    """SNP-dense wgsim-named pairs (1.5% SNP): positions AND MAPQ values
    must match the reference binary record-for-record.  This is the case
    class that caught the per-direction seed budget bug and the pair-sum
    MAPQ gate bug (see PARITY.md)."""
    from snap_rnaseq_tpu.cli import main as cli

    out = tmp_path / "wg.sam"
    assert cli(["paired", str(oracle / "genome_idx"),
                str(oracle / "transcriptome_idx"),
                str(oracle / "fix_ann.gtf"),
                str(oracle / "fix_wg1.fq"), str(oracle / "fix_wg2.fq"),
                "-o", str(out)]) == 0
    def norm(recs):
        # the reference's SAM writer trims the /1 /2 mate suffix; ours keeps
        # the id as sequenced — normalize for the comparison
        return {(k[0].split("/")[0], k[1]): v for k, v in recs.items()}

    theirs = norm(_parse_sam(str(oracle / "fix_wg_oracle.sam")))
    ours = norm(_parse_sam(str(out)))
    assert set(ours) == set(theirs)
    total, agree, bad = _position_agreement(theirs, ours)
    assert agree == total, (total - agree, bad[:5])
    mapq_bad = [(k, v[3], ours[k][3]) for k, v in theirs.items()
                if v[3] >= 10 and ours[k][3] != v[3]]
    assert not mapq_bad, mapq_bad[:8]


def test_paired_reads_position_parity(oracle, tmp_path):
    """FR pairs, insert 200-400, one SNP per end, vs the reference binary's
    paired-end output (which itself ran on our exported index)."""
    from snap_rnaseq_tpu.cli import main as cli

    out = tmp_path / "paired.sam"
    assert cli(["paired", str(oracle / "genome_idx"),
                str(oracle / "transcriptome_idx"),
                str(oracle / "fix_ann.gtf"),
                str(oracle / "fix_p1.fq"), str(oracle / "fix_p2.fq"),
                "-o", str(out)]) == 0
    theirs = _parse_sam(str(oracle / "oracle_paired.sam"))
    ours = _parse_sam(str(out))
    assert set(ours) == set(theirs)
    total, agree, bad = _position_agreement(theirs, ours)
    assert agree == total, (total - agree, bad[:5])
