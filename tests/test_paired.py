"""Paired-end engine + pipeline tests on simulated read pairs."""
import numpy as np
import pytest

from snap_rnaseq_tpu.index.genome import genome_from_codes
from snap_rnaseq_tpu.index.hash_index import build_index
from snap_rnaseq_tpu.models.paired import PairedAligner
from snap_rnaseq_tpu.utils.tables import decode_bases, reverse_complement_codes


@pytest.fixture(scope="module")
def sim():
    rng = np.random.default_rng(11)
    G = 300000
    codes = rng.integers(0, 4, G, dtype=np.uint8)
    g = genome_from_codes(codes)
    idx = build_index(g, seed_len=20)

    B, L, FRAG = 48, 100, 300
    starts = rng.integers(0, G - FRAG, B)
    r0 = np.zeros((B, L), np.uint8)
    r1 = np.zeros((B, L), np.uint8)
    for i, s in enumerate(starts):
        fwd = codes[s:s + L].copy()
        rc = reverse_complement_codes(codes[s + FRAG - L:s + FRAG])
        for arr in (fwd, rc):
            for _ in range(int(rng.integers(0, 3))):
                p = rng.integers(0, L)
                arr[p] = (arr[p] + rng.integers(1, 4)) % 4
        # read0 forward, read1 is the RC mate (standard FR orientation)
        r0[i], r1[i] = fwd, rc
    q = np.full((B, L), ord("I"), np.uint8)
    return idx, g, r0, r1, q, starts, FRAG, L


@pytest.mark.slow
def test_paired_alignment(sim):
    idx, g, r0, r1, q, starts, FRAG, L = sim
    al = PairedAligner(idx, cand_per_read=64, max_seed_slots=32)
    out = al.align_batch(r0, q, r1, q)
    B = r0.shape[0]
    base = int(g.piece_offsets[0])
    n_pairs = int(out["pair_found"].sum())
    assert n_pairs >= B - 1
    ok = 0
    for i in range(B):
        want0 = starts[i] + base
        want1 = starts[i] + FRAG - L + base
        if (abs(int(out["loc0"][i]) - want0) <= 2
                and abs(int(out["loc1"][i]) - want1) <= 2
                and out["dir0"][i] == 0 and out["dir1"][i] == 1):
            ok += 1
    assert ok >= B - 1
    assert (out["mapq0"][out["pair_found"]] >= 10).mean() > 0.9


@pytest.mark.slow
def test_chimeric_fallback(sim):
    """Ends mapping outside the spacing window still align via fallback."""
    idx, g, r0, r1, q, starts, FRAG, L = sim
    al = PairedAligner(idx, cand_per_read=64, max_seed_slots=32,
                       max_spacing=150)  # fragment is 300 -> no valid pairs
    out = al.align_batch(r0[:8], q[:8], r1[:8], q[:8])
    assert not out["pair_found"].any()
    base = int(g.piece_offsets[0])
    for i in range(8):
        assert out["result0"][i] != 0
        assert abs(int(out["loc0"][i]) - (starts[i] + base)) <= 2


@pytest.mark.slow
def test_paired_pipeline_sam(tmp_path, sim):
    idx, g, r0, r1, q, starts, FRAG, L = sim
    from snap_rnaseq_tpu.index.genome import write_fasta
    from snap_rnaseq_tpu.cli import main as cli_main

    idx_dir = tmp_path / "idx"
    idx.save(str(idx_dir))
    with open(tmp_path / "r1.fq", "wb") as f0, open(tmp_path / "r2.fq", "wb") as f1:
        for i in range(r0.shape[0]):
            f0.write(b"@p%d\n" % i + decode_bases(r0[i]) + b"\n+\n" + b"I" * L + b"\n")
            f1.write(b"@p%d\n" % i + decode_bases(r1[i]) + b"\n+\n" + b"I" * L + b"\n")
    rc = cli_main(["paired", str(idx_dir), str(tmp_path / "r1.fq"),
                   str(tmp_path / "r2.fq"), "-o", str(tmp_path / "out.sam")])
    assert rc == 0
    recs = [l.decode().split("\t") for l in open(tmp_path / "out.sam", "rb")
            if not l.startswith(b"@")]
    assert len(recs) == 2 * r0.shape[0]
    by_name = {}
    for f in recs:
        by_name.setdefault(f[0], []).append(f)
    for name, pair in by_name.items():
        assert len(pair) == 2
        a, b = pair
        fa, fb = int(a[1]), int(b[1])
        assert fa & 0x1 and fb & 0x1          # paired flag
        assert (fa & 0x40) != (fb & 0x40) or (fa & 0x80) != (fb & 0x80)
        if not (fa & 0x4) and not (fb & 0x4):
            assert fa & 0x2                    # proper pair
            assert a[6] == "=" and b[6] == "="
            tlen_a, tlen_b = int(a[8]), int(b[8])
            assert tlen_a == -tlen_b and abs(tlen_a) == 300


def test_read_ids_match():
    from snap_rnaseq_tpu.io.readers import read_ids_match
    assert read_ids_match(b"foo/1", b"foo/2")
    assert read_ids_match(b"foo 1", b"foo 2")
    assert read_ids_match(b"foo", b"foo")
    assert not read_ids_match(b"foo", b"fop")
    assert not read_ids_match(b"foo", b"foox")
    assert not read_ids_match(b"foo/1", b"fo1/1")
    # terminator must appear at the same position in both
    assert not read_ids_match(b"foo 1", b"foox")


def test_paired_inputs_variants(tmp_path, sim):
    """Interleaved FASTQ, ID-mismatch error + -I, multi-pair inputs."""
    idx, g, r0, r1, q, starts, FRAG, L = sim
    from snap_rnaseq_tpu.cli import main as cli_main

    idx_dir = tmp_path / "idx"
    idx.save(str(idx_dir))
    B = r0.shape[0]

    def rec(name, arr):
        return b"@" + name + b"\n" + decode_bases(arr) + b"\n+\n" + b"I" * L + b"\n"

    # two-file baseline with /1 /2 suffixes
    with open(tmp_path / "a1.fq", "wb") as f0, open(tmp_path / "a2.fq", "wb") as f1:
        for i in range(B):
            f0.write(rec(b"p%d/1" % i, r0[i]))
            f1.write(rec(b"p%d/2" % i, r1[i]))
    out0 = tmp_path / "two.sam"
    assert cli_main(["paired", str(idx_dir), str(tmp_path / "a1.fq"),
                     str(tmp_path / "a2.fq"), "-o", str(out0)]) == 0

    def positions(path):
        pos = {}
        for l in open(path):
            if l.startswith("@"):
                continue
            f = l.split("\t")
            pos[(f[0], int(f[1]) & 0xC0)] = (f[2], f[3], int(f[1]) & 0x10)
        return pos

    base = positions(out0)
    assert len(base) == 2 * B

    # interleaved single file: mates adjacent, paired by qname.  The
    # matcher returns (arriving read, stored mate) like the reference
    # (PairedReadMatcher.cpp:148-188), so /2 becomes read0 (flag 0x40) and
    # — via the ReadWriter.cpp:158 truncation typo — QNAMEs KEEP their
    # /1 /2 suffixes.  Same positions/strands per physical read.
    with open(tmp_path / "inter.fq", "wb") as f:
        for i in range(B):
            f.write(rec(b"p%d/1" % i, r0[i]))
            f.write(rec(b"p%d/2" % i, r1[i]))
    out1 = tmp_path / "inter.sam"
    assert cli_main(["paired", str(idx_dir), str(tmp_path / "inter.fq"),
                     "-o", str(out1)]) == 0
    inter = {}
    for l in open(out1):
        if l.startswith("@"):
            continue
        f = l.split("\t")
        qid, suff = f[0].rsplit("/", 1)
        inter[(qid, suff)] = (f[2], f[3], int(f[1]) & 0x10)
    assert len(inter) == 2 * B
    for i in range(B):
        for suff, flagbit in (("1", 0x40), ("2", 0x80)):
            assert inter[("p%d" % i, suff)] == base[("p%d" % i, flagbit)]

    # multiple r1/r2 pairs chained on the command line
    half = B // 2
    names = []
    for part, sl in (("x", slice(0, half)), ("y", slice(half, B))):
        with open(tmp_path / f"{part}1.fq", "wb") as f0, \
             open(tmp_path / f"{part}2.fq", "wb") as f1:
            for i in range(B)[sl]:
                f0.write(rec(b"p%d/1" % i, r0[i]))
                f1.write(rec(b"p%d/2" % i, r1[i]))
    out2 = tmp_path / "multi.sam"
    assert cli_main(["paired", str(idx_dir),
                     str(tmp_path / "x1.fq"), str(tmp_path / "x2.fq"),
                     str(tmp_path / "y1.fq"), str(tmp_path / "y2.fq"),
                     "-o", str(out2)]) == 0
    assert positions(out2) == base

    # mismatched IDs: error without -I, accepted with -I
    with open(tmp_path / "b2.fq", "wb") as f1:
        for i in range(B):
            f1.write(rec(b"q%d/2" % i, r1[i]))
    out3 = tmp_path / "bad.sam"
    with pytest.raises(ValueError, match="Unmatched read IDs"):
        cli_main(["paired", str(idx_dir), str(tmp_path / "a1.fq"),
                  str(tmp_path / "b2.fq"), "-o", str(out3)])
    assert cli_main(["paired", str(idx_dir), str(tmp_path / "a1.fq"),
                     str(tmp_path / "b2.fq"), "-I", "-o", str(out3)]) == 0

    # compatibility no-ops parse: -t 4 -b -P --hp -G 3 -a z -bs 64
    out4 = tmp_path / "compat.sam"
    assert cli_main(["paired", str(idx_dir), str(tmp_path / "a1.fq"),
                     str(tmp_path / "a2.fq"), "-o", str(out4), "-t", "4",
                     "-b", "-P", "--hp", "-G", "3", "-a", "z",
                     "-bs", "64"]) == 0
    assert positions(out4) == base


@pytest.mark.slow
def test_paired_seed_budget_counts_positions_not_directions(sim):
    """The paired aligner budgets ONE lookup per seed position
    (IntersectingPairedEndAligner.cpp:266), not per (seed, direction) like
    the single-end BaseAligner.  With num_seeds=8 the schedule reaches
    positions {0,20,40,60,80,10,30,50}; a read whose only clean 20-mer
    starts at offset 10 aligns iff all 8 positions are actually tried."""
    idx, g, *_ = sim
    codes = np.asarray(g.codes)
    pad = int(g.piece_offsets[0])
    L = 100
    s = pad + 12345
    ins = 300
    r0 = codes[s:s + L].copy()
    r1 = reverse_complement_codes(codes[s + ins - L:s + ins].copy())
    # SNPs leaving only the seed at offset 10 clean among the first 8
    # schedule positions (they break 0,20,40,60,80,30,50 and 70+)
    for p in (2, 30, 56, 60, 97):
        r0[p] = (r0[p] + 1) % 4
        r1[p] = (r1[p] + 1) % 4
    q = np.full((1, L), ord("I"), np.uint8)
    pa = PairedAligner(idx)
    out = pa.align_batch(r0[None], q, r1[None], q)
    assert bool(out["pair_found"][0])
    assert int(out["loc0"][0]) == s


@pytest.mark.slow
def test_half_useless_pair_still_aligns(tmp_path, sim):
    """A pair with one hopeless end (all Ns) is NOT skipped: the reference
    proceeds when at least one end is useful ("maybe we can align the
    other", PairedAligner.cpp:558-575) and its quality gate literally
    tests (!quality0 || !quality0) — read1's quality never matters."""
    idx, g, r0, r1, q, starts, FRAG, L = sim
    from snap_rnaseq_tpu.cli import main as cli_main

    idx_dir = tmp_path / "idx"
    idx.save(str(idx_dir))
    with open(tmp_path / "r1.fq", "wb") as f0, \
            open(tmp_path / "r2.fq", "wb") as f1:
        f0.write(b"@h0\n" + decode_bases(r0[0]) + b"\n+\n" + b"I" * L + b"\n")
        f1.write(b"@h0\n" + b"N" * L + b"\n+\n" + b"I" * L + b"\n")
        # both ends useless -> the pair IS skipped, both emitted unaligned
        f0.write(b"@h1\n" + b"N" * L + b"\n+\n" + b"I" * L + b"\n")
        f1.write(b"@h1\n" + b"N" * L + b"\n+\n" + b"I" * L + b"\n")
    assert cli_main(["paired", str(idx_dir), str(tmp_path / "r1.fq"),
                     str(tmp_path / "r2.fq"),
                     "-o", str(tmp_path / "out.sam")]) == 0
    recs = {}
    for line in open(tmp_path / "out.sam", "rb"):
        if line.startswith(b"@"):
            continue
        f = line.decode().split("\t")
        recs.setdefault(f[0], []).append(f)
    h0 = {int(f[1]) & 0x40: f for f in recs["h0"]}
    first, second = h0[0x40], h0[0]
    assert not int(first[1]) & 0x4          # alignable end aligned
    assert int(first[1]) & 0x8              # mate unmapped
    assert int(second[1]) & 0x4             # N end unaligned
    assert all(int(f[1]) & 0x4 for f in recs["h1"])
