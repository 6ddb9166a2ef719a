"""Golden-file regression: a fixed simulated dataset aligned end-to-end must
produce byte-identical SAM records across code changes.

The reference pins correctness the same way (tests/datatest.py diffs against
checked-in golden SAMs).  The golden file is regenerated intentionally with:
    python tests/test_golden.py regen
Review the diff before committing a regenerated golden.
"""
import os
import sys

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "single_100bp.sam")


def _build_dataset(tmp):
    from snap_rnaseq_tpu.index.genome import read_fasta_genome
    from snap_rnaseq_tpu.utils.tables import decode_bases, reverse_complement_codes
    rng = np.random.default_rng(20260816)
    chr1 = decode_bases(rng.integers(0, 4, 8000, dtype=np.uint8))
    chr2 = decode_bases(rng.integers(0, 4, 5000, dtype=np.uint8))
    fa = os.path.join(tmp, "ref.fa")
    with open(fa, "wb") as f:
        f.write(b">chr1\n" + chr1 + b"\n>chr2\n" + chr2 + b"\n")
    g = read_fasta_genome(fa)
    L = 100
    reads = []
    for i in range(64):
        piece = int(rng.integers(0, 2))
        plen = 8000 if piece == 0 else 5000
        start = int(g.piece_offsets[piece]) + int(rng.integers(0, plen - L))
        codes = np.asarray(g.codes[start:start + L]).copy()
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, L))
            codes[p] = (codes[p] + int(rng.integers(1, 4))) % 4
        if rng.integers(0, 2):
            codes = reverse_complement_codes(codes)
        reads.append((f"g{i}".encode(), decode_bases(codes)))
    fq = os.path.join(tmp, "reads.fq")
    with open(fq, "wb") as f:
        for rid, seq in reads:
            f.write(b"@" + rid + b"\n" + seq + b"\n+\n" + b"I" * L + b"\n")
    return fa, fq


def _align(tmp):
    from snap_rnaseq_tpu.cli import main as cli
    fa, fq = _build_dataset(tmp)
    idx = os.path.join(tmp, "idx")
    out = os.path.join(tmp, "out.sam")
    assert cli(["index", fa, idx]) == 0
    assert cli(["single", idx, fq, "-o", out]) == 0
    # strip the @PG line (carries the temp paths), like the reference's
    # datatest strips @PG before diffing
    lines = [l for l in open(out).read().splitlines()
             if not l.startswith("@PG")]
    return "\n".join(lines) + "\n"


def test_golden_single(tmp_path):
    got = _align(str(tmp_path))
    assert os.path.exists(GOLDEN), \
        "golden file missing — run: python tests/test_golden.py regen"
    want = open(GOLDEN).read()
    assert got == want


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")   # regen runs without conftest
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        import tempfile
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with tempfile.TemporaryDirectory() as tmp:
            open(GOLDEN, "w").write(_align(tmp))
        print(f"regenerated {GOLDEN}")
