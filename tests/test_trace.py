"""Per-read trace tool (models/trace.py, the _DumpAlignments analog,
BaseAligner.cpp:622-631): the trace must replay the phase pipeline for one
read and agree with the production engine's verdict."""
import numpy as np
import pytest

from snap_rnaseq_tpu.index.genome import genome_from_codes
from snap_rnaseq_tpu.index.hash_index import build_index
from snap_rnaseq_tpu.models.single import SingleAligner
from snap_rnaseq_tpu.models.trace import trace_read


pytestmark = pytest.mark.slow      # several engine (re)compiles


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, 300_000, dtype=np.uint8)
    return build_index(genome_from_codes(codes), seed_len=20), codes


def test_trace_matches_engine(small_index):
    idx, codes = small_index
    aligner = SingleAligner(idx)
    pad = int(idx.genome.piece_offsets[0])
    read = codes[10_000:10_100].copy()
    read[37] = (read[37] + 1) % 4          # one substitution
    quals = np.full(100, ord("I"), np.uint8)

    text = trace_read(aligner, read, quals)
    assert "result: SingleHit" in text
    assert f"ref:{10_000 + 1}" in text     # POS is piece-relative 1-based
    assert "seeds (offset:" in text
    assert "candidates:" in text

    out = aligner.align_batch(read.reshape(1, -1), quals.reshape(1, -1))
    assert int(np.asarray(out["loc"])[0]) == pad + 10_000
    line = [l for l in text.splitlines() if l.startswith("result:")][0]
    assert f"score {int(np.asarray(out['score'])[0])}" in line
    assert f"mapq {int(np.asarray(out['mapq'])[0])}" in line


def test_trace_not_found(small_index):
    idx, _ = small_index
    aligner = SingleAligner(idx)
    rng = np.random.default_rng(3)
    read = rng.integers(0, 4, 100, dtype=np.uint8)  # random: no alignment
    text = trace_read(aligner, read, np.full(100, ord("I"), np.uint8))
    assert "result: NotFound" in text
