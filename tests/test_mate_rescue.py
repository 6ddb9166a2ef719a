"""Mate-window rescue (models/paired.py _mate_rescue_end).

The reference's intersection walks COMPLETE per-seed hit lists
(IntersectingPairedEndAligner.cpp:355-512), so a flood read's true
location always reaches pairing; our static candidate budgets truncate
floods, and the rescue pass recovers in-window alignments from the mate's
best candidates.  These tests force the two interesting regimes directly:
an end with an empty candidate set, and an end whose seeds all miss.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from snap_rnaseq_tpu.index.genome import genome_from_codes
from snap_rnaseq_tpu.index.hash_index import build_index
from snap_rnaseq_tpu.models.paired import PairedAligner
from snap_rnaseq_tpu.utils.tables import reverse_complement_codes

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def sim():
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, 200_000, dtype=np.uint8)
    g = genome_from_codes(codes)
    return build_index(g, seed_len=20), g, codes


def test_rescue_recovers_seedless_mate(sim):
    """Every 20-mer of end1 carries a substitution (seeds all miss), so
    the candidate pipeline can never place it; the mate window scan must
    recover the pair at the true location with the true edit distance."""
    idx, g, codes = sim
    pad = int(g.piece_offsets[0])
    B, L, FRAG = 4, 100, 300
    rng = np.random.default_rng(3)
    starts = [10_000, 50_000, 90_000, 130_000]
    r0 = np.zeros((B, L), np.uint8)
    r1 = np.zeros((B, L), np.uint8)
    for i, s in enumerate(starts):
        r0[i] = codes[s:s + L]
        end1 = codes[s + FRAG - L:s + FRAG].copy()
        for p in (5, 22, 39, 56, 73, 90):       # kills every 20-mer
            end1[p] = (end1[p] + 1 + rng.integers(0, 3)) % 4
        r1[i] = reverse_complement_codes(end1)
    q = np.full((B, L), ord("I"), np.uint8)

    out = PairedAligner(idx).align_batch(r0, q, r1, q)
    out_off = PairedAligner(idx, mate_rescue=False).align_batch(r0, q, r1, q)
    assert not out_off["pair_found"].any()      # unreachable without rescue
    assert out["pair_found"].all()
    for i, s in enumerate(starts):
        assert int(out["loc0"][i]) == s + pad
        assert int(out["loc1"][i]) == s + FRAG - L + pad
        assert int(out["dir1"][i]) == 1
        assert int(out["score1"][i]) == 6
        assert int(out["n_rescued1"]) >= 1


def test_rescue_noop_when_candidates_cover(sim):
    """On clean pairs the rescue dedups against the budget-kept candidates
    and must not change any output."""
    idx, g, codes = sim
    B, L, FRAG = 16, 100, 300
    rng = np.random.default_rng(4)
    starts = rng.integers(0, 190_000, B)
    r0 = np.stack([codes[s:s + L] for s in starts])
    r1 = np.stack([reverse_complement_codes(codes[s + FRAG - L:s + FRAG])
                   for s in starts])
    q = np.full((B, L), ord("I"), np.uint8)
    a = PairedAligner(idx).align_batch(r0, q, r1, q)
    b = PairedAligner(idx, mate_rescue=False).align_batch(r0, q, r1, q)
    for k in ("pair_found", "loc0", "loc1", "mapq0", "mapq1", "score0",
              "score1", "result0", "result1"):
        np.testing.assert_array_equal(a[k], b[k])
