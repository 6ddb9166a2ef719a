"""Candidate-overflow behavior at repeat density.

VERDICT weak #5 regression: the static candidate budgets must not silently
drop accuracy on repeat-dense genomes (the hg19 regime; the reference's
analog capacity is the 16000-hit seed cap + 1e6-entry candidate pool,
IntersectingPairedEndAligner.h:32-33).  The engines carry an exact
cond-fallback tier (models/single.py overflow_tier) that re-expands at 4x
width whenever the narrow tier truncates; residual truncation is counted,
never silent.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from snap_rnaseq_tpu.index.genome import genome_from_codes
from snap_rnaseq_tpu.index.hash_index import build_index
from snap_rnaseq_tpu.models.paired import PairedAligner
from snap_rnaseq_tpu.models.single import SingleAligner
from snap_rnaseq_tpu.utils.synth_genome import hg_like_genome, wgsim_pairs

B = 256


@pytest.fixture(scope="module")
def dense_sim():
    codes = hg_like_genome(8_000_000, seed=5)
    idx = build_index(genome_from_codes(codes), seed_len=20)
    r0, q0, r1, q1, p0, p1 = wgsim_pairs(codes, B, 100, seed=3)
    return idx, r0, q0, r1, q1, p0


@pytest.mark.slow
def test_overflow_tier_bounds_truncation_paired(dense_sim):
    idx, r0, q0, r1, q1, p0 = dense_sim
    args = (jnp.asarray(r0), jnp.asarray(q0),
            jnp.asarray(r1), jnp.asarray(q1))
    wide = PairedAligner(idx, overflow_tier=True).align_batch(*args)
    narrow = PairedAligner(idx).align_batch(*args)

    tw = int((wide["truncated0"] > 0).sum())
    tn = int((narrow["truncated0"] > 0).sum())
    # the fixture is repeat-dense enough that the narrow tier truncates...
    assert tn > 0
    # ...and the fallback tier rescues most of it; the residual is counted
    # (never silent) and small
    assert tw < tn
    assert tw <= 0.05 * B

    def n_exact(out):
        pad = 500
        return sum(abs(int(out["loc0"][i]) - (int(p0[i]) + pad)) <= 2
                   for i in range(B))

    # accuracy with the fallback is at least the narrow tier's (+-1: the
    # wide tier removes EXPAND truncation, but the pooled downstream caps
    # — compact width, score budget, dense-join K — can bind differently
    # at the two widths on flood batches, so strict superset behavior is
    # not guaranteed by construction)
    assert n_exact(wide) >= n_exact(narrow) - 1
    assert int(wide["pair_found"].sum()) >= \
        int(narrow["pair_found"].sum()) - max(1, B // 100)


@pytest.mark.slow
def test_overflow_tier_single(dense_sim):
    idx, r0, q0, r1, q1, p0 = dense_sim
    out = SingleAligner(idx, overflow_tier=True).align_batch(
        jnp.asarray(r0), jnp.asarray(q0))
    assert int((out["truncated"] > 0).sum()) <= 0.05 * B
    assert int((out["result"] > 0).sum()) >= 0.98 * B


@pytest.mark.slow
def test_rare_seed_first_truncation_keeps_true_hit(dense_sim):
    """With the budget filled rarest-seed-first, truncating reads still keep
    the true location (supported by their informative seeds); only flood-
    seed tails drop.  Narrow default vs the exact overflow tier must agree
    on virtually every position despite heavy truncation."""
    idx, r0, q0, r1, q1, p0 = dense_sim
    args = (jnp.asarray(r0), jnp.asarray(q0))
    narrow = SingleAligner(idx).align_batch(*args)
    wide = SingleAligner(idx, overflow_tier=True).align_batch(*args)
    found = (narrow["result"] > 0) & (wide["result"] > 0)
    agree = (narrow["loc"] == wide["loc"]) & found
    assert agree.sum() >= 0.99 * found.sum()
