"""Big-genome (>2^31 bases) location-space correctness.

The reference supports the full 2^32 location space
(GenomeIndex.cpp:371-375); engine locations are int32-wrapped uint32 bit
patterns, and every ORDER-sensitive site must use uint32 semantics.
These tests pin the unit pieces; tools/hg_align.py exercises the whole
sharded engine against the real 3.2 Gb index.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from snap_rnaseq_tpu.models import single as sg


def _w32(x):
    """int32-wrapped view of uint32 values (what the engine carries)."""
    return np.asarray(x, np.uint64).astype(np.uint32).view(np.int32)


def test_piece_index_of_big():
    starts_u = np.array([0, 500, 1_000_000, 2_500_000_000, 3_000_000_000],
                        np.uint64)
    locs_u = np.array([0, 499, 500, 2_499_999_999, 2_500_000_000,
                       2_999_999_999, 3_000_000_001, 4_000_000_000],
                      np.uint64)
    want = np.searchsorted(starts_u, locs_u, side="right") - 1
    got = np.asarray(sg.piece_index_of(jnp.asarray(_w32(starts_u)),
                                       jnp.asarray(_w32(locs_u)), big=True))
    assert (got == want).all(), (got, want)


def test_aggregate_rows_big_vs_oracle():
    """(dir, loc) grouping with locations straddling 2^31: weight /
    representative / first-order must match a u64 oracle."""
    rng = np.random.default_rng(3)
    R, W = 8, 64
    # locations clustered around 2^31 so wrapped order != unsigned order
    base = np.uint64(2_147_482_000)
    loc_u = (base + rng.integers(0, 4000, (R, W)).astype(np.uint64))
    dirs = rng.integers(0, 2, (R, W)).astype(np.int32)
    live = rng.random((R, W)) < 0.8
    order = rng.integers(0, 1 << 21, (R, W)).astype(np.int32)
    lp = rng.integers(0, 30, (R, W)).astype(np.int32)
    DEAD = np.uint64(0xFFFFFFF0)
    loc_u = np.where(live, loc_u, DEAD)
    c = dict(dir=jnp.asarray(dirs), loc=jnp.asarray(_w32(loc_u)),
             order=jnp.asarray(order),
             offset=jnp.asarray(rng.integers(0, 900, (R, W)).astype(np.int32)),
             round=jnp.asarray((order >> 17).astype(np.int32)),
             lp=jnp.asarray(lp), live=jnp.asarray(live))
    u2 = {k: np.asarray(v) for k, v in sg._aggregate_rows(c, big=True).items()}

    for r in range(R):
        # oracle: group by (dir, loc) over live entries, in u64 space
        groups = {}
        for w in range(W):
            if not live[r, w]:
                continue
            key = (int(dirs[r, w]), int(loc_u[r, w]))
            g = groups.setdefault(key, dict(n=0, first_order=1 << 30))
            g["first_order"] = min(g["first_order"], int(order[r, w]))
        # engine: representative rows (live) of this row
        got = {}
        for w in range(W):
            if not u2["live"][r, w]:
                continue
            key = (int(u2["dir"][r, w]),
                   int(np.uint32(np.int64(u2["loc"][r, w]))))
            assert key not in got, "duplicate representative"
            got[key] = dict(first_order=int(u2["order"][r, w]))
        assert set(got) == set(groups), (r, set(got) ^ set(groups))
        for key in groups:
            assert got[key]["first_order"] == groups[key]["first_order"]


def test_gather_windows_big_small_table():
    """big=True: wrapped (negative int32) locations read past the table
    into padding; small positive locations behave exactly as big=False."""
    from snap_rnaseq_tpu.ops.genome_gather import (gather_windows,
                                                   pack_genome_4bit)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 100_000).astype(np.uint8)
    p4 = jnp.asarray(pack_genome_4bit(codes))
    locs_small = rng.integers(0, 99_000, 64).astype(np.int64)
    got_small = np.asarray(gather_windows(
        p4, jnp.asarray(locs_small.astype(np.int32)), width=120, big=True))
    want = np.asarray(gather_windows(
        p4, jnp.asarray(locs_small.astype(np.int32)), width=120, big=False))
    assert (got_small == want).all()
    # u32 locations far past the table -> all padding (code 5)
    locs_big = np.array([3_000_000_000, 2_200_000_000, 4_294_967_000],
                        np.uint64)
    got_big = np.asarray(gather_windows(
        p4, jnp.asarray(_w32(locs_big)), width=120, big=True))
    assert (got_big == 5).all()


def _lift_index(idx, BASE):
    """Rebase every genome location in a small index by +BASE, placing
    the same sequence at an offset past 2^31 — equivalent to indexing a
    genome whose real sequence sits at BASE, without scanning 2.2e9
    padding positions.  Seed keys are position-independent; hash values
    below genome_size are locations and values at/above it are overflow
    pointers encoded as gsize + idx, so BOTH shift by exactly +BASE when
    the genome grows by BASE.  The overflow array interleaves [count,
    loc...] runs; counts stay, locations shift."""
    from snap_rnaseq_tpu.constants import (INVALID_GENOME_LOCATION,
                                           UNUSED_HASH_VALUE)
    from snap_rnaseq_tpu.index.genome import Genome
    from snap_rnaseq_tpu.index.hash_index import GenomeIndex
    g = idx.genome
    old = np.asarray(g.codes)
    codes = np.full(BASE + old.size, 5, np.uint8)
    codes[BASE:] = old
    lifted_g = Genome(codes=codes, piece_names=list(g.piece_names),
                      piece_offsets=np.asarray(g.piece_offsets) + BASE,
                      padding=g.padding)

    def shift(vals):
        v = np.asarray(vals, np.uint32).copy()
        keep = (v == np.uint32(INVALID_GENOME_LOCATION)) | \
            (v == np.uint32(UNUSED_HASH_VALUE))
        v[~keep] += np.uint32(BASE)
        return v

    ovf = np.asarray(idx.overflow, np.uint32).copy()
    pos = 0
    while pos < ovf.size:
        count = int(ovf[pos])
        ovf[pos + 1:pos + 1 + count] += np.uint32(BASE)
        pos += 1 + count
    return GenomeIndex(genome=lifted_g, seed_len=idx.seed_len,
                       ht_keys=np.asarray(idx.ht_keys),
                       ht_val1=shift(idx.ht_val1),
                       ht_val2=shift(idx.ht_val2),
                       shard_starts=np.asarray(idx.shard_starts),
                       overflow=ovf,
                       shard_ovf_starts=np.asarray(idx.shard_ovf_starts))


@pytest.mark.slow
def test_end_to_end_lifted_genome():
    """Full engine at locations past 2^31: the same sequence + index
    lifted to offset 2.2e9 must align reads to their (wrapped) lifted
    locations with results matching the small-genome run."""
    from snap_rnaseq_tpu.index.genome import genome_from_codes
    from snap_rnaseq_tpu.index.hash_index import build_index
    from snap_rnaseq_tpu.models.single import SingleAligner

    rng = np.random.default_rng(5)
    real = rng.integers(0, 4, 200_000).astype(np.uint8)
    small = build_index(genome_from_codes(real), seed_len=20)
    BASE = 2_200_000_000
    idx = _lift_index(small, BASE)

    B, L = 32, 100
    pad = int(np.asarray(small.genome.piece_offsets)[0])
    starts = rng.integers(0, real.size - L, B)
    body = np.asarray(small.genome.codes)
    reads = np.stack([body[pad + s:pad + s + L] for s in starts])
    quals = np.full((B, L), ord("I"), np.uint8)

    ref = SingleAligner(small, cand_per_read=16,
                        max_seed_slots=16).align_batch(reads, quals)
    out = SingleAligner(idx, cand_per_read=16,
                        max_seed_slots=16).align_batch(reads, quals)
    loc = np.asarray(out["loc"]).astype(np.int32).view(
        np.uint32).astype(np.int64)
    ref_loc = np.asarray(ref["loc"]).astype(np.int64)
    # identical decisions, locations shifted by exactly +BASE
    np.testing.assert_array_equal(out["result"], ref["result"])
    np.testing.assert_array_equal(out["direction"], ref["direction"])
    np.testing.assert_array_equal(out["score"], ref["score"])
    np.testing.assert_array_equal(out["mapq"], ref["mapq"])
    mapped = np.asarray(ref["result"]) != 0
    assert mapped.sum() >= B - 1
    np.testing.assert_array_equal(loc[mapped], ref_loc[mapped] + BASE)
