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


@pytest.mark.slow
def test_end_to_end_lifted_genome():
    """Full engine at locations past 2^31: a mostly-pad genome whose only
    real sequence sits at offset ~2.2e9.  Reads cut from it must align to
    their true (wrapped) locations exactly as on a small genome."""
    from snap_rnaseq_tpu.index.genome import Genome
    from snap_rnaseq_tpu.index.hash_index import build_index
    from snap_rnaseq_tpu.models.single import SingleAligner

    rng = np.random.default_rng(5)
    real = rng.integers(0, 4, 200_000).astype(np.uint8)
    BASE = 2_200_000_000
    codes = np.full(BASE + real.size + 600, 5, np.uint8)
    codes[BASE:BASE + real.size] = real
    g = Genome(codes=codes, piece_names=["chrBig"],
               piece_offsets=np.array([0], np.int64), padding=500)
    idx = build_index(g, seed_len=20)

    B, L = 32, 100
    starts = rng.integers(0, real.size - L, B)
    reads = np.stack([real[s:s + L] for s in starts])
    quals = np.full((B, L), ord("I"), np.uint8)
    al = SingleAligner(idx, cand_per_read=16, max_seed_slots=16)
    out = al.align_batch(reads, quals)
    loc = np.asarray(out["loc"]).astype(np.int32).view(np.uint32)
    ok = 0
    for i in range(B):
        if out["result"][i] != 0 and \
                abs(int(loc[i]) - (BASE + int(starts[i]))) <= 2:
            ok += 1
    assert ok >= B - 1, (ok, loc[:8], BASE + starts[:8])
