"""Cuckoo lookup layout parity: the loop-free (2,4)-bucketized cuckoo
lookup (ops/lookup.py lookup_seeds_cuckoo) must return bit-identical
results to the probe-chain lookup (lookup_seeds) for every seed, since it
re-hashes exactly the occupied entries of the same table
(index/hash_index.py build_cuckoo_layout)."""
import numpy as np
import jax.numpy as jnp
import pytest

from snap_rnaseq_tpu.index.genome import genome_from_codes
from snap_rnaseq_tpu.index.hash_index import (build_index,
                                              build_cuckoo_layout,
                                              cuckoo_layout_for)
from snap_rnaseq_tpu.ops import lookup as lk


@pytest.fixture(scope="module")
def repeat_genome_index():
    rng = np.random.default_rng(3)
    # repeat-dense genome: a unit repeated with mutations, so the index has
    # single hits, multi-hit overflow entries, and palindromic seeds
    unit = rng.integers(0, 4, 2000, dtype=np.uint8)
    parts = []
    for i in range(30):
        u = unit.copy()
        for _ in range(i):
            p = rng.integers(0, u.size)
            u[p] = (u[p] + 1) % 4
        parts.append(u)
    parts.append(rng.integers(0, 4, 30000, dtype=np.uint8))
    codes = np.concatenate(parts)
    return genome_from_codes(codes), build_index(
        genome_from_codes(codes), seed_len=20)


def test_cuckoo_matches_probe_lookup(repeat_genome_index):
    genome, index = repeat_genome_index
    layout = build_cuckoo_layout(index.ht_keys, index.ht_val1,
                                 index.ht_val2, index.shard_starts)
    arrs = index.device_arrays()

    rng = np.random.default_rng(11)
    B, L = 64, 100
    starts = rng.integers(0, genome.num_bases - L, B)
    reads = np.asarray(genome.codes)[starts[:, None] + np.arange(L)].copy()
    # inject mutations and Ns so invalid seeds are exercised
    for i in range(B):
        for _ in range(rng.integers(0, 4)):
            reads[i, rng.integers(0, L)] = rng.integers(0, 5)

    positions = tuple(range(0, 80, 10))
    packed = lk.pack_seeds(jnp.asarray(reads), positions, 20)
    f1, fv1, rv1 = lk.lookup_seeds(
        packed, jnp.asarray(arrs["ht_entries"]),
        jnp.asarray(arrs["shard_start"]), jnp.asarray(arrs["shard_size"]))
    f2, fv2, rv2 = lk.lookup_seeds_cuckoo(
        packed, jnp.asarray(layout["ck_buckets"]),
        jnp.asarray(layout["ck_buckets2"]),
        jnp.asarray(layout["ck_stash"]))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(fv1), np.asarray(fv2))
    np.testing.assert_array_equal(np.asarray(rv1), np.asarray(rv2))
    assert np.asarray(f1).sum() > 100  # the comparison is not vacuous


@pytest.mark.slow
def test_cuckoo_align_end_to_end_identical(repeat_genome_index, monkeypatch):
    from snap_rnaseq_tpu.models.single import SingleAligner
    genome, index = repeat_genome_index
    rng = np.random.default_rng(12)
    B, L = 32, 100
    starts = rng.integers(0, genome.num_bases - L, B)
    reads = np.asarray(genome.codes)[starts[:, None] + np.arange(L)].copy()
    quals = np.full((B, L), ord("I"), np.uint8)

    monkeypatch.setenv("SNAP_TPU_LOOKUP", "probe")
    a1 = SingleAligner(index).align_batch(reads, quals)
    monkeypatch.setenv("SNAP_TPU_LOOKUP", "cuckoo")
    a2 = SingleAligner(index).align_batch(reads, quals)
    for k in ("result", "loc", "direction", "score", "mapq"):
        np.testing.assert_array_equal(a1[k], a2[k], err_msg=k)


def test_cuckoo_stash_entries_found():
    # force a tiny, overloaded table so the stash path is exercised
    rng = np.random.default_rng(4)
    n = 400
    keys = rng.choice(2**31, n, replace=False).astype(np.uint32)
    v1 = np.arange(n, dtype=np.uint32)
    v2 = np.arange(n, dtype=np.uint32) + 1000
    shard_starts = np.array([0, n], np.int64)
    layout = build_cuckoo_layout(keys, v1, v2, shard_starts)
    # every key must be findable via the device formulation
    packed = dict(lo_f=jnp.asarray(keys)[None, :],
                  hi_f=jnp.zeros((1, n), jnp.uint32),
                  lo_r=jnp.full((1, n), 0xFFFFFFFF, jnp.uint32),
                  hi_r=jnp.full((1, n), 0xFFFFFFFF, jnp.uint32),
                  valid=jnp.ones((1, n), bool), n_hi_bits=0)
    f, fv, rv = lk.lookup_seeds_cuckoo(
        packed, jnp.asarray(layout["ck_buckets"]),
        jnp.asarray(layout["ck_buckets2"]),
        jnp.asarray(layout["ck_stash"]))
    assert np.asarray(f).all()
    np.testing.assert_array_equal(np.asarray(fv)[0], v1)
    np.testing.assert_array_equal(np.asarray(rv)[0], v2)
