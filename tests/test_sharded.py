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
