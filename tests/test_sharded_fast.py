"""Fast-tier sharded-vs-single equality (VERDICT r4 #7): small enough to
run in every CI pass, with a repeat block so popular seeds produce
overflow lists whose table ranges span index-shard cuts."""
import numpy as np

import jax
from jax.sharding import Mesh

from snap_rnaseq_tpu.index.genome import genome_from_codes
from snap_rnaseq_tpu.index.hash_index import build_index
from snap_rnaseq_tpu.models.single import SingleAligner
from snap_rnaseq_tpu.parallel.sharded import ShardedSingleAligner
from snap_rnaseq_tpu.utils.tables import reverse_complement_codes


def test_sharded_fast_equality():
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, 60_000, dtype=np.uint8)
    # repeat-dense block: one 300bp unit repeated 40x -> its seeds carry
    # 40-hit overflow lists, distributed across the seed-high-bases
    # shards (the cut seam partition_index slices)
    unit = rng.integers(0, 4, 300, dtype=np.uint8)
    codes[40_000:40_000 + 40 * 300] = np.tile(unit, 40)
    g = genome_from_codes(codes)
    idx = build_index(g, seed_len=20)

    B, L = 8, 100
    reads = np.empty((B, L), np.uint8)
    starts = []
    for i in range(B):
        if i < 3:       # flood reads from inside the repeat block
            s = 40_000 + int(rng.integers(0, 40 * 300 - L))
        else:
            s = int(rng.integers(0, 39_000))
        starts.append(s)
        r = codes[s:s + L].copy()
        if i % 2:
            r = reverse_complement_codes(r)
        reads[i] = r
    quals = np.full((B, L), ord("I"), np.uint8)

    single = SingleAligner(idx, cand_per_read=16, max_seed_slots=8)
    ref = single.align_batch(reads, quals)

    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("data", "index"))
    sharded = ShardedSingleAligner(idx, mesh, cand_per_read=16,
                                   max_seed_slots=8)
    out = sharded.align_batch(reads, quals)

    for k in ("result", "loc", "direction", "score", "mapq"):
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)
    # the unique reads really found their origins
    base = 0
    for i in range(3, B):
        assert ref["result"][i] != 0
        assert abs(int(np.uint32(np.int64(ref["loc"][i])))
                   - (starts[i] + int(g.piece_offsets[0]))) <= 2
