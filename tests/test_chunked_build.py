"""The memory-bounded chunked index builder must be bit-identical to the
monolithic one (same hash tables, same overflow layout, same shard seams)."""
import numpy as np

from snap_rnaseq_tpu.index.genome import genome_from_codes
from snap_rnaseq_tpu.index.hash_index import build_index, build_index_chunked


def test_chunked_build_identical():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, 1_200_000, dtype=np.uint8)
    codes[100000:100200] = codes[50000:50200]   # repeats -> overflow lists
    codes[400000:400050] = codes[50000:50050]   # a 3-deep repeat
    g = genome_from_codes(codes)
    a = build_index(g, 20)
    b = build_index_chunked(g, 20, chunk=400_000)
    for name in ("ht_keys", "ht_val1", "ht_val2", "shard_starts",
                 "overflow", "shard_ovf_starts"):
        assert np.array_equal(getattr(a, name), getattr(b, name)), name

    # and the chunk size must not matter
    c = build_index_chunked(g, 20, chunk=1_000_000_000)
    assert np.array_equal(a.ht_keys, c.ht_keys)
    assert np.array_equal(a.overflow, c.overflow)
