"""Rowwise segmented scans (ops/rowscan.py) vs a numpy oracle, plus the
aggregate_phase regression for the high-seed-group seedOffset overflow."""
import numpy as np
import jax.numpy as jnp

from snap_rnaseq_tpu.ops.rowscan import seg_broadcast, seg_first, seg_scan


def _oracle_broadcast(val, boundary, op):
    out = np.empty_like(val)
    R, W = val.shape
    for r in range(R):
        j = 0
        while j < W:
            k = j + 1
            while k < W and not boundary[r, k]:
                k += 1
            seg = val[r, j:k]
            out[r, j:k] = op.reduce(seg)
            j = k
    return out


def _random_case(rng, R=5, W=64, lo=-50, hi=50):
    val = rng.integers(lo, hi, size=(R, W)).astype(np.int32)
    boundary = rng.random((R, W)) < 0.25
    boundary[:, 0] = True
    return val, boundary


def test_seg_broadcast_matches_oracle():
    rng = np.random.default_rng(0)
    for op_j, op_np, ident in ((jnp.add, np.add, 0),
                               (jnp.minimum, np.minimum, 1 << 30),
                               (jnp.maximum, np.maximum, -(1 << 30))):
        for _ in range(3):
            val, boundary = _random_case(rng)
            got = np.asarray(seg_broadcast(jnp.asarray(val),
                                           jnp.asarray(boundary),
                                           op_j, ident))
            want = _oracle_broadcast(val, boundary, op_np)
            np.testing.assert_array_equal(got, want)


def test_seg_scan_inclusive_prefix():
    rng = np.random.default_rng(1)
    val, boundary = _random_case(rng, R=3, W=32, lo=0, hi=9)
    got = np.asarray(seg_scan(jnp.asarray(val), jnp.asarray(boundary),
                              jnp.add, 0))
    R, W = val.shape
    want = np.zeros_like(val)
    for r in range(R):
        acc = 0
        for j in range(W):
            acc = val[r, j] if boundary[r, j] else acc + val[r, j]
            want[r, j] = acc
    np.testing.assert_array_equal(got, want)


def test_seg_first_broadcasts_segment_start():
    rng = np.random.default_rng(2)
    val, boundary = _random_case(rng, R=4, W=16)
    got = np.asarray(seg_first(jnp.asarray(val), jnp.asarray(boundary)))
    R, W = val.shape
    for r in range(R):
        cur = val[r, 0]
        for j in range(W):
            if boundary[r, j]:
                cur = val[r, j]
            assert got[r, j] == cur


def test_aggregate_last_seed_offset_high_group():
    """aggregate_phase must report the seedOffset of the LAST (highest
    order) hit even when the hit's seed-group id >= 32: the old int32
    (order << 10) packing overflowed to negative there and zeroed the
    offset (reachable at the single-end default of 25 seeds)."""
    from snap_rnaseq_tpu.models import single as sg

    W = 8
    loc = np.full((1, W), sg.BIG, np.int32)
    order = np.zeros((1, W), np.int32)
    off = np.zeros((1, W), np.int32)
    rnd = np.zeros((1, W), np.int32)
    lp = np.zeros((1, W), np.int32)
    live = np.zeros((1, W), bool)
    # two hits on the same location: group 1 (seed 0) then group 40
    # (seed 20, beyond the overflow threshold); last hit's offset = 77
    for slot, (grp, within, offset) in enumerate(((1, 0, 3), (40, 0, 77))):
        loc[0, slot] = 1000
        order[0, slot] = (grp << 16) | within
        off[0, slot] = offset
        rnd[0, slot] = grp // 2
        live[0, slot] = True
    c = {k: jnp.asarray(v) for k, v in dict(
        read=np.zeros((1, W), np.int32), dir=np.zeros((1, W), np.int32),
        loc=loc, order=order, offset=off, round=rnd, lp=lp, live=live,
        truncated=np.zeros(1, np.int32)).items()}
    u = sg.aggregate_phase(c)
    rep = np.asarray(u["live"])
    assert rep.sum() == 1
    i = int(np.argmax(rep))
    assert int(np.asarray(u["off"])[i]) == 77
    assert int(np.asarray(u["round"])[i]) == 0   # first round = group 1's
    assert int(np.asarray(u["order"])[i]) == (1 << 16)
    assert int(np.asarray(u["weight"])[i]) == 2
