"""Pallas LV kernel parity vs the pure-JAX reference path.

Runs the Pallas kernel in interpreter mode (no TPU needed) on randomized
batches including indels, short texts, N bases, and k-overflow cases, and
requires bit-identical distance/e_final/d_final plus matching probabilities.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from snap_rnaseq_tpu.ops.lv import _lv_distance_jax, _lv_distance_pallas


def _random_cases(rng, B, P, e_max):
    pats = rng.integers(0, 4, (B, P), dtype=np.uint8)
    texts = np.zeros((B, P + 2 * e_max), np.uint8)
    p_len = np.zeros(B, np.int32)
    t_len = np.zeros(B, np.int32)
    for i in range(B):
        n = int(rng.integers(P // 2, P + 1))
        p_len[i] = n
        # text = pattern with random edits
        t = list(pats[i, :n])
        for _ in range(int(rng.integers(0, e_max + 2))):
            op = rng.integers(0, 3)
            pos = int(rng.integers(0, max(len(t), 1)))
            if op == 0 and t:
                t[pos] = (t[pos] + 1) % 4
            elif op == 1 and t:
                del t[pos]
            else:
                t.insert(pos, int(rng.integers(0, 4)))
        t = t[:texts.shape[1]]
        t_len[i] = len(t)
        texts[i, :len(t)] = t
    k = rng.integers(0, e_max + 1, B).astype(np.int32)
    quals = rng.integers(33, 74, (B, P)).astype(np.uint8)
    return (jnp.asarray(pats), jnp.asarray(p_len), jnp.asarray(texts),
            jnp.asarray(t_len), jnp.asarray(k), jnp.asarray(quals))


@pytest.mark.parametrize("cigar_order", [False, True])
def test_pallas_parity(cigar_order):
    rng = np.random.default_rng(7)
    e_max = 5
    args = _random_cases(rng, 24, 32, e_max)
    ref = _lv_distance_jax(*args, e_max=e_max, cigar_order=cigar_order,
                           keep_tables=True)
    got = _lv_distance_pallas(*args, e_max=e_max, cigar_order=cigar_order,
                              keep_tables=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.distance),
                                  np.asarray(ref.distance))
    np.testing.assert_array_equal(np.asarray(got.e_final),
                                  np.asarray(ref.e_final))
    np.testing.assert_array_equal(np.asarray(got.d_final),
                                  np.asarray(ref.d_final))
    np.testing.assert_array_equal(np.asarray(got.net_indel),
                                  np.asarray(ref.net_indel))
    np.testing.assert_allclose(np.asarray(got.log_prob),
                               np.asarray(ref.log_prob), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.start_run),
                                  np.asarray(ref.start_run))


def test_pallas_perfect_and_overflow():
    e_max = 4
    P = 16
    pat = np.tile(np.asarray([0, 2], np.uint8), 8)[None, :].repeat(3, 0)
    text = np.zeros((3, P + 2 * e_max), np.uint8)
    text[0, :P] = pat[0]                       # perfect
    text[1, :P] = pat[1]; text[1, 3] ^= 1      # one substitution
    text[2, :P] = 1                            # hopeless: no base ever matches
    p_len = np.full(3, P, np.int32)
    t_len = np.full(3, P, np.int32)
    k = np.asarray([2, 0, 2], np.int32)        # row1: k too small
    args = (jnp.asarray(pat), jnp.asarray(p_len), jnp.asarray(text),
            jnp.asarray(t_len), jnp.asarray(k), None)
    ref = _lv_distance_jax(*args, e_max=e_max, cigar_order=False,
                           keep_tables=False)
    got = _lv_distance_pallas(*args, e_max=e_max, cigar_order=False,
                              keep_tables=False, interpret=True)
    assert np.asarray(ref.distance).tolist() == [0, -1, -1]
    np.testing.assert_array_equal(np.asarray(got.distance),
                                  np.asarray(ref.distance))
    np.testing.assert_allclose(np.asarray(got.log_prob),
                               np.asarray(ref.log_prob), rtol=1e-5)


def test_lanes_kernel_parity():
    """Candidates-on-lanes kernel vs the jax path (hot-path contract:
    distance/e_fin/d_fin/log_prob/net_indel only)."""
    from snap_rnaseq_tpu.ops.lv_pallas import lv_distance_pallas_lanes
    import jax.numpy as _j
    rng = np.random.default_rng(21)
    e_max = 4
    B, P = 16, 32
    args = _random_cases(rng, B, P, e_max)
    ref = _lv_distance_jax(*args, e_max=e_max, keep_tables=False)
    pattern, p_len, text, t_len, k, quals = args
    textp = _j.concatenate(
        [_j.full((B, e_max), 255, _j.int32), text.astype(_j.int32),
         _j.full((B, e_max + P), 255, _j.int32)], axis=1)
    from snap_rnaseq_tpu.ops.lv import PHRED_LOG_PROB
    qlp = _j.asarray(PHRED_LOG_PROB)[quals.astype(_j.int32)]
    dist, e_fin, d_fin, logp, net = lv_distance_pallas_lanes(
        pattern, p_len, textp, t_len, _j.minimum(k, e_max), qlp,
        e_max=e_max, interpret=True)
    np.testing.assert_array_equal(np.asarray(dist), np.asarray(ref.distance))
    np.testing.assert_array_equal(np.asarray(e_fin), np.asarray(ref.e_final))
    np.testing.assert_array_equal(np.asarray(d_fin), np.asarray(ref.d_final))
    np.testing.assert_array_equal(np.asarray(net), np.asarray(ref.net_indel))
    np.testing.assert_allclose(np.asarray(logp), np.asarray(ref.log_prob),
                               rtol=1e-5, atol=1e-5)


def test_lanes_bits_vs_onehot_parity():
    """The bit-packed extension (impl="bits", default) is bit-identical to
    the original one-hot formulation, including the free-prefix path used
    by the engine's seed-split scoring."""
    from snap_rnaseq_tpu.ops.lv_pallas import lv_distance_pallas_lanes
    import jax.numpy as _j
    rng = np.random.default_rng(5)
    for e_max, P in ((3, 40), (7, 100)):
        B = 24
        TXT = 2 * e_max + P + 4
        pat = rng.integers(0, 4, (B, P)).astype(np.uint8)
        txt = np.full((B, TXT), 255, np.uint8)
        plen = np.zeros(B, np.int32)
        tl = np.zeros(B, np.int32)
        kk = np.zeros(B, np.int32)
        fr = np.zeros(B, np.int32)
        for i in range(B):
            plen[i] = rng.integers(P // 2, P + 1)
            t = pat[i, :plen[i]].copy()
            for _ in range(rng.integers(0, e_max + 2)):
                op, p = rng.integers(0, 3), rng.integers(0, len(t))
                if op == 0:
                    t[p] = (t[p] + 1) % 4
                elif op == 1:
                    t = np.delete(t, p)
                else:
                    t = np.insert(t, p, rng.integers(0, 4))
            tl[i] = len(t)
            txt[i, e_max:e_max + len(t)] = t
            kk[i] = rng.integers(1, e_max + 1)
            fr[i] = rng.integers(0, P // 3)
        qlp = np.log(np.full((B, P), 0.001, np.float32))
        args = tuple(map(_j.asarray, (pat, plen, txt, tl, kk, qlp, fr)))
        a = lv_distance_pallas_lanes(*args, e_max=e_max, interpret=True,
                                     impl="onehot")
        b = lv_distance_pallas_lanes(*args, e_max=e_max, interpret=True,
                                     impl="bits")
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
