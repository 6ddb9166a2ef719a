"""Parity tests for the batched Landau-Vishkin kernel.

Covers every case from the reference's tests/LandauVishkinTest.cpp plus
randomized differential tests against the scalar oracle (itself a direct
transcription of the reference algorithm).
"""
import numpy as np
import pytest

from oracle_lv import lv_distance_oracle

import jax.numpy as jnp
from snap_rnaseq_tpu.ops.lv import lv_distance

E_MAX = 16


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def batch_lv(pairs, k, e_max=E_MAX, quality=None, cigar_order=False):
    """pairs: list of (text, pattern) ASCII strings or code lists.

    Shapes are rounded up to fixed buckets so the kernel compiles once per
    bucket (the test host may be single-core; XLA compiles are the cost)."""
    B = _round_up(len(pairs), 8)
    P = _round_up(max(len(p) for _, p in pairs) + 1, 128)
    T = _round_up(max(len(t) for t, _ in pairs) + 1, 160)
    pat = np.zeros((B, P), np.uint8)
    txt = np.zeros((B, T), np.uint8)
    plen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    qual = np.full((B, P), 126, np.uint8)
    for i, (t, p) in enumerate(pairs):
        tb = t.encode() if isinstance(t, str) else bytes(t)
        pb = p.encode() if isinstance(p, str) else bytes(p)
        txt[i, :len(tb)] = np.frombuffer(tb, np.uint8)
        pat[i, :len(pb)] = np.frombuffer(pb, np.uint8)
        plen[i], tlen[i] = len(pb), len(tb)
        if quality is not None:
            qual[i, :len(pb)] = quality[i]
    ks = np.ones(B, np.int32)
    if np.isscalar(k):
        ks[:] = k
    else:
        ks[:len(k)] = np.asarray(k, np.int32)
    res = lv_distance(jnp.asarray(pat), jnp.asarray(plen), jnp.asarray(txt),
                      jnp.asarray(tlen), jnp.asarray(ks),
                      jnp.asarray(qual) if quality is not None else None,
                      e_max=e_max, cigar_order=cigar_order)
    n = len(pairs)
    return (np.asarray(res.distance)[:n], np.asarray(res.log_prob)[:n],
            np.asarray(res.net_indel)[:n])


def test_reference_unit_cases():
    # tests/LandauVishkinTest.cpp:11-32
    cases = [
        ("abcde", "abcde", 2, 0),
        ("abcde", "abcd", 2, 0),
        ("abcde", "abc", 2, 0),
        ("abcde", "ab", 2, 0),
        ("abcde", "abcdX", 2, 1),
        ("abcde", "abde", 2, 1),
        ("abcde", "bcde", 2, 1),
        ("abcde", "abcXde", 2, 1),
        ("abcde", "abXXe", 2, 2),
        ("abcde", "abcXXde", 2, 2),
        ("abcde", "XXXXX", 2, -1),
    ]
    dist, _, _ = batch_lv([(t, p) for t, p, _, _ in cases], [k for _, _, k, _ in cases])
    want = [w for _, _, _, w in cases]
    assert dist.tolist() == want


def test_pattern_longer_than_text():
    # LandauVishkin.h:290-305 zero-edit early-out charges plen - end
    dist, _, net = batch_lv([("abc", "abcde")], 3)
    assert dist[0] == 2 and net[0] == 0
    dist, _, _ = batch_lv([("abc", "abcde")], 1)
    assert dist[0] == -1


@pytest.mark.parametrize("seed", range(4))
def test_random_differential(seed):
    rng = np.random.default_rng(seed)
    pairs = []
    ks = []
    quals = []
    for _ in range(200):
        plen = int(rng.integers(8, 120))
        p = rng.integers(0, 4, plen, dtype=np.uint8)
        # make text a mutated copy with indels to exercise all actions
        t = list(p)
        n_mut = int(rng.integers(0, 8))
        for _ in range(n_mut):
            op = rng.integers(0, 3)
            pos = int(rng.integers(0, max(1, len(t))))
            if op == 0 and t:
                t[pos] = int(rng.integers(0, 4))
            elif op == 1:
                t.insert(pos, int(rng.integers(0, 4)))
            elif op == 2 and len(t) > 4:
                del t[pos]
        t += [int(x) for x in rng.integers(0, 4, E_MAX + 4)]
        pairs.append((bytes(t), bytes(p)))
        ks.append(int(rng.integers(1, E_MAX + 1)))
        quals.append(np.asarray(33 + rng.integers(0, 42, plen), dtype=np.uint8))

    dist, logp, net = batch_lv(pairs, ks, quality=quals)
    for i, ((t, p), k) in enumerate(zip(pairs, ks)):
        d0, prob0, net0 = lv_distance_oracle(t, p, k, quality=quals[i])
        assert dist[i] == d0, (i, dist[i], d0, t, p, k)
        if d0 >= 0:
            assert net[i] == net0, (i, net[i], net0)
            assert np.isclose(logp[i], np.log(prob0), rtol=2e-4, atol=2e-4), \
                (i, logp[i], np.log(prob0))


def test_per_element_k():
    pairs = [("abcde", "abXXe"), ("abcde", "abXXe")]
    dist, _, _ = batch_lv(pairs, [1, 2])
    assert dist.tolist() == [-1, 2]


def test_net_indel_signs():
    # insertion in pattern (read) -> net +1; deletion -> net -1
    # (matches the reference code: 'I' adds, 'D' subtracts, LandauVishkin.h:411-418)
    dist, _, net = batch_lv([("abcde", "abcXde")], 3)
    assert dist[0] == 1 and net[0] == 1
    dist, _, net = batch_lv([("abcde", "abde")], 3)
    assert dist[0] == 1 and net[0] == -1
