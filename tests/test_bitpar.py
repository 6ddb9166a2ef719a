"""Bit-parallel distance parity: Myers/Hyyrö kernel vs a scalar DP oracle
(anchored-start, free-end semi-global edit distance), and vs the LV kernel's
contract (equal whenever the distance is within the band)."""
import numpy as np
import pytest
import jax.numpy as jnp

from snap_rnaseq_tpu.ops.bitpar import bitpar_distance_jax, pack_peq


def oracle(pattern, text):
    """min over j of D(pattern, text[:j]) — anchored at text start."""
    m, n = len(pattern), len(text)
    prev = np.arange(m + 1)
    best = prev[m]
    for j in range(1, n + 1):
        cur = np.empty(m + 1, np.int64)
        cur[0] = j
        for i in range(1, m + 1):
            cost = 0 if pattern[i - 1] == text[j - 1] else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
        prev = cur
        best = min(best, prev[m])
    return int(best)


@pytest.mark.parametrize("P", [24, 32, 33, 100])
def test_bitpar_vs_oracle(P):
    rng = np.random.default_rng(11)
    B = 40
    TXT = P + 31
    pats = rng.integers(0, 4, (B, P), dtype=np.uint8)
    texts = np.zeros((B, TXT), np.uint8)
    t_len = np.zeros(B, np.int32)
    for i in range(B):
        t = list(pats[i])
        for _ in range(int(rng.integers(0, 8))):
            op = rng.integers(0, 3)
            pos = int(rng.integers(0, max(len(t), 1)))
            if op == 0 and t:
                t[pos] = (t[pos] + 1) % 4
            elif op == 1 and t:
                del t[pos]
            else:
                t.insert(pos, int(rng.integers(0, 4)))
        t = t[:TXT]
        t_len[i] = len(t)
        texts[i, :len(t)] = t
    got = np.asarray(bitpar_distance_jax(
        jnp.asarray(pats), jnp.asarray(texts), jnp.asarray(t_len), P=P))
    want = np.asarray([oracle(pats[i], texts[i, :t_len[i]]) for i in range(B)])
    np.testing.assert_array_equal(got, want)


def test_bitpar_empty_text_and_padding():
    P = 50
    pats = np.zeros((2, P), np.uint8)
    texts = np.full((2, P + 10), 255, np.uint8)   # sentinel text
    texts[1, :P] = 0
    t_len = np.asarray([0, P], np.int32)
    got = np.asarray(bitpar_distance_jax(
        jnp.asarray(pats), jnp.asarray(texts), jnp.asarray(t_len), P=P))
    assert got[0] == P          # empty text: all-deletion alignment
    assert got[1] == 0          # exact match


def test_pack_peq():
    pat = np.asarray([[0, 1, 2, 3] * 10], np.uint8)   # P=40, W=2
    peq = np.asarray(pack_peq(jnp.asarray(pat), 40))
    assert peq.shape == (1, 4, 2)
    for b in range(4):
        bits = np.zeros(64, bool)
        bits[:40] = pat[0] == b
        want0 = sum(1 << i for i in range(32) if bits[i])
        want1 = sum(1 << (i - 32) for i in range(32, 64) if bits[i])
        assert peq[0, b, 0] == want0 and peq[0, b, 1] == want1


@pytest.mark.slow
def test_bitpar_pallas_interpret_parity():
    # tiny shapes: interpreter mode executes the column loop serially
    from snap_rnaseq_tpu.ops.bitpar import bitpar_distance_pallas
    rng = np.random.default_rng(3)
    P, B = 40, 16
    TXT = P + 8
    pats = rng.integers(0, 4, (B, P), dtype=np.uint8)
    texts = rng.integers(0, 4, (B, TXT), dtype=np.uint8)
    texts[:B // 2, :P] = pats[:B // 2]      # half exact matches
    t_len = np.full(B, TXT, np.int32)
    ref = np.asarray(bitpar_distance_jax(
        jnp.asarray(pats), jnp.asarray(texts), jnp.asarray(t_len), P=P))
    peq = pack_peq(jnp.asarray(pats), P)
    got = np.asarray(bitpar_distance_pallas(
        peq, jnp.asarray(texts.T.astype(np.int32)), jnp.asarray(t_len),
        P=P, interpret=True, tile=128))
    np.testing.assert_array_equal(got, ref)
