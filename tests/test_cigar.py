"""CIGAR parity: every case from the reference tests/LandauVishkinTest.cpp:34-130
plus randomized differential tests against the scalar oracle."""
import numpy as np
import pytest

from oracle_lv import lv_cigar_oracle

from snap_rnaseq_tpu.ops.cigar import compute_cigars, tokens_to_string

# (text, pattern, k, expected =X-style, expected M-style)
REF_CASES = [
    ("abcde", "abcde", 2, "5=", "5M"),
    ("abcdef", "abcde", 2, "5=", "5M"),
    ("abcde", "abcdX", 2, "4=1X", "5M"),
    ("abcde", "Xbcde", 2, "1X4=", "5M"),
    ("abcde", "abde", 2, "2=1D2=", "2M1D2M"),
    ("abcde", "bcde", 2, "1D4=", "1D4M"),
    ("abcde", "abcXde", 2, "3=1I2=", "3M1I2M"),
    ("abcde", "abXXe", 2, "2=2X1=", "5M"),
    ("abcde", "abcXXde", 3, "3=2I2=", "3M2I2M"),
    ("ttttc", "tttc", 3, "3=1X", "4M"),
    ("tttcc", "ttttc", 3, "3=1X1=", "5M"),
    ("tttcc", "tttaa", 3, "3=2X", "5M"),
    ("atctcag", "acttcag", 3, "1=2X4=", "7M"),
    ("abc", "abcde", 3, "3=2X", "5M"),
    ("abc", "abXde", 3, "2=3X", "5M"),
]


def run_batch(cases, use_m):
    B = len(cases)
    P = 32
    T = 48
    pat = np.zeros((B, P), np.uint8)
    txt = np.zeros((B, T), np.uint8)
    plen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    ks = np.zeros(B, np.int32)
    for i, (t, p, k, *_rest) in enumerate(cases):
        pat[i, :len(p)] = np.frombuffer(p.encode(), np.uint8)
        txt[i, :len(t)] = np.frombuffer(t.encode(), np.uint8)
        plen[i], tlen[i], ks[i] = len(p), len(t), k
    dist, toks = compute_cigars(pat, plen, txt, tlen, use_m=use_m,
                                k=int(ks.max()), e_max=8)
    return dist, [tokens_to_string(t) if t is not None else "*" for t in toks]


def test_reference_cigar_cases_eq_x():
    _, cigars = run_batch(REF_CASES, use_m=False)
    for (t, p, k, want, _), got in zip(REF_CASES, cigars):
        assert got == want, (t, p, got, want)


def test_reference_cigar_cases_m():
    _, cigars = run_batch(REF_CASES, use_m=True)
    for (t, p, k, _, want), got in zip(REF_CASES, cigars):
        assert got == want, (t, p, got, want)


@pytest.mark.parametrize("use_m", [False, True])
def test_random_cigar_differential(use_m):
    rng = np.random.default_rng(99)
    cases = []
    for _ in range(150):
        plen = int(rng.integers(6, 28))
        p = bytes(rng.integers(65, 69, plen, dtype=np.uint8))  # ABCD alphabet
        t = bytearray(p)
        for _ in range(int(rng.integers(0, 5))):
            op = rng.integers(0, 3)
            pos = int(rng.integers(0, max(1, len(t))))
            if op == 0 and t:
                t[pos] = int(rng.integers(65, 69))
            elif op == 1:
                t.insert(pos, int(rng.integers(65, 69)))
            elif op == 2 and len(t) > 3:
                del t[pos]
        t += bytes(rng.integers(65, 69, 10, dtype=np.uint8))
        cases.append((t.decode(), p.decode(), 7))
    dist, cigars = run_batch(cases, use_m=use_m)
    for i, (t, p, k) in enumerate(cases):
        d0, c0 = lv_cigar_oracle(t, p, k, use_m=use_m)
        assert dist[i] == d0, (i, t, p, dist[i], d0)
        if d0 >= 0:
            assert cigars[i] == c0, (i, t, p, cigars[i], c0)
