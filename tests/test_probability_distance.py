"""ProbabilityDistance parity: the exact cases from the reference's
tests/ProbabilityDistanceTest.cpp (snp=0.1, gapOpen=0.01, gapExtend=0.2)."""
import math

import pytest

from snap_rnaseq_tpu.ops.probability_distance import ProbabilityDistance


@pytest.fixture(scope="module")
def dist():
    return ProbabilityDistance(0.1, 0.01, 0.2)


def _near(actual, expected):
    # the reference's ASSERT_NEAR is a 1% relative check (TestLib.h:136-141)
    assert 0.99 * actual <= expected <= 1.01 * actual, (actual, expected)


def compute(dist, ref, read, qual, max_start, max_total):
    # the C++ caller may index reference[-shift]; give the array headroom
    pad = max_total
    return dist.compute(b"N" * pad + ref.encode(), read.encode(),
                        qual.encode(), max_start, max_total, ref_origin=pad)


def test_basic_probabilities(dist):
    q10 = chr(43)
    _near(compute(dist, "A", "A", "I", 0, 0), 0.9)
    _near(compute(dist, "A", "C", "I", 0, 0), 0.1)
    _near(compute(dist, "A", "C", q10, 0, 0), 0.19)
    _near(compute(dist, "A", "A", "I", 1, 2), 0.9)
    _near(compute(dist, "A", "C", "I", 1, 2), 0.1)
    _near(compute(dist, "A", "C", q10, 1, 2), 0.19)
    _near(compute(dist, "AAAAA", "AAAAA", "IIIII", 1, 2), 0.9 ** 5)
    _near(compute(dist, "AAAAA", "AACAA", "IIIII", 1, 2), 0.9 ** 4 * 0.1)


def test_indels(dist):
    _near(compute(dist, "ACGTA", "ACGGTA", "IIIIII", 1, 2), 0.9 ** 5 * 0.01)
    # two substitutions beat an indel + mismatches
    _near(compute(dist, "ACGTA", "ACTA", "IIII", 1, 2), 0.9 ** 2 * 0.1 ** 2)
    _near(compute(dist, "ACGTACGT", "ACGTTACGT", "I" * 9, 1, 2),
          0.9 ** 8 * 0.01)
    _near(compute(dist, "ACGTACGT", "ACGACGT", "I" * 7, 1, 2),
          0.9 ** 7 * 0.01)
    _near(compute(dist, "ACGTACGT", "ACTACGT", "I" * 7, 0, 2),
          0.9 ** 7 * 0.01)
    # allowing a start shift makes substitutions win
    _near(compute(dist, "ACGTACGT", "ACTACGT", "I" * 7, 1, 2),
          0.9 ** 5 * 0.1 ** 2)
    _near(compute(dist, "ACGTACGT", "ACGTTTACGT", "I" * 10, 1, 2),
          0.9 ** 8 * 0.01 * 0.2)
    _near(compute(dist, "ACGTTTACGT", "ACGTACGT", "I" * 8, 1, 2),
          0.9 ** 8 * 0.01 * 0.2)
