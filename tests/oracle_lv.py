"""Scalar reference oracle for Landau-Vishkin, used only by tests.

A direct, slow Python transcription of the reference algorithm's *semantics*
(SNAPLib/LandauVishkin.h:211-455 for distance/probability/netIndel and
SNAPLib/LandauVishkin.cpp:253-530 for the CIGAR variant) so the batched TPU
kernels can be differential-tested against it on random inputs.
"""
from __future__ import annotations

import math

MAX_K = 31
SNP_PROB = 0.001
GAP_OPEN_PROB = 0.001
GAP_EXTEND_PROB = 0.5


def phred_to_prob(q: int) -> float:
    q = int(q)
    if 33 <= q <= 126:
        return 1.0 - (1.0 - 10.0 ** (-(q - 33) / 10.0)) * (1.0 - SNP_PROB)
    return SNP_PROB


def indel_prob(n: int) -> float:
    return GAP_OPEN_PROB * (GAP_EXTEND_PROB ** (n - 1))


def lv_distance_oracle(text, pattern, k, quality=None, cigar_order=False):
    """Returns (distance, match_probability, net_indel).

    text/pattern: sequences of ints (base codes) or a str/bytes.
    quality: ASCII quality values (ints), len == len(pattern).
    cigar_order=True uses the CIGAR variant's d visit order (0,-1,1,...).
    """
    t = [ord(c) if isinstance(c, str) else int(c) for c in text]
    p = [ord(c) if isinstance(c, str) else int(c) for c in pattern]
    plen, tlen = len(p), len(t)
    q = list(quality) if quality is not None else [126] * plen

    k = min(MAX_K - 1, k)
    L = [[-2] * (2 * MAX_K + 1) for _ in range(MAX_K + 1)]
    A = [[None] * (2 * MAX_K + 1) for _ in range(MAX_K + 1)]

    def tx(i):
        return t[i] if 0 <= i < tlen else None

    end = min(plen, tlen)
    i = 0
    while i < end and p[i] == t[i]:
        i += 1
    L[0][MAX_K] = min(i, end)
    if L[0][MAX_K] == end:
        result = plen - end if plen > end else 0
        prob = (1 - SNP_PROB) ** plen
        if result > k:
            return -1, 0.0, 0
        return result, prob, 0

    def d_seq(e):
        # LV order (LandauVishkin.h:180,311): 0, 1, -1, ..., e, -e
        # CIGAR order (LandauVishkin.cpp:313): 0, -1, 1, ..., -e, e
        seq = []
        d = 0
        while (d != -(e + 1)) if cigar_order else (d != e + 1):
            seq.append(d)
            d = (-(d + 1) if d >= 0 else -d) if cigar_order else (-d if d > 0 else -d + 1)
        return seq

    for e in range(1, k + 1):
        for d in d_seq(e):
            best = L[e - 1][MAX_K + d] + 1
            A[e][MAX_K + d] = 'X'
            left = L[e - 1][MAX_K + d - 1]
            if left > best:
                best = left
                A[e][MAX_K + d] = 'D'
            right = L[e - 1][MAX_K + d + 1] + 1
            if right > best:
                best = right
                A[e][MAX_K + d] = 'I'
            if 0 <= best < plen and tx(best + d) is not None and p[best] == t[best + d]:
                endd = min(plen, tlen - d)
                while best < endd and p[best] == (t[best + d] if best + d < tlen else None):
                    best += 1
                best = min(best, endd)
            L[e][MAX_K + d] = best
            if best == plen:
                # backtrace
                ba = [None] * (MAX_K + 1)
                bm = [0] * (MAX_K + 1)
                bd = [0] * (MAX_K + 1)
                cur_d = d
                for cur_e in range(e, 0, -1):
                    ba[cur_e] = A[cur_e][MAX_K + cur_d]
                    if ba[cur_e] == 'I':
                        bd[cur_e] = cur_d + 1
                        bm[cur_e] = L[cur_e][MAX_K + cur_d] - L[cur_e - 1][MAX_K + cur_d + 1] - 1
                    elif ba[cur_e] == 'D':
                        bd[cur_e] = cur_d - 1
                        bm[cur_e] = L[cur_e][MAX_K + cur_d] - L[cur_e - 1][MAX_K + cur_d - 1]
                    else:
                        bd[cur_e] = cur_d
                        bm[cur_e] = L[cur_e][MAX_K + cur_d] - L[cur_e - 1][MAX_K + cur_d] - 1
                    cur_d = bd[cur_e]

                prob = 1.0
                net = 0
                offset = L[0][MAX_K]
                cur_e = 1
                while cur_e <= e:
                    action = ba[cur_e]
                    count = 1
                    while cur_e + 1 <= e and bm[cur_e] == 0 and ba[cur_e + 1] == action:
                        count += 1
                        cur_e += 1
                    if action == 'I':
                        prob *= indel_prob(count)
                        offset += count
                        net += count
                    elif action == 'D':
                        prob *= indel_prob(count)
                        offset -= count
                        net -= count
                    else:
                        for _ in range(count):
                            prob *= phred_to_prob(q[min(plen - 1, max(offset, 0))])
                            offset += 1
                    offset += bm[cur_e]
                    cur_e += 1
                prob *= (1 - SNP_PROB) ** (plen - e)
                return e, prob, net
    return -1, 0.0, 0


def lv_cigar_oracle(text, pattern, k, use_m=False):
    """CIGAR variant oracle (LandauVishkin.cpp:253-530).

    Returns (distance, cigar_string) with '='/'X' style unless use_m.
    """
    t = [ord(c) if isinstance(c, str) else int(c) for c in text]
    p = [ord(c) if isinstance(c, str) else int(c) for c in pattern]
    plen, tlen = len(p), len(t)

    L = [[-2] * (2 * MAX_K + 1) for _ in range(MAX_K + 1)]
    A = [[None] * (2 * MAX_K + 1) for _ in range(MAX_K + 1)]

    out: list[tuple[int, str]] = []

    def w(count, code):
        if count > 0:
            out.append((count, code))

    def fmt():
        return "".join(f"{c}{op}" for c, op in out)

    end = min(plen, tlen)
    i = 0
    while i < end and p[i] == t[i]:
        i += 1
    L[0][MAX_K] = min(i, end)
    if L[0][MAX_K] == end:
        if use_m:
            w(plen, 'M')
        else:
            w(end, '=')
            if plen > end:
                w(plen - end, 'X')
        return 0, fmt()

    for e in range(1, k + 1):
        d = 0
        d_list = []
        while d != -(e + 1):
            d_list.append(d)
            d = -(d + 1) if d >= 0 else -d
        for d in d_list:
            best = L[e - 1][MAX_K + d] + 1
            A[e][MAX_K + d] = 'X'
            left = L[e - 1][MAX_K + d - 1]
            if left > best:
                best = left
                A[e][MAX_K + d] = 'D'
            right = L[e - 1][MAX_K + d + 1] + 1
            if right > best:
                best = right
                A[e][MAX_K + d] = 'I'
            if 0 <= best < plen and 0 <= best + d < tlen and p[best] == t[best + d]:
                endd = min(plen, tlen - d)
                while best < endd and best + d < tlen and p[best] == t[best + d]:
                    best += 1
                best = min(best, endd)
            L[e][MAX_K + d] = best
            if best == plen:
                straight = sum(1 for i in range(end) if p[i] != t[i]) + (plen - end)
                if straight == e:
                    if use_m:
                        w(plen, 'M')
                    else:
                        streak_start = 0
                        matching = p[0] == t[0]
                        for i in range(end):
                            nm = p[i] == t[i]
                            if nm != matching:
                                w(i - streak_start, '=' if matching else 'X')
                                matching = nm
                                streak_start = i
                        if plen > streak_start:
                            if not matching:
                                w(plen - streak_start, 'X')
                            else:
                                w(end - streak_start, '=')
                                if plen > end:
                                    w(plen - end, 'X')
                    return e, fmt()

                ba = [None] * (MAX_K + 1)
                bm = [0] * (MAX_K + 1)
                bd = [0] * (MAX_K + 1)
                cur_d = d
                for cur_e in range(e, 0, -1):
                    ba[cur_e] = A[cur_e][MAX_K + cur_d]
                    if ba[cur_e] == 'I':
                        bd[cur_e] = cur_d + 1
                        bm[cur_e] = L[cur_e][MAX_K + cur_d] - L[cur_e - 1][MAX_K + cur_d + 1] - 1
                    elif ba[cur_e] == 'D':
                        bd[cur_e] = cur_d - 1
                        bm[cur_e] = L[cur_e][MAX_K + cur_d] - L[cur_e - 1][MAX_K + cur_d - 1]
                    else:
                        bd[cur_e] = cur_d
                        bm[cur_e] = L[cur_e][MAX_K + cur_d] - L[cur_e - 1][MAX_K + cur_d] - 1
                    cur_d = bd[cur_e]

                acc_m = 0
                if use_m:
                    acc_m = L[0][MAX_K]
                else:
                    if L[0][MAX_K] > 0:
                        w(L[0][MAX_K], '=')
                cur_e = 1
                while cur_e <= e:
                    action = ba[cur_e]
                    count = 1
                    while cur_e + 1 <= e and bm[cur_e] == 0 and ba[cur_e + 1] == action:
                        count += 1
                        cur_e += 1
                    if use_m:
                        if action == 'X':
                            acc_m += count
                        else:
                            if acc_m:
                                w(acc_m, 'M')
                                acc_m = 0
                            w(count, action)
                    else:
                        w(count, action)
                    if bm[cur_e] > 0:
                        if use_m:
                            acc_m += bm[cur_e]
                        else:
                            w(bm[cur_e], '=')
                    cur_e += 1
                if use_m and acc_m:
                    w(acc_m, 'M')
                return e, fmt()
    return -1, "*"
