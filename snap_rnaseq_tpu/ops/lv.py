"""Batched banded Landau-Vishkin edit distance for TPU.

TPU-native redesign of reference SNAPLib/LandauVishkin.h:159-502 (distance +
match probability) and LandauVishkin.cpp:253-530 (CIGAR variant).

Reference formulation (per string pair, sequential):
    L[e][d] = furthest pattern index reachable with e edits on diagonal d
    (text index = pattern index + d); extend along the diagonal while bytes
    match using 8-byte XOR + count-trailing-zeros; the inner d loop visits
    diagonals in the order 0,1,-1,2,-2,... (0,-1,1,... for the CIGAR variant)
    and the first diagonal to reach patternLen wins.

TPU formulation (batched, data-parallel over pairs AND diagonals):
    * the byte-at-a-time diagonal extension becomes a precomputed
      "next-mismatch" tensor: nextmm[b,d,p] = first q >= p where
      pattern[b,q] != text[b,q+d], built from one comparison tensor and a
      reversed cumulative min (associative scan) — no data-dependent loops;
    * the e loop is a lax.scan of E_MAX steps over the whole batch; each step
      updates all 2*E_MAX+1 diagonals at once on the VPU;
    * the winner diagonal is selected with the same 0,1,-1,... priority via a
      static permutation + argmax, so tie-breaks match the reference;
    * match probability is accumulated in log space (f32) by a masked
      backtrace scan (the reference's backtraceAction/Matched/D arrays,
      LandauVishkin.h:379-431), instead of double-precision products.

There is no LV result cache: the reference's two-phase cache
(LandauVishkin.h:58-143) exists to dodge CPU cache misses; at batch scale
recompute is cheaper than a gather-heavy cache.

All functions are shape-static and jit-friendly; wrappers in models/ choose
E_MAX at trace time.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GAP_EXTEND_PROB, GAP_OPEN_PROB, MAX_READ_LENGTH, SNP_PROB

NEG_INF = jnp.float32(-1e30)
LOG_GAP_OPEN = float(np.log(GAP_OPEN_PROB))
LOG_GAP_EXTEND = float(np.log(GAP_EXTEND_PROB))
LOG_ONE_MINUS_SNP = float(np.log1p(-SNP_PROB))

# Action codes (reference uses chars 'X','D','I')
ACT_X, ACT_D, ACT_I = 0, 1, 2


def phred_log_prob_table() -> np.ndarray:
    """log of lv_phredToProbability: P(error or SNP) per ASCII quality byte.

    Mirrors initializeLVProbabilitiesToPhredPlus33 (LandauVishkin.cpp:601-650):
    bytes outside [33, 126] get SNP_PROB; in-range bytes get
    1 - (1 - 10^-((q-33)/10)) * (1 - SNP_PROB).
    """
    t = np.full(256, SNP_PROB, dtype=np.float64)
    for i in range(33, 127):
        t[i] = 1.0 - (1.0 - 10.0 ** (-(i - 33) / 10.0)) * (1.0 - SNP_PROB)
    return np.log(t).astype(np.float32)


PHRED_LOG_PROB = phred_log_prob_table()

_LOG2_10_OVER_10 = float(np.log2(10.0) / 10.0)
_LOG_SNP = float(np.log(SNP_PROB))


def phred_log_prob_device(qbytes: jnp.ndarray) -> jnp.ndarray:
    """Device-side analytic phred_log_prob_table: the elementwise 256-entry
    table gather lowers to per-element dynamic slices on TPU (3.4 ms/batch
    for the one hoisted read-scale gather, round-4 xplane profile), while
    the closed form is a handful of fused VPU transcendentals.

    Cancellation-free form: 1 - (1-pe)(1-s) = pe + s*(1-pe), so f32 keeps
    ~1e-7 relative accuracy (the naive form loses 3-4 digits at high q).
    Matches phred_log_prob_table to ~1e-6 absolute — far inside the 2e-4
    parity tolerance and the integer-MAPQ rounding step."""
    q = qbytes.astype(jnp.float32) - 33.0
    pe = jnp.exp2(q * jnp.float32(-_LOG2_10_OVER_10))       # 10^(-q/10)
    v = pe + jnp.float32(SNP_PROB) * (1.0 - pe)
    in_range = (qbytes >= 33) & (qbytes <= 126)
    return jnp.where(in_range, jnp.log(v), jnp.float32(_LOG_SNP))


class LVResult(NamedTuple):
    distance: jnp.ndarray    # int32 (B,): edit distance, or -1 if > k
    log_prob: jnp.ndarray    # float32 (B,): log matchProbability (NEG_INF on failure)
    net_indel: jnp.ndarray   # int32 (B,): insertions - deletions along the alignment
    e_final: jnp.ndarray     # int32 (B,): DP level reached (== distance when > 0)
    d_final: jnp.ndarray     # int32 (B,): winning diagonal
    L: jnp.ndarray           # int32 (B, E_MAX+1, D): DP table (when keep_tables)
    A: jnp.ndarray           # int32 (B, E_MAX+1, D): action table (when keep_tables)
    acts: jnp.ndarray        # int32 (B, E_MAX): edit action at level e (when keep_tables)
    matched: jnp.ndarray     # int32 (B, E_MAX): exact-match run after level e
    start_run: jnp.ndarray   # int32 (B,): L[0][center] = leading exact-match run


def _d_order(e_max: int, cigar_order: bool) -> np.ndarray:
    """Diagonal priority: position in the reference's d visit order.

    distance kernel (LandauVishkin.h:180-182): 0, 1, -1, 2, -2, ...
    CIGAR kernel (LandauVishkin.cpp:313):      0, -1, 1, -2, 2, ...
    """
    order = [0]
    d = 0
    for _ in range(2 * e_max):
        d = (-d - 1 if d >= 0 else -d) if cigar_order else (-d if d > 0 else -d + 1)
        order.append(d)
    prio = np.empty(2 * e_max + 1, dtype=np.int32)
    for rank, dd in enumerate(order):
        prio[dd + e_max] = rank
    return prio


def _lv_backend() -> str:
    """LV DP backend: 'pallas' on TPU, 'jax' elsewhere.

    Override with SNAP_TPU_LV=pallas|jax|interpret (interpret = Pallas
    interpreter mode, for CPU parity testing)."""
    import os
    forced = os.environ.get("SNAP_TPU_LV", "").lower()
    if forced in ("pallas", "jax", "interpret"):
        return forced
    return "pallas" if jax.default_backend() == "tpu" else "jax"


def lv_distance(pattern: jnp.ndarray,
                p_len: jnp.ndarray,
                text: jnp.ndarray,
                t_len: jnp.ndarray,
                k: jnp.ndarray,
                quality: jnp.ndarray | None = None,
                free: jnp.ndarray | None = None,
                *,
                e_max: int,
                cigar_order: bool = False,
                keep_tables: bool = False) -> LVResult:
    """free: optional (B,) per-row FREE PREFIX length — pattern positions
    < free match any text byte for free (probability excluded too).  Lets
    callers run head/tail seed-split alignments on full, ungathered read
    rows (models/single.py score_phase)."""
    backend = _lv_backend()
    if backend != "jax":
        if keep_tables and free is not None:
            raise NotImplementedError("free prefix + tables: use jax path")
        return _lv_distance_pallas(pattern, p_len, text, t_len, k, quality,
                                   free,
                                   e_max=e_max, cigar_order=cigar_order,
                                   keep_tables=keep_tables,
                                   interpret=(backend == "interpret"))
    return _lv_distance_jax(pattern, p_len, text, t_len, k, quality, free,
                            e_max=e_max, cigar_order=cigar_order,
                            keep_tables=keep_tables)


@functools.partial(jax.jit, static_argnames=("e_max", "cigar_order",
                                             "keep_tables", "interpret"))
def _lv_distance_pallas(pattern, p_len, text, t_len, k, quality=None,
                        free=None, *,
                        e_max: int, cigar_order: bool, keep_tables: bool,
                        interpret: bool) -> LVResult:
    """Pallas-core LV: DP, extension AND the probability backtrace run in
    VMEM (ops/lv_pallas.py); only five scalars per candidate hit HBM."""
    from .lv_pallas import lv_distance_pallas_core
    B, P = pattern.shape
    k = jnp.minimum(k.astype(jnp.int32), e_max)
    # textp layout: e_max leading sentinels + masked text + trailing
    # sentinels so every diagonal slice is in-bounds (lv_pallas docstring).
    # int32 on purpose: Mosaic mis-lays-out u8 compares against splats.
    textp = jnp.concatenate(
        [jnp.full((B, e_max), 255, jnp.int32),
         text.astype(jnp.int32),
         jnp.full((B, e_max + P), 255, jnp.int32)], axis=1)
    if quality is None:
        qual_logp = jnp.full((B, P), PHRED_LOG_PROB[33 + 93], jnp.float32)
    elif quality.dtype == jnp.float32:
        # pre-gathered log-probs (callers hoist the 256-entry table gather
        # to read level — elementwise tiny-table gathers are slow on TPU)
        qual_logp = quality
    else:
        qual_logp = phred_log_prob_device(quality)
    if keep_tables:
        dist, e_fin, d_fin, log_prob, net_indel, L_all, A_all = \
            lv_distance_pallas_core(
                pattern.astype(jnp.int32), p_len.astype(jnp.int32), textp,
                t_len.astype(jnp.int32), k, qual_logp,
                e_max=e_max, cigar_order=cigar_order, keep_tables=True,
                interpret=interpret)
    else:
        # hot path: candidates-on-lanes layout, no tables
        from .lv_pallas import lv_distance_pallas_lanes
        free_v = jnp.zeros_like(p_len) if free is None else free
        dist, e_fin, d_fin, log_prob, net_indel = lv_distance_pallas_lanes(
            pattern, p_len.astype(jnp.int32), textp,
            t_len.astype(jnp.int32), k, qual_logp,
            free_v.astype(jnp.int32),
            e_max=e_max, cigar_order=cigar_order, interpret=interpret)
        D0 = 2 * e_max + 1
        L_all = jnp.zeros((B, 1, D0), jnp.int32)
        A_all = jnp.zeros((B, 1, D0), jnp.int32)

    start_run = L_all[:, 0, e_max]
    D = 2 * e_max + 1
    if keep_tables:
        acts_bt, matched_bt = _recover_actions(L_all, A_all, e_fin, d_fin,
                                               e_max)
    else:
        L_all = jnp.zeros((B, 0, D), jnp.int32)
        A_all = jnp.zeros((B, 0, D), jnp.int32)
        acts_bt = jnp.zeros((B, 0), jnp.int32)
        matched_bt = jnp.zeros((B, 0), jnp.int32)
    return LVResult(distance=dist, log_prob=log_prob, net_indel=net_indel,
                    e_final=e_fin, d_final=d_fin, L=L_all, A=A_all,
                    acts=acts_bt, matched=matched_bt, start_run=start_run)


def _recover_actions(L_all, A_all, e_fin, d_fin, e_max):
    """Phase-1 backtrace only (action + matched-run recovery) for the CIGAR
    path, from materialized tables."""
    B, _, D = L_all.shape
    center = e_max

    def gather_L(e_idx, d_idx):
        dd = jnp.clip(d_idx + center, 0, D - 1)
        return L_all[jnp.arange(B), e_idx, dd]

    def rev_step(carry, e):
        cur_d = carry
        active = (e <= e_fin) & (e >= 1)
        dd = jnp.clip(cur_d + center, 0, D - 1)
        act = A_all[jnp.arange(B), e, dd]
        L_here = gather_L(e, cur_d)
        m_I = L_here - gather_L(e - 1, cur_d + 1) - 1
        m_D = L_here - gather_L(e - 1, cur_d - 1)
        m_X = L_here - gather_L(e - 1, cur_d) - 1
        matched = jnp.where(act == ACT_I, m_I, jnp.where(act == ACT_D, m_D, m_X))
        new_d = cur_d + jnp.where(act == ACT_I, 1, jnp.where(act == ACT_D, -1, 0))
        cur_d = jnp.where(active, new_d, cur_d)
        return cur_d, (jnp.where(active, act, -1), jnp.where(active, matched, 0))

    es = jnp.arange(e_max, 0, -1, dtype=jnp.int32)
    _, (acts_rev, matched_rev) = jax.lax.scan(rev_step, d_fin, es)
    return jnp.flip(acts_rev, axis=0).T, jnp.flip(matched_rev, axis=0).T


@functools.partial(jax.jit, static_argnames=("e_max", "cigar_order", "keep_tables"))
def _lv_distance_jax(pattern: jnp.ndarray,
                     p_len: jnp.ndarray,
                     text: jnp.ndarray,
                     t_len: jnp.ndarray,
                     k: jnp.ndarray,
                     quality: jnp.ndarray | None = None,
                     free: jnp.ndarray | None = None,
                     *,
                     e_max: int,
                     cigar_order: bool = False,
                     keep_tables: bool = False) -> LVResult:
    """Batched banded edit distance.

    pattern: (B, P) uint8 codes; p_len: (B,) int32 actual lengths
    text:    (B, T) uint8 codes; t_len: (B,) int32; needs T >= P (+ slack)
    k:       (B,) int32 per-element limit (clamped to e_max)
    quality: (B, P) uint8 ASCII quality bytes (None -> all probabilities use
             max quality; distance/netIndel are unaffected)

    Follows the reference contract: returns distance in [0, k], or -1; the
    zero-edit early-out charges (p_len - end) when the text is shorter than
    the pattern without netIndel bookkeeping (LandauVishkin.h:290-305).
    """
    B, P = pattern.shape
    T = text.shape[1]
    D = 2 * e_max + 1
    k = jnp.minimum(k.astype(jnp.int32), e_max)

    pos = jnp.arange(P, dtype=jnp.int32)

    # ---- next-mismatch tensor --------------------------------------------
    # textp padded with a sentinel that never equals any base code
    pad = jnp.full((B, e_max + P), 255, dtype=pattern.dtype)
    textp = jnp.concatenate([jnp.full((B, e_max), 255, dtype=pattern.dtype),
                             text, pad], axis=1)
    # mask text beyond t_len with sentinel
    tpos = jnp.arange(textp.shape[1], dtype=jnp.int32) - e_max
    textp = jnp.where(tpos[None, :] < t_len[:, None], textp, 255)

    # shifted[b, d, p] = text[b, p + (d - e_max)] via one gather
    gidx = (jnp.arange(D, dtype=jnp.int32)[:, None]
            + jnp.arange(P, dtype=jnp.int32)[None, :])          # (D, P)
    shifted = textp[:, gidx]                                     # (B, D, P)
    match = shifted == pattern[:, None, :]
    if free is not None:
        # free-prefix positions match regardless of text
        match = match | (pos[None, None, :] < free[:, None, None])
    # int16 halves the footprint of the biggest tensor in the kernel
    # (P is always < 2^15; MAX_READ_LENGTH is 512)
    mm_idx = jnp.where(match, jnp.int16(P), pos.astype(jnp.int16)[None, None, :])
    # nextmm[b,d,p] = min_{q>=p} mm_idx[b,d,q]  (reversed cumulative min)
    nextmm = jnp.flip(jax.lax.cummin(jnp.flip(mm_idx, axis=2), axis=2), axis=2)
    # appending sentinel column P so gathers at p == P return P
    nextmm = jnp.concatenate([nextmm, jnp.full((B, D, 1), P, dtype=jnp.int16)],
                             axis=2)

    d_vals = jnp.arange(-e_max, e_max + 1, dtype=jnp.int32)      # (D,)
    end_d = jnp.minimum(p_len[:, None], t_len[:, None] - d_vals[None, :])  # (B, D)

    def extend(best, b_idx=None):
        """best -> min(nextmm[., d, best], end_d) when pattern[best]==text[best+d]."""
        gb = jnp.clip(best, 0, P)
        ext = jnp.take_along_axis(nextmm, gb[:, :, None], axis=2)[:, :, 0]
        ext = jnp.minimum(ext.astype(jnp.int32), end_d)
        # only extend when the very next byte matches (i.e. nextmm > best);
        # when it doesn't, nextmm == best so min() keeps best: the formula
        # already reproduces the reference's `if (*p == *t)` gate.
        return jnp.maximum(best, jnp.where(best >= 0, ext, best))

    # ---- level 0 ----------------------------------------------------------
    center = e_max
    end0 = jnp.minimum(p_len, t_len)
    first_mm = jnp.minimum(nextmm[:, center, 0].astype(jnp.int32), end0)
    L0 = jnp.full((B, D), -2, dtype=jnp.int32).at[:, center].set(first_mm)

    perfect = first_mm >= end0
    perfect_dist = jnp.maximum(p_len - end0, 0)
    perfect_ok = perfect & (perfect_dist <= k)

    # ---- DP over e --------------------------------------------------------
    prio = jnp.asarray(_d_order(e_max, cigar_order))             # (D,)

    done0 = perfect
    dist0 = jnp.where(perfect_ok, perfect_dist, -1)
    e_fin0 = jnp.zeros(B, jnp.int32)
    d_fin0 = jnp.zeros(B, jnp.int32)

    def step(carry, e):
        L_prev, done, dist, e_fin, d_fin = carry
        up = L_prev + 1
        left = jnp.pad(L_prev[:, :-1], ((0, 0), (1, 0)), constant_values=-2)
        right = jnp.pad(L_prev[:, 1:] + 1, ((0, 0), (0, 1)), constant_values=-1)
        best = up
        act = jnp.full_like(L_prev, ACT_X)
        better_l = left > best
        best = jnp.where(better_l, left, best)
        act = jnp.where(better_l, ACT_D, act)
        better_r = right > best
        best = jnp.where(better_r, right, best)
        act = jnp.where(better_r, ACT_I, act)

        in_band = jnp.abs(d_vals)[None, :] <= e
        best = extend(best)
        best = jnp.where(in_band, best, -2)

        hit = in_band & (best >= p_len[:, None]) & (e <= k)[:, None]
        any_hit = hit.any(axis=1) & ~done
        # winner = lowest reference-order rank among hits
        rank = jnp.where(hit, prio[None, :], jnp.int32(2 * e_max + 2))
        win = jnp.argmin(rank, axis=1).astype(jnp.int32)

        new_done = done | any_hit | (e >= k)
        dist = jnp.where(any_hit, e, dist)
        e_fin = jnp.where(any_hit, e, e_fin)
        d_fin = jnp.where(any_hit, win - e_max, d_fin)

        L_new = jnp.where(done[:, None], L_prev, best)
        return (L_new, new_done, dist, e_fin, d_fin), (L_new, act)

    carry0 = (L0, done0, dist0, e_fin0, d_fin0)
    (L_last, done, dist, e_fin, d_fin), (Ls, As) = jax.lax.scan(
        step, carry0, jnp.arange(1, e_max + 1, dtype=jnp.int32))

    # L tables indexed [b, e, d]; level 0 prepended
    L_all = jnp.concatenate([L0[:, None, :], jnp.moveaxis(Ls, 0, 1)], axis=1)
    A_all = jnp.concatenate([jnp.zeros((B, 1, D), jnp.int32),
                             jnp.moveaxis(As, 0, 1)], axis=1)

    # ---- backtrace: match probability + net indel -------------------------
    log_prob, net_indel, acts_bt, matched_bt = _backtrace_prob(
        pattern, p_len, quality, L_all, A_all, e_fin, d_fin, e_max)

    eff_len = p_len if free is None else p_len - free
    log_perfect = eff_len.astype(jnp.float32) * LOG_ONE_MINUS_SNP
    if free is not None:
        log_prob = log_prob - free.astype(jnp.float32) * LOG_ONE_MINUS_SNP
    log_prob = jnp.where(perfect, jnp.where(perfect_ok, log_perfect, NEG_INF), log_prob)
    net_indel = jnp.where(perfect, 0, net_indel)
    log_prob = jnp.where(dist >= 0, log_prob, NEG_INF)

    start_run = L0[:, center]
    if not keep_tables:
        L_all = jnp.zeros((B, 0, D), jnp.int32)
        A_all = jnp.zeros((B, 0, D), jnp.int32)
        acts_bt = jnp.zeros((B, 0), jnp.int32)
        matched_bt = jnp.zeros((B, 0), jnp.int32)
    return LVResult(distance=dist, log_prob=log_prob, net_indel=net_indel,
                    e_final=e_fin, d_final=d_fin, L=L_all, A=A_all,
                    acts=acts_bt, matched=matched_bt, start_run=start_run)


def _backtrace_prob(pattern, p_len, quality, L_all, A_all, e_fin, d_fin, e_max):
    """Vectorized analog of the reference's backtrace probability accounting
    (LandauVishkin.h:379-431).

    Phase 1 (reverse scan over e): recover per-level action, matched-run
    length and diagonal. Phase 2 (forward scan): walk the edit script,
    multiplying phred probabilities at substitution offsets and indel
    open/extend probabilities per run, tracking the net indel; finally add
    perfectMatchProbability[p_len - e].
    """
    B, _, D = L_all.shape
    center = e_max

    if quality is None:
        qual_logp = jnp.full(pattern.shape, PHRED_LOG_PROB[33 + 93], jnp.float32)
    elif quality.dtype == jnp.float32:
        qual_logp = quality       # pre-gathered log-probs (see pallas path)
    else:
        qual_logp = phred_log_prob_device(quality)
    # qual index clamped to [0, p_len-1] like the reference's BUGBUG clamp
    # (LandauVishkin.h:422)
    qmax = jnp.maximum(p_len - 1, 0)

    def gather_L(e_idx, d_idx):
        dd = jnp.clip(d_idx + center, 0, D - 1)
        return L_all[jnp.arange(B), e_idx, dd]

    # phase 1: reverse over levels
    def rev_step(carry, e):
        cur_d = carry
        active = (e <= e_fin) & (e >= 1)
        dd = jnp.clip(cur_d + center, 0, D - 1)
        act = A_all[jnp.arange(B), e, dd]
        L_here = gather_L(e, cur_d)
        m_I = L_here - gather_L(e - 1, cur_d + 1) - 1
        m_D = L_here - gather_L(e - 1, cur_d - 1)
        m_X = L_here - gather_L(e - 1, cur_d) - 1
        matched = jnp.where(act == ACT_I, m_I, jnp.where(act == ACT_D, m_D, m_X))
        new_d = cur_d + jnp.where(act == ACT_I, 1, jnp.where(act == ACT_D, -1, 0))
        cur_d = jnp.where(active, new_d, cur_d)
        return cur_d, (jnp.where(active, act, -1), jnp.where(active, matched, 0))

    es = jnp.arange(e_max, 0, -1, dtype=jnp.int32)
    _, (acts_rev, matched_rev) = jax.lax.scan(rev_step, d_fin, es)
    # acts[e] for e = 1..e_max
    acts = jnp.flip(acts_rev, axis=0)        # (e_max, B)
    matched = jnp.flip(matched_rev, axis=0)  # (e_max, B)

    # phase 2: forward walk
    L0c = L_all[:, 0, center]

    def fwd_step(carry, inp):
        offset, logp, net, prev_act, prev_run_open = carry
        act, m, e = inp
        active = (e <= e_fin) & (e_fin > 0)
        # run continuation: previous slot had matched == 0 and same action
        cont = prev_run_open & (act == prev_act)
        is_indel = (act == ACT_I) | (act == ACT_D)
        indel_log = jnp.where(cont, LOG_GAP_EXTEND, LOG_GAP_OPEN)
        q_at = jnp.take_along_axis(
            qual_logp, jnp.clip(offset, 0, qmax)[:, None], axis=1)[:, 0]
        add = jnp.where(is_indel, indel_log, q_at)
        logp = jnp.where(active, logp + add, logp)
        delta = jnp.where(act == ACT_I, 1, jnp.where(act == ACT_D, -1, 1))
        offset = jnp.where(active, offset + delta, offset)
        net = jnp.where(active & (act == ACT_I), net + 1,
                        jnp.where(active & (act == ACT_D), net - 1, net))
        offset = jnp.where(active, offset + m, offset)
        run_open = jnp.where(active, m == 0, prev_run_open)
        prev_act = jnp.where(active, act, prev_act)
        return (offset, logp, net, prev_act, run_open), None

    carry0 = (L0c, jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.int32),
              jnp.full(B, -1, jnp.int32), jnp.zeros(B, bool))
    es_f = jnp.arange(1, e_max + 1, dtype=jnp.int32)
    (offset, logp, net, _, _), _ = jax.lax.scan(
        fwd_step, carry0, (acts, matched, es_f))

    logp = logp + (p_len - e_fin).astype(jnp.float32) * LOG_ONE_MINUS_SNP
    return logp, net, acts.T, matched.T
