"""Pallas TPU kernel for the batched Landau-Vishkin banded edit distance.

The pure-JAX formulation (ops/lv.py) materializes the O(B * D * P)
next-mismatch tensor plus the O(B * E * D) DP/action tables in HBM — at
production batch sizes that is hundreds of MB of traffic per LV call and
dominates the aligner's runtime.  This kernel keeps the whole working set of
a candidate tile in VMEM:

  grid = (num_tiles,) over the candidate axis (tile = LV_TILE rows)
  per tile, entirely in VMEM:
    1. shifted[d] = textp[:, d : d+P]       (D static slices — no gather)
    2. match / mm_idx (int16); suffix-min along P via log-step shift-mins
    3. the e-loop over (T, D) states; diagonal extension is a masked
       max-reduction over P (one-hot of the gather index — lane-friendly)
    4. the probability backtrace (LandauVishkin.h:356-434) fused in-kernel:
       reverse action recovery over the VMEM-resident DP levels, then the
       forward phred/indel walk against a precomputed per-base log-prob row
  outputs: distance, e_final, d_final, log_prob, net_indel — five scalars
  per candidate.  With keep_tables=True (the CIGAR path) the compact L/A
  tables are written out too for host token emission.

HBM traffic per candidate drops from ~25 KB (jax path intermediates) to
~P*5 input bytes + 20 output bytes.

Semantics are bit-identical to lv.py's _lv_distance_jax (same diagonal
priority, perfect-match early-out, k clamping, BUGBUG quality clamp);
tests/test_lv_pallas.py checks parity on random batches.

Text layout contract (same as lv.py's internal textp): e_max leading
sentinel (255) columns, the real text, and at least e_max + P trailing
sentinel columns: TXT >= 2*e_max + P.  t_len counts real text bytes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lv import _d_order, LOG_GAP_EXTEND, LOG_GAP_OPEN, LOG_ONE_MINUS_SNP

def lv_tile(e_max: int, P: int = 100, keep_tables: bool = False) -> int:
    """Candidates per grid step — bounded by the 16MB scoped VMEM.

    The rows kernel's live set is ~a dozen (T, D, P)-ish int32 temporaries
    (the nextmm scratch, rolled text planes, the suffix-min pipeline) plus,
    with keep_tables, the (T, e_max+1, D) L/A tables.  Size the tile from
    an explicit estimate with a 12MB target so wide-band CIGAR replays
    (e_max=31, long patterns) stop tripping the 16MB scoped limit the
    hard way (observed: 17.87M request at T=64, D=63, P=128)."""
    D = 2 * e_max + 1
    per_cand = 12 * D * P * 4                   # temporaries + scratch
    if keep_tables:
        per_cand += 2 * (e_max + 1) * D * 4     # L/A blocks
    budget = 12 * 1024 * 1024
    t = budget // max(per_cand, 1)
    t = int(min(128, max(8, (t // 8) * 8)))
    return t

ACT_X, ACT_D, ACT_I = 0, 1, 2
NEG_INF = -1e30


def _suffix_min(x, axis_len):
    """Suffix (reverse cumulative) min along the last axis, log-step.

    Shift via pltpu.roll + iota mask: slice-then-concat carries lane offsets
    Mosaic refuses to re-concat."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    s = 1
    while s < axis_len:
        rolled = pltpu.roll(x, axis_len - s, x.ndim - 1)
        shifted = jnp.where(lane >= axis_len - s, jnp.int32(32767), rolled)
        x = jnp.minimum(x, shifted)
        s *= 2
    return x


def _gather_d(X, idx, e_max):
    """X: (T, D); idx: (T,) diagonal index (already +e_max); one-hot gather."""
    D = X.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
    sel = iota == jnp.clip(idx, 0, D - 1)[:, None]
    return jnp.sum(jnp.where(sel, X, 0), axis=1)


def _lv_kernel(prio_ref, pattern_ref, p_len_ref, text_ref, t_len_ref, k_ref,
               qlp_ref, dist_ref, e_fin_ref, d_fin_ref, logp_ref, net_ref,
               L_out_ref, A_out_ref, nextmm_ref,
               *, e_max: int, P: int, cigar_order: bool, keep_tables: bool):
    D = 2 * e_max + 1
    Tn = pattern_ref.shape[0]

    pattern = pattern_ref[...]                        # (T, P) i32
    p_len = p_len_ref[...][:, 0]                      # (T,) i32
    t_len = t_len_ref[...][:, 0]
    k = jnp.minimum(k_ref[...][:, 0], e_max)
    textp = text_ref[...]                             # (T, TXT) i32
    qual_logp = qlp_ref[...]                          # (T, P) f32
    TXT = textp.shape[1]

    tpos = jax.lax.broadcasted_iota(jnp.int32, (Tn, TXT), 1) - e_max
    textp = jnp.where(tpos < t_len[:, None], textp, jnp.int32(255))

    # Per-diagonal next-mismatch rows, computed in 2D and written through a
    # VMEM scratch ref (Mosaic rejects stacking values whose operands carry
    # slice/roll layout offsets; ref stores re-canonicalize them).
    pos2 = jax.lax.broadcasted_iota(jnp.int32, (Tn, P), 1)
    for d in range(D):
        # left-shift by d == right-roll by TXT - d (roll wants shift >= 0)
        tslice = pltpu.roll(textp, (TXT - d) % TXT, 1)[:, :P]
        mm2 = jnp.where(tslice == pattern, jnp.int32(P), pos2)
        nextmm_ref[:, d, :] = _suffix_min(mm2, P)
    nextmm = nextmm_ref[...]                          # (T, D, P) i32

    pos_i32 = jax.lax.broadcasted_iota(jnp.int32, (Tn, D, P), 2)
    d_vals = jax.lax.broadcasted_iota(jnp.int32, (Tn, D), 1) - e_max
    end_d = jnp.minimum(p_len[:, None], t_len[:, None] - d_vals)

    def extend(best):
        gb = jnp.clip(best, 0, P - 1)
        onehot = pos_i32 == gb[:, :, None]
        ext = jnp.max(jnp.where(onehot, nextmm, -16384), axis=2)
        ext = jnp.where(best >= P, best, ext)
        ext = jnp.minimum(ext, end_d)
        return jnp.maximum(best, jnp.where(best >= 0, ext, best))

    end0 = jnp.minimum(p_len, t_len)
    first_mm = jnp.minimum(nextmm[:, e_max, 0], end0)
    L = jnp.where(d_vals == 0, first_mm[:, None], jnp.int32(-2))  # (T, D)

    perfect = first_mm >= end0
    perfect_dist = jnp.maximum(p_len - end0, 0)
    perfect_ok = perfect & (perfect_dist <= k)

    done = perfect
    dist = jnp.where(perfect_ok, perfect_dist, -1)
    e_fin = jnp.zeros((Tn,), jnp.int32)
    d_fin = jnp.zeros((Tn,), jnp.int32)

    prio = prio_ref[...]                              # (1, D)
    abs_d = jnp.abs(d_vals)

    Ls = [L]
    As = [jnp.zeros((Tn, D), jnp.int32)]
    if keep_tables:
        L_out_ref[:, 0, :] = Ls[0]
        A_out_ref[:, 0, :] = As[0]
    else:
        # dummy single-level outputs still need a defined value; level 0 of
        # L doubles as start_run for the CIGAR wrapper
        L_out_ref[:, 0, :] = Ls[0]
        A_out_ref[:, 0, :] = As[0]

    diag_iota = jax.lax.broadcasted_iota(jnp.int32, (Tn, D), 1)
    for e in range(1, e_max + 1):
        up = L + 1
        # neighbor shifts along the diagonal axis via roll + edge masks
        left = jnp.where(diag_iota == 0, jnp.int32(-2), pltpu.roll(L, 1, 1))
        right = jnp.where(diag_iota == D - 1, jnp.int32(-1),
                          pltpu.roll(L, D - 1, 1) + 1)
        best = up
        act = jnp.full((Tn, D), ACT_X, jnp.int32)
        better_l = left > best
        best = jnp.where(better_l, left, best)
        act = jnp.where(better_l, ACT_D, act)
        better_r = right > best
        best = jnp.where(better_r, right, best)
        act = jnp.where(better_r, ACT_I, act)

        in_band = abs_d <= e
        best = extend(best)
        best = jnp.where(in_band, best, -2)

        hit = in_band & (best >= p_len[:, None]) & (e <= k)[:, None]
        any_hit = hit.any(axis=1) & ~done
        rank = jnp.where(hit, prio, jnp.int32(2 * e_max + 2))
        # integer argmin via encode/min/decode (Mosaic argmin is f32-only)
        iota_d = jax.lax.broadcasted_iota(jnp.int32, (Tn, D), 1)
        win = jnp.min(rank * D + iota_d, axis=1) % D

        new_done = done | any_hit | (e >= k)
        dist = jnp.where(any_hit, e, dist)
        e_fin = jnp.where(any_hit, e, e_fin)
        d_fin = jnp.where(any_hit, win - e_max, d_fin)

        L = jnp.where(done[:, None], L, best)
        done = new_done
        Ls.append(L)
        As.append(act)
        if keep_tables:
            L_out_ref[:, e, :] = L
            A_out_ref[:, e, :] = act

    # ---- fused probability backtrace (lv.py _backtrace_prob) --------------
    # phase 1: reverse over levels, recovering action + matched-run length
    cur_d = d_fin
    acts_bt = [None] * (e_max + 1)
    matched_bt = [None] * (e_max + 1)
    for e in range(e_max, 0, -1):
        active = (e <= e_fin) & (e_fin > 0)
        act = _gather_d(As[e], cur_d + e_max, e_max)
        L_here = _gather_d(Ls[e], cur_d + e_max, e_max)
        m_I = L_here - _gather_d(Ls[e - 1], cur_d + 1 + e_max, e_max) - 1
        m_D = L_here - _gather_d(Ls[e - 1], cur_d - 1 + e_max, e_max)
        m_X = L_here - _gather_d(Ls[e - 1], cur_d + e_max, e_max) - 1
        matched = jnp.where(act == ACT_I, m_I,
                            jnp.where(act == ACT_D, m_D, m_X))
        new_d = cur_d + jnp.where(act == ACT_I, 1,
                                  jnp.where(act == ACT_D, -1, 0))
        cur_d = jnp.where(active, new_d, cur_d)
        acts_bt[e] = jnp.where(active, act, -1)
        matched_bt[e] = jnp.where(active, matched, 0)

    # phase 2: forward walk accumulating log probability + net indel
    qmax = jnp.maximum(p_len - 1, 0)
    piota = jax.lax.broadcasted_iota(jnp.int32, (Tn, P), 1)
    offset = _gather_d(Ls[0], jnp.full((Tn,), e_max, jnp.int32), e_max)
    logp = jnp.zeros((Tn,), jnp.float32)
    net = jnp.zeros((Tn,), jnp.int32)
    prev_act = jnp.full((Tn,), -1, jnp.int32)
    run_open = jnp.zeros((Tn,), jnp.int32)   # int32 0/1: Mosaic dislikes
    for e in range(1, e_max + 1):            # rank-1 bool select round-trips
        act = acts_bt[e]
        m = matched_bt[e]
        active = (e <= e_fin) & (e_fin > 0)
        cont = (run_open == 1) & (act == prev_act)
        is_indel = (act == ACT_I) | (act == ACT_D)
        indel_log = jnp.where(cont, LOG_GAP_EXTEND, LOG_GAP_OPEN)
        # arithmetic one-hot (avoids a Mosaic i1 relayout on (T, P) masks)
        diff = jnp.abs(piota - jnp.clip(offset, 0, qmax)[:, None])
        onehot_f = (1 - jnp.minimum(diff, 1)).astype(jnp.float32)
        q_at = jnp.sum(qual_logp * onehot_f, axis=1)
        add = jnp.where(is_indel, indel_log, q_at)
        logp = jnp.where(active, logp + add, logp)
        delta = jnp.where(act == ACT_I, 1, jnp.where(act == ACT_D, -1, 1))
        offset = jnp.where(active, offset + delta, offset)
        net = jnp.where(active & (act == ACT_I), net + 1,
                        jnp.where(active & (act == ACT_D), net - 1, net))
        offset = jnp.where(active, offset + m, offset)
        run_open = jnp.where(active, (m == 0).astype(jnp.int32), run_open)
        prev_act = jnp.where(active, act, prev_act)

    logp = logp + (p_len - e_fin).astype(jnp.float32) * LOG_ONE_MINUS_SNP
    # perfect rows: e_fin == 0 walks are inactive, so logp already equals
    # p_len * log(1-snp); just mask failures
    logp = jnp.where(dist >= 0, logp, NEG_INF)
    net = jnp.where(perfect, 0, net)

    dist_ref[...] = dist[:, None]
    e_fin_ref[...] = e_fin[:, None]
    d_fin_ref[...] = d_fin[:, None]
    logp_ref[...] = logp[:, None]
    net_ref[...] = net[:, None]


@functools.partial(jax.jit,
                   static_argnames=("e_max", "cigar_order", "keep_tables",
                                    "interpret"))
def lv_distance_pallas_core(pattern, p_len, textp, t_len, k, qual_logp, *,
                            e_max: int, cigar_order: bool = False,
                            keep_tables: bool = False,
                            interpret: bool = False):
    """Pallas path: returns (distance, e_final, d_final, log_prob,
    net_indel, L_all, A_all); the tables are zero-size unless keep_tables.

    pattern: (B, P) u8; textp: (B, TXT) u8 in the module-docstring layout
    (TXT >= 2*e_max + P); qual_logp: (B, P) f32 per-base log error prob.
    """
    B, P = pattern.shape
    TXT = textp.shape[1]
    assert TXT >= 2 * e_max + P, (TXT, e_max, P)
    D = 2 * e_max + 1
    T = lv_tile(e_max, P, keep_tables)
    Bp = ((B + T - 1) // T) * T
    if Bp != B:
        pad = Bp - B
        pattern = jnp.pad(pattern, ((0, pad), (0, 0)))
        textp = jnp.pad(textp, ((0, pad), (0, 0)), constant_values=255)
        p_len = jnp.pad(p_len, (0, pad))
        t_len = jnp.pad(t_len, (0, pad))
        k = jnp.pad(k, (0, pad))
        qual_logp = jnp.pad(qual_logp, ((0, pad), (0, 0)))
    grid = (Bp // T,)
    pattern = pattern.astype(jnp.int32)
    textp = textp.astype(jnp.int32)

    prio = jnp.asarray(_d_order(e_max, cigar_order))[None, :]  # (1, D)
    kernel = functools.partial(_lv_kernel, e_max=e_max, P=P,
                               cigar_order=cigar_order,
                               keep_tables=keep_tables)

    tbl_e = (e_max + 1) if keep_tables else 1
    out_shape = (
        jax.ShapeDtypeStruct((Bp, 1), jnp.int32),             # dist
        jax.ShapeDtypeStruct((Bp, 1), jnp.int32),             # e_fin
        jax.ShapeDtypeStruct((Bp, 1), jnp.int32),             # d_fin
        jax.ShapeDtypeStruct((Bp, 1), jnp.float32),           # logp
        jax.ShapeDtypeStruct((Bp, 1), jnp.int32),             # net
        jax.ShapeDtypeStruct((Bp, tbl_e, D), jnp.int32),      # L
        jax.ShapeDtypeStruct((Bp, tbl_e, D), jnp.int32),      # A
    )
    row = lambda: pl.BlockSpec((T, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    dist, e_fin, d_fin, logp, net, L_all, A_all = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            row(),
            pl.BlockSpec((T, TXT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            row(),
            row(),
            pl.BlockSpec((T, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            row(), row(), row(), row(), row(),
            pl.BlockSpec((T, tbl_e, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, tbl_e, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((T, D, P), jnp.int32)],
        out_shape=out_shape,
        interpret=interpret,
    )(prio, pattern, p_len[:, None].astype(jnp.int32),
      textp, t_len[:, None].astype(jnp.int32), k[:, None].astype(jnp.int32),
      qual_logp.astype(jnp.float32))

    return (dist[:B, 0], e_fin[:B, 0], d_fin[:B, 0], logp[:B, 0],
            net[:B, 0], L_all[:B], A_all[:B])


# ---------------------------------------------------------------------------
# candidates-on-lanes variant (the hot, no-tables path)
#
# The tile layout above keeps per-candidate state as (T, D) rows: with
# D = 2*e_max+1 diagonals only D of 128 lanes do work.  This variant
# transposes everything: diagonals ride the sublane axis, CANDIDATES ride
# the lane axis (like ops/bitpar.py), so every vector op advances a full
# lane tile.  Tables are not emitted — the CIGAR path keeps the row layout.
#
# Two implementations share the wrapper:
#   * "bits" (default): per-diagonal mismatch positions BIT-PACKED into
#     W = ceil(P/32) int32 words per (diagonal, candidate) — the reference
#     kernel's 8-bytes-per-cycle u64 XOR + ctz idea (LandauVishkin.h:
#     268-287) recast for the VPU.  Diagonal extension = masked
#     find-first-set over W words (a handful of (D, C) ops) instead of a
#     one-hot max-reduction over the (D, P, C) next-mismatch tensor; the
#     suffix-min build pass disappears entirely.  Inner-loop data shrinks
#     from (D, P, C) i32 to (D, W, C) i32 — 25x at P=100.
#   * "onehot": the original formulation, kept for A/B timing and as a
#     fallback (SNAP_TPU_LV_LANES=onehot).
# ---------------------------------------------------------------------------

def lv_lanes_tile(e_max: int) -> int:
    """Lane-tile size bounded by the (D, P, C) int32 temporaries in VMEM.

    SNAP_TPU_LV_TILE overrides for A/B tuning.  Measured on the real chip
    (tools/lv_ab.py, 2026-08-18): tile 512 makes Mosaic's compile helper
    SIGABRT on the bits kernel at D<=16, and tile 128 is FASTER than 256
    for both impls at every bench shape — so 128 everywhere."""
    import os
    env = os.environ.get("SNAP_TPU_LV_TILE")
    if env:
        return int(env)
    return 128


def _lv_kernel_lanes_bits(prio_ref, pattern_ref, p_len_ref, text_ref,
                          t_len_ref, k_ref, qlp_ref, free_ref, dist_ref,
                          e_fin_ref, d_fin_ref, logp_ref, net_ref, bits_ref,
                          *, e_max: int, P: int, cigar_order: bool):
    D = 2 * e_max + 1
    W = (P + 31) // 32
    C = dist_ref.shape[1]

    pattern = pattern_ref[...]                        # (P, C) i32
    p_len = p_len_ref[...]                            # (1, C) i32
    t_len = t_len_ref[...]
    k = jnp.minimum(k_ref[...], e_max)
    textp = text_ref[...]                             # (TXT, C) i32
    qual_logp = qlp_ref[...]                          # (P, C) f32
    free = free_ref[...]                              # (1, C) i32
    TXT = textp.shape[0]

    tpos = jax.lax.broadcasted_iota(jnp.int32, (TXT, C), 0) - e_max
    textp = jnp.where(tpos < t_len, textp, jnp.int32(255))

    # Pack each diagonal's MISMATCH indicator into W int32 words along the
    # pattern axis (distinct powers of two, so the sum is an exact OR; bit
    # 31 wraps to INT_MIN, a valid bit pattern).  Positions below the free
    # prefix match unconditionally.
    pos2 = jax.lax.broadcasted_iota(jnp.int32, (P, C), 0)
    bit_iota = jax.lax.broadcasted_iota(jnp.int32, (32, C), 0)
    bitval = jnp.left_shift(jnp.int32(1), bit_iota)   # (32, C)
    for d in range(D):
        tsl = pltpu.roll(textp, (TXT - d) % TXT, 0)[:P, :]
        mm = ((tsl != pattern) & (pos2 >= free)).astype(jnp.int32)
        for w in range(W):
            lo = w * 32
            hi = min(lo + 32, P)
            bits_ref[d, w, :] = jnp.sum(mm[lo:hi, :] * bitval[:hi - lo, :],
                                        axis=0)
    bits = bits_ref[...]                              # (D, W, C) i32

    bit3 = jax.lax.broadcasted_iota(jnp.int32, (D, 32, C), 1)

    def next_mm(best):
        """Smallest mismatch position >= clip(best, 0) per (d, cand), or P.

        Word selection is a W-step descending where-cascade (earliest
        eligible word wins); in-word find-first-set decodes ONE selected
        word per (d, cand) via a 32-wide bit expansion (arithmetic right
        shift keeps bit values for every index, and `& 1` kills the sign
        smear)."""
        gb = jnp.clip(best, 0, P - 1)
        w_idx = jnp.right_shift(gb, 5)
        r = gb & 31
        mask_ge = jnp.left_shift(jnp.int32(-1), r)    # bits >= r
        res_word = jnp.zeros((D, C), jnp.int32)
        res_j = jnp.full((D, C), W, jnp.int32)
        for j in range(W - 1, -1, -1):
            wj = bits[:, j, :]
            elig = jnp.where(w_idx == j, wj & mask_ge,
                             jnp.where(w_idx < j, wj, 0))
            nz = elig != 0
            res_word = jnp.where(nz, elig, res_word)
            res_j = jnp.where(nz, jnp.int32(j), res_j)
        bx = jnp.right_shift(res_word[:, None, :], bit3) & 1  # (D, 32, C)
        pos_in = jnp.min(jnp.where(bx != 0, bit3, jnp.int32(32)), axis=1)
        return jnp.where(res_j < W, res_j * 32 + pos_in, jnp.int32(P))

    pos_dc = jax.lax.broadcasted_iota(jnp.int32, (D, C), 0)
    d_vals = pos_dc - e_max
    end_d = jnp.minimum(jnp.broadcast_to(p_len, (D, C)), t_len - d_vals)

    def extend(best):
        ext = jnp.where(best >= P, best, next_mm(best))
        ext = jnp.minimum(ext, end_d)
        return jnp.maximum(best, jnp.where(best >= 0, ext, best))

    end0 = jnp.minimum(p_len, t_len)                  # (1, C)
    diag0 = jax.lax.broadcasted_iota(jnp.int32, (D, C), 0)
    q0 = next_mm(jnp.zeros((D, C), jnp.int32))
    first_mm = jnp.sum(jnp.where(diag0 == e_max, q0, 0), axis=0,
                       keepdims=True)
    first_mm = jnp.minimum(first_mm, end0)
    L = jnp.where(d_vals == 0, jnp.broadcast_to(first_mm, (D, C)),
                  jnp.int32(-2))

    perfect = first_mm >= end0                        # (1, C)
    perfect_dist = jnp.maximum(p_len - end0, 0)
    perfect_ok = perfect & (perfect_dist <= k)

    done = perfect
    dist = jnp.where(perfect_ok, perfect_dist, -1)
    e_fin = jnp.zeros((1, C), jnp.int32)
    d_fin = jnp.zeros((1, C), jnp.int32)

    prio = prio_ref[...]                              # (D, 1)
    abs_d = jnp.abs(d_vals)

    Ls = [L]
    As = [jnp.zeros((D, C), jnp.int32)]
    for e in range(1, e_max + 1):
        up = L + 1
        left = jnp.where(diag0 == 0, jnp.int32(-2), pltpu.roll(L, 1, 0))
        right = jnp.where(diag0 == D - 1, jnp.int32(-1),
                          pltpu.roll(L, D - 1, 0) + 1)
        best = up
        act = jnp.full((D, C), ACT_X, jnp.int32)
        better_l = left > best
        best = jnp.where(better_l, left, best)
        act = jnp.where(better_l, ACT_D, act)
        better_r = right > best
        best = jnp.where(better_r, right, best)
        act = jnp.where(better_r, ACT_I, act)

        in_band = abs_d <= e
        best = extend(best)
        best = jnp.where(in_band, best, -2)

        hit = in_band & (best >= p_len) & jnp.broadcast_to(e <= k, (D, C))
        any_hit = hit.any(axis=0, keepdims=True) & ~done
        rank = jnp.where(hit, jnp.broadcast_to(prio, (D, C)),
                         jnp.int32(2 * e_max + 2))
        win = jnp.min(rank * D + diag0, axis=0, keepdims=True) % D

        new_done = done | any_hit | (e >= k)
        dist = jnp.where(any_hit, e, dist)
        e_fin = jnp.where(any_hit, e, e_fin)
        d_fin = jnp.where(any_hit, win - e_max, d_fin)

        L = jnp.where(done, L, best)
        done = new_done
        Ls.append(L)
        As.append(act)

    # fused probability backtrace, lanes layout (identical to the onehot
    # kernel from here down)
    def gather_diag(X, idx):
        sel = diag0 == jnp.clip(idx + e_max, 0, D - 1)
        return jnp.sum(jnp.where(sel, X, 0), axis=0, keepdims=True)

    cur_d = d_fin
    acts_bt = [None] * (e_max + 1)
    matched_bt = [None] * (e_max + 1)
    for e in range(e_max, 0, -1):
        active = (e <= e_fin) & (e_fin > 0)
        act = gather_diag(As[e], cur_d)
        L_here = gather_diag(Ls[e], cur_d)
        m_I = L_here - gather_diag(Ls[e - 1], cur_d + 1) - 1
        m_D = L_here - gather_diag(Ls[e - 1], cur_d - 1)
        m_X = L_here - gather_diag(Ls[e - 1], cur_d) - 1
        matched = jnp.where(act == ACT_I, m_I,
                            jnp.where(act == ACT_D, m_D, m_X))
        new_d = cur_d + jnp.where(act == ACT_I, 1,
                                  jnp.where(act == ACT_D, -1, 0))
        cur_d = jnp.where(active, new_d, cur_d)
        acts_bt[e] = jnp.where(active, act, -1)
        matched_bt[e] = jnp.where(active, matched, 0)

    qmax = jnp.maximum(p_len - 1, 0)
    piota = jax.lax.broadcasted_iota(jnp.int32, (P, C), 0)
    offset = gather_diag(Ls[0], jnp.zeros((1, C), jnp.int32))
    logp = jnp.zeros((1, C), jnp.float32)
    net = jnp.zeros((1, C), jnp.int32)
    prev_act = jnp.full((1, C), -1, jnp.int32)
    run_open = jnp.zeros((1, C), jnp.int32)
    for e in range(1, e_max + 1):
        act = acts_bt[e]
        m = matched_bt[e]
        active = (e <= e_fin) & (e_fin > 0)
        cont = (run_open == 1) & (act == prev_act)
        is_indel = (act == ACT_I) | (act == ACT_D)
        indel_log = jnp.where(cont, LOG_GAP_EXTEND, LOG_GAP_OPEN)
        diff = jnp.abs(piota - jnp.clip(offset, 0, qmax))
        onehot_f = (1 - jnp.minimum(diff, 1)).astype(jnp.float32)
        q_at = jnp.sum(qual_logp * onehot_f, axis=0, keepdims=True)
        add = jnp.where(is_indel, indel_log, q_at)
        logp = jnp.where(active, logp + add, logp)
        delta = jnp.where(act == ACT_I, 1, jnp.where(act == ACT_D, -1, 1))
        offset = jnp.where(active, offset + delta, offset)
        net = jnp.where(active & (act == ACT_I), net + 1,
                        jnp.where(active & (act == ACT_D), net - 1, net))
        offset = jnp.where(active, offset + m, offset)
        run_open = jnp.where(active, (m == 0).astype(jnp.int32), run_open)
        prev_act = jnp.where(active, act, prev_act)

    logp = logp + (p_len - e_fin - free).astype(jnp.float32) * \
        LOG_ONE_MINUS_SNP
    logp = jnp.where(dist >= 0, logp, NEG_INF)
    net = jnp.where(perfect, 0, net)

    dist_ref[...] = dist
    e_fin_ref[...] = e_fin
    d_fin_ref[...] = d_fin
    logp_ref[...] = logp
    net_ref[...] = net


def _lv_kernel_lanes(prio_ref, pattern_ref, p_len_ref, text_ref, t_len_ref,
                     k_ref, qlp_ref, free_ref, dist_ref, e_fin_ref,
                     d_fin_ref, logp_ref, net_ref, nextmm_ref,
                     *, e_max: int, P: int, cigar_order: bool):
    D = 2 * e_max + 1
    C = dist_ref.shape[1]

    pattern = pattern_ref[...]                        # (P, C) i32
    p_len = p_len_ref[...]                            # (1, C) i32
    t_len = t_len_ref[...]
    k = jnp.minimum(k_ref[...], e_max)
    textp = text_ref[...]                             # (TXT, C) i32
    qual_logp = qlp_ref[...]                          # (P, C) f32
    free = free_ref[...]                              # (1, C) i32
    TXT = textp.shape[0]

    tpos = jax.lax.broadcasted_iota(jnp.int32, (TXT, C), 0) - e_max
    textp = jnp.where(tpos < t_len, textp, jnp.int32(255))

    # per-diagonal mismatch columns (P, C) into the scratch, then ONE
    # 3D suffix-min pass (7 rolls of the whole tensor instead of D*7 2D);
    # positions below the free prefix match unconditionally
    pos2 = jax.lax.broadcasted_iota(jnp.int32, (P, C), 0)
    for d in range(D):
        tsl = pltpu.roll(textp, (TXT - d) % TXT, 0)[:P, :]
        m = (tsl == pattern) | (pos2 < free)
        nextmm_ref[d, :, :] = jnp.where(m, jnp.int32(P), pos2)
    nextmm = nextmm_ref[...]                          # (D, P, C)
    sub1 = jax.lax.broadcasted_iota(jnp.int32, (D, P, C), 1)
    s = 1
    while s < P:
        rolled = pltpu.roll(nextmm, P - s, 1)
        nextmm = jnp.minimum(nextmm, jnp.where(sub1 >= P - s,
                                               jnp.int32(32767), rolled))
        s *= 2

    pos3 = jax.lax.broadcasted_iota(jnp.int32, (D, P, C), 1)
    d_vals = jax.lax.broadcasted_iota(jnp.int32, (D, C), 0) - e_max
    end_d = jnp.minimum(jnp.broadcast_to(p_len, (D, C)), t_len - d_vals)

    def extend(best):
        gb = jnp.clip(best, 0, P - 1)
        onehot = pos3 == gb[:, None, :]
        ext = jnp.max(jnp.where(onehot, nextmm, -16384), axis=1)
        ext = jnp.where(best >= P, best, ext)
        ext = jnp.minimum(ext, end_d)
        return jnp.maximum(best, jnp.where(best >= 0, ext, best))

    end0 = jnp.minimum(p_len, t_len)                  # (1, C)
    first_mm = jnp.minimum(nextmm[e_max, 0:1, :], end0)
    L = jnp.where(d_vals == 0, jnp.broadcast_to(first_mm, (D, C)),
                  jnp.int32(-2))

    perfect = first_mm >= end0                        # (1, C)
    perfect_dist = jnp.maximum(p_len - end0, 0)
    perfect_ok = perfect & (perfect_dist <= k)

    done = perfect
    dist = jnp.where(perfect_ok, perfect_dist, -1)
    e_fin = jnp.zeros((1, C), jnp.int32)
    d_fin = jnp.zeros((1, C), jnp.int32)

    prio = prio_ref[...]                              # (D, 1)
    abs_d = jnp.abs(d_vals)
    diag0 = jax.lax.broadcasted_iota(jnp.int32, (D, C), 0)

    Ls = [L]
    As = [jnp.zeros((D, C), jnp.int32)]
    for e in range(1, e_max + 1):
        up = L + 1
        left = jnp.where(diag0 == 0, jnp.int32(-2), pltpu.roll(L, 1, 0))
        right = jnp.where(diag0 == D - 1, jnp.int32(-1),
                          pltpu.roll(L, D - 1, 0) + 1)
        best = up
        act = jnp.full((D, C), ACT_X, jnp.int32)
        better_l = left > best
        best = jnp.where(better_l, left, best)
        act = jnp.where(better_l, ACT_D, act)
        better_r = right > best
        best = jnp.where(better_r, right, best)
        act = jnp.where(better_r, ACT_I, act)

        in_band = abs_d <= e
        best = extend(best)
        best = jnp.where(in_band, best, -2)

        hit = in_band & (best >= p_len) & jnp.broadcast_to(e <= k, (D, C))
        any_hit = hit.any(axis=0, keepdims=True) & ~done
        rank = jnp.where(hit, jnp.broadcast_to(prio, (D, C)),
                         jnp.int32(2 * e_max + 2))
        win = jnp.min(rank * D + diag0, axis=0, keepdims=True) % D

        new_done = done | any_hit | (e >= k)
        dist = jnp.where(any_hit, e, dist)
        e_fin = jnp.where(any_hit, e, e_fin)
        d_fin = jnp.where(any_hit, win - e_max, d_fin)

        L = jnp.where(done, L, best)
        done = new_done
        Ls.append(L)
        As.append(act)

    # fused probability backtrace, lanes layout
    def gather_diag(X, idx):
        sel = diag0 == jnp.clip(idx + e_max, 0, D - 1)
        return jnp.sum(jnp.where(sel, X, 0), axis=0, keepdims=True)

    cur_d = d_fin
    acts_bt = [None] * (e_max + 1)
    matched_bt = [None] * (e_max + 1)
    for e in range(e_max, 0, -1):
        active = (e <= e_fin) & (e_fin > 0)
        act = gather_diag(As[e], cur_d)
        L_here = gather_diag(Ls[e], cur_d)
        m_I = L_here - gather_diag(Ls[e - 1], cur_d + 1) - 1
        m_D = L_here - gather_diag(Ls[e - 1], cur_d - 1)
        m_X = L_here - gather_diag(Ls[e - 1], cur_d) - 1
        matched = jnp.where(act == ACT_I, m_I,
                            jnp.where(act == ACT_D, m_D, m_X))
        new_d = cur_d + jnp.where(act == ACT_I, 1,
                                  jnp.where(act == ACT_D, -1, 0))
        cur_d = jnp.where(active, new_d, cur_d)
        acts_bt[e] = jnp.where(active, act, -1)
        matched_bt[e] = jnp.where(active, matched, 0)

    qmax = jnp.maximum(p_len - 1, 0)
    piota = jax.lax.broadcasted_iota(jnp.int32, (P, C), 0)
    offset = gather_diag(Ls[0], jnp.zeros((1, C), jnp.int32))
    logp = jnp.zeros((1, C), jnp.float32)
    net = jnp.zeros((1, C), jnp.int32)
    prev_act = jnp.full((1, C), -1, jnp.int32)
    run_open = jnp.zeros((1, C), jnp.int32)
    for e in range(1, e_max + 1):
        act = acts_bt[e]
        m = matched_bt[e]
        active = (e <= e_fin) & (e_fin > 0)
        cont = (run_open == 1) & (act == prev_act)
        is_indel = (act == ACT_I) | (act == ACT_D)
        indel_log = jnp.where(cont, LOG_GAP_EXTEND, LOG_GAP_OPEN)
        diff = jnp.abs(piota - jnp.clip(offset, 0, qmax))
        onehot_f = (1 - jnp.minimum(diff, 1)).astype(jnp.float32)
        q_at = jnp.sum(qual_logp * onehot_f, axis=0, keepdims=True)
        add = jnp.where(is_indel, indel_log, q_at)
        logp = jnp.where(active, logp + add, logp)
        delta = jnp.where(act == ACT_I, 1, jnp.where(act == ACT_D, -1, 1))
        offset = jnp.where(active, offset + delta, offset)
        net = jnp.where(active & (act == ACT_I), net + 1,
                        jnp.where(active & (act == ACT_D), net - 1, net))
        offset = jnp.where(active, offset + m, offset)
        run_open = jnp.where(active, (m == 0).astype(jnp.int32), run_open)
        prev_act = jnp.where(active, act, prev_act)

    logp = logp + (p_len - e_fin - free).astype(jnp.float32) * \
        LOG_ONE_MINUS_SNP
    logp = jnp.where(dist >= 0, logp, NEG_INF)
    net = jnp.where(perfect, 0, net)

    dist_ref[...] = dist
    e_fin_ref[...] = e_fin
    d_fin_ref[...] = d_fin
    logp_ref[...] = logp
    net_ref[...] = net


@functools.partial(jax.jit,
                   static_argnames=("e_max", "cigar_order", "interpret",
                                    "impl"))
def lv_distance_pallas_lanes(pattern, p_len, textp, t_len, k, qual_logp,
                             free=None, *,
                             e_max: int, cigar_order: bool = False,
                             interpret: bool = False, impl: str = None):
    """Lanes-layout core: returns (dist, e_fin, d_fin, logp, net).

    Same contract as lv_distance_pallas_core minus the L/A tables; inputs
    are the untransposed (B, ...) arrays — transposition happens here.
    impl: "bits" (default, bit-packed mismatch masks) or "onehot" (the
    original (D, P, C) next-mismatch formulation); overridable via
    SNAP_TPU_LV_LANES.
    """
    if impl is None:
        import os
        impl = os.environ.get("SNAP_TPU_LV_LANES", "bits")
    B, P = pattern.shape
    TXT = textp.shape[1]
    D = 2 * e_max + 1
    W = (P + 31) // 32
    C = lv_lanes_tile(e_max)
    if free is None:
        free = jnp.zeros_like(p_len)
    Bp = ((B + C - 1) // C) * C
    if Bp != B:
        pad = Bp - B
        pattern = jnp.pad(pattern, ((0, pad), (0, 0)))
        textp = jnp.pad(textp, ((0, pad), (0, 0)), constant_values=255)
        p_len = jnp.pad(p_len, (0, pad))
        t_len = jnp.pad(t_len, (0, pad))
        k = jnp.pad(k, (0, pad))
        qual_logp = jnp.pad(qual_logp, ((0, pad), (0, 0)))
        free = jnp.pad(free, (0, pad))
    grid = (Bp // C,)

    prio = jnp.asarray(_d_order(e_max, cigar_order))[:, None]    # (D, 1)
    kfn = _lv_kernel_lanes_bits if impl == "bits" else _lv_kernel_lanes
    scratch = (pltpu.VMEM((D, W, C), jnp.int32) if impl == "bits"
               else pltpu.VMEM((D, P, C), jnp.int32))
    kernel = functools.partial(kfn, e_max=e_max, P=P,
                               cigar_order=cigar_order)
    row = lambda: pl.BlockSpec((1, C), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    out_shape = tuple(
        jax.ShapeDtypeStruct((1, Bp), jnp.float32 if j == 3 else jnp.int32)
        for j in range(5))
    dist, e_fin, d_fin, logp, net = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, C), lambda i: (0, i), memory_space=pltpu.VMEM),
            row(),
            pl.BlockSpec((TXT, C), lambda i: (0, i), memory_space=pltpu.VMEM),
            row(), row(),
            pl.BlockSpec((P, C), lambda i: (0, i), memory_space=pltpu.VMEM),
            row(),
        ],
        out_specs=(row(), row(), row(), row(), row()),
        scratch_shapes=[scratch],
        out_shape=out_shape,
        interpret=interpret,
    )(prio, pattern.astype(jnp.int32).T, p_len[None, :].astype(jnp.int32),
      textp.astype(jnp.int32).T, t_len[None, :].astype(jnp.int32),
      k[None, :].astype(jnp.int32), qual_logp.astype(jnp.float32).T,
      free[None, :].astype(jnp.int32))

    return (dist[0, :B], e_fin[0, :B], d_fin[0, :B], logp[0, :B], net[0, :B])
