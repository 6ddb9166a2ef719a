"""Bit-parallel (Myers/Hyyrö) semi-global edit distance — the candidate
pre-filter.

TPU-native replacement for the reference's early-exit economics: the CPU
BaseAligner stops scoring a candidate as soon as its running score exceeds
scoreLimit (BaseAligner.cpp:1081-1108); a lockstep batch cannot stop early,
so instead every candidate gets a whole-read distance from this kernel
(~20 vector ops per text column, 32 pattern bases per u32 word) and only
survivors (distance <= e_max) go through the full Landau-Vishkin + backtrace
kernel.  Concatenating the LV head/tail alignments of a candidate yields a
whole-read alignment, so whole_distance > e_max implies head+tail > e_max —
dropping those candidates is exactly equivalent to scoring them (they would
have been discarded by the score gate anyway).

Formulation (Hyyrö 2003 block variant):
    per text column j with character c:
        EQ = Peq[c]
        Xv = EQ | MV
        Xh = (((EQ & PV) + PV) ^ PV) | EQ
        Ph = MV | ~(Xh | PV)
        Mh = PV & Xh
        score += bit(Ph, P-1) - bit(Mh, P-1)
        Ph' = (Ph << 1) | 1 ;  Mh' = Mh << 1
        PV = Mh' | ~(Xv | Ph')
        MV = Ph' & Xv
    min over columns j <= t_len of score  == banded LV distance whenever
    that distance <= e_max (a path costing e never leaves diagonal band e).

TPU layout: candidates ride the LANE axis (C per tile), pattern words the
sublane axis — every vector op advances 2048+ candidates.  The text is
consumed column-by-column from a transposed (TXT, C) buffer, so each step
is a static row slice.  Multi-word carries/shifts propagate across the
word (sublane) axis with static slices of width W <= 16.

Outputs int32 distance (min over columns), or P when the pattern never
fits; callers compare against e_max.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BP_TILE = 1024      # candidates per grid step (lanes)


def pack_peq(pattern: jnp.ndarray, P: int) -> jnp.ndarray:
    """Peq bitmasks: (B, 4, W) uint32; bit p%32 of word p//32 set when
    pattern[b, p] == base.  Padding bases (>=4) match nothing."""
    B = pattern.shape[0]
    W = (P + 31) // 32
    p_idx = np.arange(P)
    word = p_idx // 32
    bit = (p_idx % 32).astype(np.uint32)
    weights = (np.uint32(1) << bit).astype(np.uint32)           # (P,)
    out = []
    for base in range(4):
        is_b = (pattern == base).astype(jnp.uint32) * jnp.asarray(weights)
        cols = [is_b[:, word == w].sum(axis=1, dtype=jnp.uint32)
                for w in range(W)]
        out.append(jnp.stack(cols, axis=1))                      # (B, W)
    return jnp.stack(out, axis=1)                                # (B, 4, W)


def _bitpar_kernel(peq_ref, text_ref, tlen_ref, out_ref, *,
                   P: int, W: int, TXT: int, track_pos: bool = False,
                   free_start: bool = False, packed_off: int = -1,
                   reverse: bool = False):
    """peq: (4*W, C) u32; text: (TXT, C) i32; tlen: (1, C) i32;
    out: (1, C) i32 — min distance, or with track_pos the encoded
    (score << 12 | end_column) minimum (earliest best end column).

    packed_off >= 0: text rows are 4-bit PACKED u32 words (8 codes each,
    nibble-aligned by gather_windows) and column j's code is nibble
    (packed_off + j) of the stream — extracted in-VMEM, so the operand
    is 4x narrower than the i32 code rows."""
    C = out_ref.shape[1]
    peq = peq_ref[...]
    tlen = tlen_ref[...]                   # (1, C)
    if packed_off >= 0:
        tw = text_ref[...]                 # (TW, C) u32 packed

    ones = jnp.full((W, C), 0xFFFFFFFF, jnp.uint32)
    PV = ones
    MV = jnp.zeros((W, C), jnp.uint32)
    score = jnp.full((1, C), P, jnp.int32)
    best = (score * 4096 + 4095) if track_pos else score
    hb_word = (P - 1) // 32
    hb_bit = jnp.uint32(1 << ((P - 1) % 32))

    def add_carry(a, b):
        """(a + b) with carries rippling up the word (sublane) axis; a new
        carry is generated only where adding the incoming carry wrapped."""
        s = a + b
        c = (s < a).astype(jnp.uint32)
        for _ in range(W - 1):
            cin = jnp.concatenate(
                [jnp.zeros((1, C), jnp.uint32), c[:-1]], axis=0)
            s1 = s + cin
            c = (s1 < s).astype(jnp.uint32)
            s = s1
        return s

    def shl1(x, fill_lsb):
        """(x << 1) across words; fill_lsb: (1, C) uint32 bit for word 0."""
        hi = x >> jnp.uint32(31)                                 # (W, C)
        lo_in = jnp.concatenate([fill_lsb, hi[:-1]], axis=0)
        return (x << jnp.uint32(1)) | lo_in

    zeros1 = jnp.zeros((1, C), jnp.uint32)
    ones1 = jnp.ones((1, C), jnp.uint32)

    for j in range(TXT):
        if packed_off >= 0:
            # reverse: scan the packed stream back-to-front (the mate
            # rescue's reversed free-start scan) without materializing a
            # reversed copy — the nibble index is static per column
            p = packed_off + (TXT - 1 - j if reverse else j)
            cj = ((tw[(p >> 3):(p >> 3) + 1, :]
                   >> jnp.uint32(4 * (p & 7))) & jnp.uint32(15)
                  ).astype(jnp.int32)                            # (1, C)
        else:
            cj = text_ref[j:j + 1, :]                            # (1, C) i32
        # EQ = Peq[c]: select among the 4 base rows, word-wise
        eq = jnp.zeros((W, C), jnp.uint32)
        for b in range(4):
            sel = (cj == b).astype(jnp.uint32)                   # (1, C)
            eq = eq | (peq[b * W:(b + 1) * W, :] * sel)
        Xv = eq | MV
        Xh = (add_carry(eq & PV, PV) ^ PV) | eq
        Ph = MV | ~(Xh | PV)
        Mh = PV & Xh
        ph_hi = ((Ph[hb_word:hb_word + 1, :] & hb_bit) != 0).astype(jnp.int32)
        mh_hi = ((Mh[hb_word:hb_word + 1, :] & hb_bit) != 0).astype(jnp.int32)
        score = score + ph_hi - mh_hi
        # row-0 boundary: global start charges a prefix deletion per
        # column (fill 1); free start (semi-global search, used by the
        # mate-window rescue) fills 0
        Phs = shl1(Ph, zeros1 if free_start else ones1)
        Mhs = shl1(Mh, zeros1)
        PV = Mhs | ~(Xv | Phs)
        MV = Phs & Xv
        # only columns within this candidate's text count
        valid = (j < tlen).astype(jnp.int32)
        enc = (score * 4096 + j) if track_pos else score
        cand = jnp.where(valid == 1, enc, jnp.int32(0x7FFFFFF0))
        best = jnp.minimum(best, cand)

    out_ref[...] = best


@functools.partial(jax.jit, static_argnames=("P", "interpret", "tile",
                                              "track_pos", "free_start"))
def bitpar_distance_pallas(peq, text_t, t_len, *, P: int,
                           interpret: bool = False,
                           tile: int = BP_TILE, track_pos: bool = False,
                           free_start: bool = False):
    """peq: (B, 4, W) u32; text_t: (TXT, B) int32 (column-major text codes);
    t_len: (B,) int32.  Returns int32 (B,) min semi-global distance."""
    B = peq.shape[0]
    W = peq.shape[2]
    TXT = text_t.shape[0]
    C = tile
    Bp = ((B + C - 1) // C) * C
    if Bp != B:
        pad = Bp - B
        peq = jnp.pad(peq, ((0, pad), (0, 0), (0, 0)))
        text_t = jnp.pad(text_t, ((0, 0), (0, pad)), constant_values=255)
        t_len = jnp.pad(t_len, (0, pad))
    # (B, 4, W) -> (4*W, B): word-major rows for sublane layout
    peq_rows = peq.reshape(Bp, 4 * W).T
    grid = (Bp // C,)
    kernel = functools.partial(_bitpar_kernel, P=P, W=W, TXT=TXT,
                               track_pos=track_pos, free_start=free_start)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4 * W, C), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TXT, C), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        interpret=interpret,
    )(peq_rows, text_t, t_len[None, :].astype(jnp.int32))
    return out[0, :B]


@functools.partial(jax.jit, static_argnames=("P", "interpret", "tile",
                                              "TXT", "packed_off",
                                              "track_pos", "free_start",
                                              "reverse"))
def bitpar_distance_packed(peq, words_t, t_len, *, P: int, TXT: int,
                           packed_off: int, interpret: bool = False,
                           tile: int = BP_TILE, track_pos: bool = False,
                           free_start: bool = False,
                           reverse: bool = False):
    """Packed-text variant: words_t (TW, B) u32 — 4-bit genome words,
    nibble-aligned (gather_windows return_packed); column j's code is
    nibble packed_off + j.  4x less text traffic than the i32 rows."""
    B = peq.shape[0]
    W = peq.shape[2]
    TW = words_t.shape[0]
    C = tile
    Bp = ((B + C - 1) // C) * C
    if Bp != B:
        pad = Bp - B
        peq = jnp.pad(peq, ((0, pad), (0, 0), (0, 0)))
        words_t = jnp.pad(words_t, ((0, 0), (0, pad)),
                          constant_values=0x55555555)
        t_len = jnp.pad(t_len, (0, pad))
    peq_rows = peq.reshape(Bp, 4 * W).T
    grid = (Bp // C,)
    kernel = functools.partial(_bitpar_kernel, P=P, W=W, TXT=TXT,
                               packed_off=packed_off, track_pos=track_pos,
                               free_start=free_start, reverse=reverse)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4 * W, C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TW, C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        interpret=interpret,
    )(peq_rows, words_t, t_len[None, :].astype(jnp.int32))
    return out[0, :B]


def bitpar_distance_words(pattern, words, t_len, *, P: int, TXT: int,
                          packed_off: int, track_pos: bool = False,
                          free_start: bool = False, reverse: bool = False):
    """Dispatcher for the packed-text path: pallas kernel on TPU, unpack +
    plain jax fallback elsewhere (SNAP_TPU_LV honored)."""
    from .lv import _lv_backend
    backend = _lv_backend()
    if backend == "jax":
        C = words.shape[0]
        shifts = (jnp.arange(8, dtype=jnp.uint32) * 4)
        nib = (words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(15)
        codes = nib.astype(jnp.uint8).reshape(C, -1)
        text = codes[:, packed_off:packed_off + TXT]
        if reverse:
            text = text[:, ::-1]
        return bitpar_distance_jax(
            pattern, text, t_len, P=P, track_pos=track_pos,
            free_start=free_start)
    peq = pack_peq(jnp.asarray(pattern), P)
    return bitpar_distance_packed(peq, jnp.asarray(words).T,
                                  jnp.asarray(t_len), P=P, TXT=TXT,
                                  packed_off=packed_off,
                                  interpret=(backend == "interpret"),
                                  track_pos=track_pos,
                                  free_start=free_start, reverse=reverse)


@functools.partial(jax.jit, static_argnames=("P", "track_pos",
                                              "free_start"))
def bitpar_distance_jax(pattern, text, t_len, *, P: int,
                        track_pos: bool = False, free_start: bool = False):
    """Pure-JAX reference/fallback: same algorithm, scan over columns.

    pattern: (B, P) u8 codes; text: (B, TXT) u8; t_len: (B,) int32."""
    B, TXT = text.shape[0], text.shape[1]
    W = (P + 31) // 32
    peq = pack_peq(pattern, P)                                    # (B, 4, W)
    PV = jnp.full((B, W), 0xFFFFFFFF, jnp.uint32)
    MV = jnp.zeros((B, W), jnp.uint32)
    score = jnp.full(B, P, jnp.int32)
    best = (score * 4096 + 4095) if track_pos else score
    hb_word = (P - 1) // 32
    hb_bit = jnp.uint32(1 << ((P - 1) % 32))

    def add_carry(a, b):
        s = a + b
        c = (s < a).astype(jnp.uint32)
        for _ in range(W - 1):
            cin = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.uint32), c[:, :-1]], axis=1)
            s1 = s + cin
            c = (s1 < s).astype(jnp.uint32)
            s = s1
        return s

    def shl1(x, fill):
        hi = x >> jnp.uint32(31)
        lo = jnp.concatenate([fill, hi[:, :-1]], axis=1)
        return (x << jnp.uint32(1)) | lo

    ones1 = jnp.ones((B, 1), jnp.uint32)
    zeros1 = jnp.zeros((B, 1), jnp.uint32)

    def step(carry, j):
        PV, MV, score, best = carry
        cj = text[:, j].astype(jnp.int32)                         # (B,)
        onehot = (cj[:, None] == jnp.arange(4)[None, :])          # (B, 4)
        eq = jnp.sum(peq * onehot[:, :, None].astype(jnp.uint32), axis=1)
        Xv = eq | MV
        Xh = (add_carry(eq & PV, PV) ^ PV) | eq
        Ph = MV | ~(Xh | PV)
        Mh = PV & Xh
        ph_hi = ((Ph[:, hb_word] & hb_bit) != 0).astype(jnp.int32)
        mh_hi = ((Mh[:, hb_word] & hb_bit) != 0).astype(jnp.int32)
        score = score + ph_hi - mh_hi
        Phs = shl1(Ph, zeros1 if free_start else ones1)
        Mhs = shl1(Mh, zeros1)
        PV = Mhs | ~(Xv | Phs)
        MV = Phs & Xv
        enc = (score * 4096 + j) if track_pos else score
        cand = jnp.where(j < t_len, enc, jnp.int32(0x7FFFFFF0))
        best = jnp.minimum(best, cand)
        return (PV, MV, score, best), None

    (PV, MV, score, best), _ = jax.lax.scan(
        step, (PV, MV, score, best), jnp.arange(TXT))
    return best


def bitpar_distance(pattern, text, t_len, *, P: int, track_pos: bool = False,
                    free_start: bool = False):
    """Dispatcher: pallas on TPU, jax elsewhere (SNAP_TPU_LV honored).

    track_pos: return (score << 12) | end_column encodings instead of bare
    distances — min over columns is lexicographic (score, column), i.e. the
    EARLIEST best end column (used by the paired mate-window rescue)."""
    from .lv import _lv_backend
    backend = _lv_backend()
    if backend == "jax":
        return bitpar_distance_jax(pattern, text, t_len, P=P,
                                   track_pos=track_pos,
                                   free_start=free_start)
    peq = pack_peq(jnp.asarray(pattern), P)
    text_t = jnp.asarray(text).astype(jnp.int32).T
    return bitpar_distance_pallas(peq, text_t, jnp.asarray(t_len), P=P,
                                  interpret=(backend == "interpret"),
                                  track_pos=track_pos,
                                  free_start=free_start)
