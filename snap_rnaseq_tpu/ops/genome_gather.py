"""Packed-genome window gathers.

Gathering a (candidates x window) byte matrix straight out of the flat
genome costs one scalar-gather per BASE — at 64k candidates x 147 bases
that is ~10M scattered HBM accesses and dominates the scoring phase.
Packing the genome 4 bits/base (codes 0-5 fit; N=4 / pad=5 preserved)
turns a window into ~20 u32 word gathers; the sub-word alignment is
resolved with eight static shifted slices + masked select — pure VPU work,
no second gather.

This is the TPU shape of the reference's `getSubstring` + `_mm_prefetch`
pattern (Genome.h:78-157): fetch little, stream the rest.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BASES_PER_WORD = 8   # 4 bits per base code in a uint32
ROW_WORDS = 64       # words per aligned gather row: 128 halved -> 64 cuts the window-gather overfetch ~2x (A/B ladder: 128=140.0k, 64=144.9k, 32=121.5k PE reads/s); 32 pays XLA (8,128) tile padding on the row gather
_PAD_WORD = np.uint32(0x55555555)   # eight padding nibbles (code 5)


def pack_genome_4bit(codes: np.ndarray) -> np.ndarray:
    """Host-side: uint8 base codes -> uint32 words, 8 bases each, little-
    endian by base (base i of word w = bits [4i, 4i+4)).  The word count
    is padded to a ROW_WORDS multiple with padding-code words so
    gather_windows can reshape to (rows, ROW_WORDS) for free."""
    n = codes.shape[0]
    n_words = (n + BASES_PER_WORD - 1) // BASES_PER_WORD
    n_words = -(-n_words // ROW_WORDS) * ROW_WORDS
    padded = np.full(n_words * BASES_PER_WORD, 5, np.uint8)
    padded[:n] = codes
    w = padded.reshape(n_words, BASES_PER_WORD).astype(np.uint32)
    shifts = (np.arange(BASES_PER_WORD, dtype=np.uint32) * 4)
    return (w << shifts).sum(axis=1, dtype=np.uint32)


@functools.partial(jax.jit, static_argnames=("width", "big",
                                             "return_packed"))
def gather_windows(genome_p4: jnp.ndarray, loc: jnp.ndarray, *, width: int,
                   big: bool = False, return_packed: bool = False):
    """(C,) start locations -> (C, width) uint8 base codes.

    Out-of-range reads clamp into the terminal padding words (code 5,
    matches nothing), mirroring the clipped-gather semantics of the
    unpacked path.

    big: locations are int32-WRAPPED uint32 (genomes past 2^31 bases) —
    interpret via uint32; underflowed starts (loc - k wrapping below 0)
    land past the table and read all-padding, which only affects windows
    anchored inside the leading padding (no seeds live there).

    Layout: XLA lowers an elementwise word gather at ~7 ns/WORD but a
    row gather at ~35 ns/ROW (round-4 device profile), so the window is
    fetched as K aligned ROW_WORDS-word rows per candidate and the variable
    word offset is resolved with log2(ROW_WORDS) conditional lane rolls
    — pure VPU work.  2.2x faster at the score-window shape, ~4x at the
    mate-rescue window shape.
    """
    C = loc.shape[0]
    n_words = genome_p4.shape[0]
    if big:
        loc_u = loc.astype(jnp.uint32)
        wstart = (loc_u >> 3).astype(jnp.int32)
        sub_off = (loc_u & 7).astype(jnp.int32)
    else:
        loc = jnp.maximum(loc, 0)
        wstart = (loc >> 3).astype(jnp.int32)
        sub_off = (loc & 7).astype(jnp.int32)
    n_w = (width + BASES_PER_WORD - 1) // BASES_PER_WORD + 1

    if n_words % ROW_WORDS == 0:
        rows_tbl = genome_p4.reshape(-1, ROW_WORDS)
        M = rows_tbl.shape[0]
        K = -(-n_w // ROW_WORDS) + 1
        r0 = wstart >> (ROW_WORDS.bit_length() - 1)
        ridx = jnp.clip(r0[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :],
                        0, M - 1)
        flat = rows_tbl[ridx].reshape(C, K * ROW_WORDS)       # (C, K*128) u32
        # variable word shift: 7 conditional rolls by powers of two,
        # TELESCOPING high-bit-first — after the roll for bit b the
        # residual offset is < 2^b, so only the first 2^b + n_w words can
        # ever be needed and the array is sliced down between steps.  The
        # full-width variant (7 rolls over the whole K*128 row) was ~6
        # ms/batch of pure HBM round-trips in the round-5 device profile;
        # the telescoped version moves ~8x fewer bytes for identical
        # output.
        woff = wstart & (ROW_WORDS - 1)
        for b in range(ROW_WORDS.bit_length() - 2, -1, -1):
            # entering step b the residual offset is < 2^(b+1), so only
            # the first 2^(b+1) + n_w words can be live
            keep_w = (1 << (b + 1)) + n_w
            if keep_w < flat.shape[1]:
                flat = flat[:, :keep_w]
            flat = jnp.where((woff & (1 << b) > 0)[:, None],
                             jnp.roll(flat, -(1 << b), axis=1), flat)
        words = flat[:, :n_w]
        # windows that run past the table read all-padding words, exactly
        # like the old per-word clamp into the terminal padding
        jpos = wstart[:, None] + jnp.arange(n_w, dtype=jnp.int32)[None, :]
        words = jnp.where(jpos < n_words, words, jnp.uint32(_PAD_WORD))
    else:
        # fallback for genomes packed before the ROW_WORDS padding
        widx = jnp.clip(
            wstart[:, None] + jnp.arange(n_w, dtype=jnp.int32)[None, :],
            0, n_words - 1)
        words = genome_p4[widx]                               # (C, n_w) u32

    # sub-word alignment at NIBBLE level on the packed words: three
    # telescoped conditional funnel shifts (4/2/1 bases = 16/8/4 bits,
    # carry-in from the next word).  After this, base i of the window is
    # exactly nibble i of the word stream — the u8 unpack needs no rolls,
    # and the packed rows can feed kernels directly (bitpar consumes them
    # without the 4x-wider u8->i32 text conversion).
    off = sub_off
    for b in (2, 1, 0):
        bits = jnp.uint32(4 << b)
        w_next = jnp.concatenate(
            [words[:, 1:], jnp.full_like(words[:, :1], _PAD_WORD)], axis=1)
        shifted = (words >> bits) | (w_next << (jnp.uint32(32) - bits))
        words = jnp.where((off & (1 << b) > 0)[:, None], shifted, words)

    # unpack to (C, n_w * 8) u8 codes
    shifts = (jnp.arange(BASES_PER_WORD, dtype=jnp.uint32) * 4)
    nib = (words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(15)
    codes = nib.astype(jnp.uint8).reshape(C, n_w * BASES_PER_WORD)
    if return_packed:
        return codes[:, :width], words
    return codes[:, :width]
