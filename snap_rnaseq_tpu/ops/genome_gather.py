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


def pack_genome_4bit(codes: np.ndarray) -> np.ndarray:
    """Host-side: uint8 base codes -> uint32 words, 8 bases each, little-
    endian by base (base i of word w = bits [4i, 4i+4))."""
    n = codes.shape[0]
    n_words = (n + BASES_PER_WORD - 1) // BASES_PER_WORD
    padded = np.zeros(n_words * BASES_PER_WORD, np.uint32)
    padded[:n] = codes
    padded[n:] = 5  # genome padding code
    w = padded.reshape(n_words, BASES_PER_WORD)
    shifts = (np.arange(BASES_PER_WORD, dtype=np.uint32) * 4)
    return (w << shifts).sum(axis=1, dtype=np.uint32)


@functools.partial(jax.jit, static_argnames=("width",))
def gather_windows(genome_p4: jnp.ndarray, loc: jnp.ndarray, *, width: int):
    """(C,) start locations -> (C, width) uint8 base codes.

    Out-of-range reads clamp into the terminal padding words (code 5,
    matches nothing), mirroring the clipped-gather semantics of the
    unpacked path.
    """
    C = loc.shape[0]
    n_words = genome_p4.shape[0]
    loc = jnp.maximum(loc, 0)
    wstart = (loc >> 3).astype(jnp.int32)
    n_w = (width + BASES_PER_WORD - 1) // BASES_PER_WORD + 1
    widx = jnp.clip(wstart[:, None] + jnp.arange(n_w, dtype=jnp.int32)[None, :],
                    0, n_words - 1)
    words = genome_p4[widx]                                   # (C, n_w) u32

    # unpack to (C, n_w * 8) u8 codes
    shifts = (jnp.arange(BASES_PER_WORD, dtype=jnp.uint32) * 4)
    nib = (words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(15)
    codes = nib.astype(jnp.uint8).reshape(C, n_w * BASES_PER_WORD)

    # sub-word alignment: 8 static slices, masked-select by loc % 8
    off = (loc & 7).astype(jnp.int32)
    out = jnp.zeros((C, width), jnp.uint8)
    for s in range(BASES_PER_WORD):
        out = jnp.where((off == s)[:, None], codes[:, s:s + width], out)
    return out
