"""Rowwise segmented reductions via log-step lane shifts.

After aggregate_phase's ROWWISE (dir, loc) sort, every candidate/element
segment is a contiguous run WITHIN one row of the (rows, W) candidate
array — segments never cross rows.  The flat formulation (reshape to C,
jax.ops.segment_* with num_segments=C) lowers each reduction to a
C-element scatter plus a C-element gather-back; on v5e those scatters are
the engine's biggest non-gather cost block (PERF.md round-4: ~25 ms/batch
of 0.3-0.6 ms segment/select ops).  Keeping the (rows, W) shape instead,
a segmented reduction is a Hillis-Steele scan over the LANE dimension:
log2(W) shift+select steps of pure VPU work that XLA fuses into a handful
of kernels — no scatter, no gather.

This is the TPU replacement for the reference's per-read sequential
weight-list walk (BaseAligner.cpp:830-914), one level down: the walk's
running per-element state becomes a segmented scan.
"""
from __future__ import annotations

import jax.numpy as jnp


def _shift_right(x: jnp.ndarray, step: int, fill) -> jnp.ndarray:
    """Shift lanes right by `step` along axis 1, filling with `fill`."""
    pad = jnp.full_like(x[:, :step], fill)
    return jnp.concatenate([pad, x[:, :-step]], axis=1)


def seg_scan(val: jnp.ndarray, boundary: jnp.ndarray, op, identity):
    """Inclusive segmented scan of associative `op` along axis 1.

    boundary[i, j] = True marks element j as the first of its segment;
    boundary[:, 0] must be True.  Returns scan[i, j] = op-fold of the
    segment prefix ending at j.
    """
    W = val.shape[1]
    v = val
    m = ~boundary                      # may absorb from the left neighbor
    step = 1
    while step < W:
        v2 = _shift_right(v, step, identity)
        m2 = _shift_right(m, step, False)
        v = jnp.where(m, op(v2, v), v)
        m = m & m2
        step *= 2
    return v


def seg_first(val: jnp.ndarray, boundary: jnp.ndarray) -> jnp.ndarray:
    """Broadcast each segment's FIRST element to all its members."""
    W = val.shape[1]
    v = val
    m = ~boundary
    step = 1
    while step < W:
        v2 = _shift_right(v, step, jnp.zeros((), v.dtype))
        m2 = _shift_right(m, step, False)
        v = jnp.where(m, v2, v)        # combine(a, b) = a: carry the start
        m = m & m2
        step *= 2
    return v


def seg_broadcast(val: jnp.ndarray, boundary: jnp.ndarray, op, identity):
    """Segment-total of `op`, broadcast to every member of the segment.

    Forward inclusive scan puts the total at each segment's last element;
    a reversed copy-first scan spreads it back over the whole segment.
    """
    total_at_last = seg_scan(val, boundary, op, identity)
    is_last = jnp.concatenate(
        [boundary[:, 1:], jnp.ones_like(boundary[:, :1])], axis=1)
    rv = total_at_last[:, ::-1]
    rb = is_last[:, ::-1]
    return seg_first(rv, rb)[:, ::-1]
