"""Micro-costs of the engine's structural primitives on the real chip.

Answers, with ~30s of compiles: what does a lax.cond cost as a function of
operand count/size; what do C-element scatters (stable partition, dense
scatter) and segment reductions cost; what does a (R, W) rowwise segmented
scan cost.  Methodology: N dependent in-jit iterations via fori_loop
(PERF.md — per-call syncs through the axon tunnel lie), wall/N.

Usage: python tools/micro_tpu.py [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snap_rnaseq_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50
C = 131072
B = 2048
W = 64


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])   # real sync
    t0 = time.time()
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / N * 1e3
    print(f"{dt:8.3f} ms  {name}", flush=True)


def dep_loop(body):
    """N dependent iterations: perturb one input by a data-dependent 0."""
    def run(x, *rest):
        def it(_, x):
            y = body(x, *rest)
            leaf = jax.tree_util.tree_leaves(y)[0]
            bump = (leaf.reshape(-1)[0] * 0).astype(x.dtype)
            return x + bump
        return jax.lax.fori_loop(0, N, it, x)
    return run


def main():
    key = jax.random.PRNGKey(0)
    xc = jax.random.randint(key, (C,), 0, 1 << 20, dtype=jnp.int32)
    mask = jax.random.uniform(jax.random.PRNGKey(1), (C,)) < 0.5
    xrw = xc.reshape(B, W)
    bnd = (jax.random.uniform(jax.random.PRNGKey(2), (B, W)) < 0.25
           ).at[:, 0].set(True)
    big = jax.random.randint(jax.random.PRNGKey(3), (8_949_931,), 0,
                             1 << 20, dtype=jnp.int32).astype(jnp.uint32)
    idx = jax.random.randint(jax.random.PRNGKey(4), (C,), 0, 8_900_000,
                             dtype=jnp.int32)

    # 1. bare cond, 8 operands of C i32 (tuple-copy cost of a tier cond)
    def cond8(x, m):
        ops = tuple(x + i for i in range(8))
        return jax.lax.cond(m.sum() > 0,
                            lambda t: tuple(v + 1 for v in t),
                            lambda t: tuple(v + 2 for v in t), ops)[0]
    timed("lax.cond, 8 x s32[131072] operands", dep_loop(cond8), xc, mask)

    # 2. stable partition: cumsum + inv scatter + K gathers (compact_phase)
    def partition(x, m):
        mi = m.astype(jnp.int32)
        pos_t = jnp.cumsum(mi) - 1
        n_t = pos_t[-1] + 1
        dest = jnp.where(m, pos_t, n_t + jnp.cumsum(1 - mi) - 1)
        inv = jnp.zeros(C, jnp.int32).at[dest].set(
            jnp.arange(C, dtype=jnp.int32))
        take = inv[:C // 2]
        return x[take]
    timed("stable partition C=131072 -> 65536 (1 payload)",
          dep_loop(partition), xc, mask)

    # 3. segment_min over sorted ids, C -> B segments
    seg = jnp.repeat(jnp.arange(B, dtype=jnp.int32), W)
    def segmin(x, s):
        return jax.ops.segment_min(x, s, num_segments=B,
                                   indices_are_sorted=True)
    timed("segment_min C=131072 -> B=2048 (sorted)", dep_loop(segmin),
          xc, seg)
    def segmin_u(x, s):
        return jax.ops.segment_min(x, s, num_segments=B)
    timed("segment_min C=131072 -> B=2048 (unsorted lowering)",
          dep_loop(segmin_u), xc, seg)

    # 4. rowwise segmented broadcast (rowscan)
    from snap_rnaseq_tpu.ops.rowscan import seg_broadcast
    def rws(x, b):
        return seg_broadcast(x, b, jnp.minimum, 1 << 30)
    timed("rowwise seg_broadcast (2048, 64)", dep_loop(rws), xrw, bnd)

    # 5. random u32 gather C from 8.9M
    def gat(i, t):
        return t[i]
    timed("random gather u32 x131072 from 8.9M", dep_loop(gat), idx, big)

    # 6. dense scatter (B, W) <- C (dense_per_read shape)
    tr = jax.random.randint(jax.random.PRNGKey(5), (C,), 0, B,
                            dtype=jnp.int32)
    tc = jax.random.randint(jax.random.PRNGKey(6), (C,), 0, W,
                            dtype=jnp.int32)
    def dscat(x, r, c):
        return jnp.zeros((B, W), jnp.int32).at[r, c].set(x, mode="drop")
    timed("scatter C=131072 -> (2048, 64)", dep_loop(dscat), xc, tr, tc)

    # 7. elementwise chain baseline
    def ew(x, m):
        return jnp.where(m, x * 3 + 1, x - 2)
    timed("fused elementwise on s32[131072]", dep_loop(ew), xc, mask)


if __name__ == "__main__":
    main()
