"""A/B timing of the lanes LV kernel implementations on the live backend.

Methodology (PERF.md): per-call block_until_ready timings through the axon
remote path are unreliable; the only trustworthy phase measurement is N
DEPENDENT iterations of the phase inside one jit (lax.fori_loop with a data
dependency between iterations), wall/N.

Shapes mirror the bench engine's score-phase buckets on the 64Mb hg-like
paired bench (models/single.py filtered_score_phase): bucket 0 runs
e_max=3 on ~B*2..B*8 rows, bucket 1 e_max=7, bucket 2 e_max=14/15.

Usage: python tools/lv_ab.py [iters]
Prints one JSON line per (impl, rows, e_max) combo.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from snap_rnaseq_tpu.ops.lv_pallas import lv_distance_pallas_lanes

P = 100
MAX_K = 31


def make_inputs(rows, e_max, seed=0):
    rng = np.random.default_rng(seed)
    pattern = rng.integers(0, 4, (rows, P), dtype=np.uint8)
    TXT = 2 * e_max + P + 8
    text = np.full((rows, TXT), 255, np.uint8)
    # text = pattern with ~3% errors, placed at offset e_max
    body = pattern.copy()
    errs = rng.random((rows, P)) < 0.03
    body[errs] = (body[errs] + rng.integers(1, 4, errs.sum())) % 4
    text[:, e_max:e_max + P] = body
    p_len = np.full(rows, P, np.int32)
    t_len = np.full(rows, P + 4, np.int32)
    k = np.full(rows, min(e_max, MAX_K), np.int32)
    qlp = np.full((rows, P), -4.0, np.float32)
    return (jnp.asarray(pattern), jnp.asarray(p_len), jnp.asarray(text),
            jnp.asarray(t_len), jnp.asarray(k), jnp.asarray(qlp))


@functools.partial(jax.jit, static_argnames=("e_max", "impl", "iters"))
def run_n(pattern, p_len, textp, t_len, k, qlp, *, e_max, impl, iters):
    def body(i, carry):
        acc, kk = carry
        d, ef, df, lp, net = lv_distance_pallas_lanes(
            pattern, p_len, textp, t_len, kk, qlp,
            e_max=e_max, impl=impl)
        # data dependency: next k depends on this round's output (value-
        # preserving: d >= -1 so (d+2)*0 == 0)
        acc = acc + d.sum()
        kk = k + jnp.minimum(jnp.abs(acc), 0).astype(jnp.int32)
        return acc, kk
    acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.int32(0), k))
    return acc


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    combos = [(4096, 3), (2048, 7), (1024, 14)]
    for rows, e_max in combos:
        args = make_inputs(rows, e_max)
        for impl in ("bits", "onehot"):
            try:
                t0 = time.time()
                acc = run_n(*args, e_max=e_max, impl=impl, iters=2)
                acc.block_until_ready()
                compile_s = time.time() - t0
                t0 = time.time()
                acc = run_n(*args, e_max=e_max, impl=impl, iters=iters)
                acc.block_until_ready()
                dt = (time.time() - t0) / iters
                print(json.dumps({
                    "impl": impl, "rows": rows, "e_max": e_max,
                    "ms_per_call": round(dt * 1e3, 3),
                    "us_per_row": round(dt / rows * 1e6, 3),
                    "compile_s": round(compile_s, 1)}), flush=True)
            except Exception as e:
                print(json.dumps({"impl": impl, "rows": rows, "e_max": e_max,
                                  "error": f"{type(e).__name__}: {e}"[:300]}),
                      flush=True)


if __name__ == "__main__":
    main()
