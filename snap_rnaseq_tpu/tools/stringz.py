"""Micro-benchmark of the string-distance kernels on random strings.

Analog of reference apps/stringz/stringz.cpp:1-40: time the edit-distance
kernels standalone (here: the XLA and Pallas Landau-Vishkin paths plus the
bit-parallel filter) on random pattern/text pairs and print pairs/s.

Usage: python -m snap_rnaseq_tpu.tools.stringz [-B 65536] [-P 100] [-k 16]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="stringz")
    p.add_argument("-B", type=int, default=16384, help="batch size")
    p.add_argument("-P", type=int, default=100, help="string length")
    p.add_argument("-k", type=int, default=16, help="edit distance band")
    p.add_argument("-r", type=int, default=5, help="timed rounds")
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..ops.bitpar import bitpar_distance
    from ..ops.lv import lv_distance

    rng = np.random.default_rng(0)
    B, P, k = a.B, a.P, a.k
    pat = rng.integers(0, 4, (B, P), dtype=np.uint8)
    text = np.zeros((B, P + 31), np.uint8)
    text[:, :P] = pat
    sel = rng.random(B) < 0.5
    for j in range(3):
        idx = rng.integers(0, P, B)
        text[sel, idx[sel]] ^= 1
    p_len = np.full(B, P, np.int32)
    t_len = np.full(B, P + 31, np.int32)
    kv = np.full(B, k, np.int32)
    args = (jnp.asarray(pat), jnp.asarray(p_len), jnp.asarray(text),
            jnp.asarray(t_len), jnp.asarray(kv))

    def bench(name, fn):
        r = fn()
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(a.r):
            r = fn()
        jax.block_until_ready(r)
        dt = (time.time() - t0) / a.r
        print(f"{name:24s} {dt * 1e3:9.2f} ms   {B / dt / 1e6:8.2f} M pairs/s")

    bench("bitpar (whole-read)",
          lambda: bitpar_distance(args[0], args[2], args[3], P=P))
    bench(f"landau-vishkin k={k}",
          lambda: lv_distance(*args, None, e_max=k).distance)
    bench("landau-vishkin k=7",
          lambda: lv_distance(*args[:4], jnp.minimum(args[4], 7), None,
                              e_max=7).distance)
    return 0


if __name__ == "__main__":
    sys.exit(main())
