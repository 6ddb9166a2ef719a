"""Engine-level A/B bench on the cached 64Mb PE bench shape.

Times the full paired engine under config variations to attribute batch
cost (PERF.md methodology: many dispatches, ONE final sync — per-call
syncs through the axon tunnel lie; >=ROUNDS dispatches amortize the fixed
tunnel latency).

Usage: python tools/engine_ab.py [config ...]
  configs: default, norescue, onehot, b2048, se (single-end), all
Prints one JSON line per config.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snap_rnaseq_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from snap_rnaseq_tpu.index.hash_index import GenomeIndex
from snap_rnaseq_tpu.utils.synth_genome import wgsim_pairs

CACHE = os.environ.get("SNAP_TPU_BENCH_CACHE", "/root/bench_cache")
GENOME_MB = int(os.environ.get("SNAP_TPU_BENCH_BASES", 64_000_000)) // 1_000_000
ROUNDS = int(os.environ.get("SNAP_TPU_AB_ROUNDS", 20))
READ_LEN = 100


def batches(index, n_pairs, n_batches=3):
    codes = np.asarray(index.genome.codes)
    pad = int(index.genome.piece_offsets[0])
    body = codes[pad:pad + GENOME_MB * 1_000_000]
    out = []
    for s in range(n_batches):
        r0, q0, r1, q1, _, _ = wgsim_pairs(body, n_pairs, READ_LEN, seed=s)
        out.append(tuple(jnp.asarray(x) for x in (r0, q0, r1, q1)))
    return out


def run(name, index):
    os.environ.pop("SNAP_TPU_LV_LANES", None)
    B = 1024
    # default = the bench operating point (bench.py uses cand_per_read=64)
    kw = {"cand_per_read": 64}
    if name == "norescue":
        kw["mate_rescue"] = False
    elif name == "onehot":
        os.environ["SNAP_TPU_LV_LANES"] = "onehot"
    elif name == "b2048":
        B = 2048
    elif name == "cand128":
        kw["cand_per_read"] = 128
    t0 = time.time()
    if name == "se":
        from snap_rnaseq_tpu.models.single import SingleAligner
        eng = SingleAligner(index)
        bs = [(r0, q0) for (r0, q0, _, _) in batches(index, B)]
        step = lambda b: eng.align_batch_device(*b)
        reads_per_batch = B
        key = "result"
    else:
        from snap_rnaseq_tpu.models.paired import PairedAligner
        eng = PairedAligner(index, **kw)
        bs = batches(index, B)
        step = lambda b: eng.align_batch_device(*b)
        reads_per_batch = 2 * B
        key = "pair_found"
    out = step(bs[0])
    # REAL device fetch: block_until_ready returns early through the axon
    # remote path, especially for AOT-deserialized executables (PERF.md
    # methodology) — np.asarray is the only trustworthy sync
    np.asarray(out[key])
    compile_s = time.time() - t0
    t0 = time.time()
    n = 0
    for i in range(ROUNDS):
        out = step(bs[i % len(bs)])
        n += reads_per_batch
    np.asarray(out[key])
    dt = time.time() - t0
    print(json.dumps({"config": name, "reads_per_sec": round(n / dt, 1),
                      "ms_per_batch": round(dt / ROUNDS * 1e3, 1),
                      "batch": B, "rounds": ROUNDS,
                      "compile_s": round(compile_s, 1)}), flush=True)


def main():
    names = sys.argv[1:] or ["default"]
    if names == ["all"]:
        names = ["default", "norescue", "onehot", "b2048", "se"]
    index = GenomeIndex.load(os.path.join(CACHE, f"hg{GENOME_MB}_s20"))
    for name in names:
        try:
            run(name, index)
        except Exception as e:
            print(json.dumps({"config": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
