"""Pre-compile + serialize the bench-shape TPU executables (AOT cache).

Run this AFTER the last edit to any traced source (utils/aot_cache.py's
digest covers models/ ops/ index/ parallel/ rna/ minus the host-side
pipeline files) and BEFORE the driver's bench run: a warmed cache turns
bench.py's 'pe-compile' stage from ~500s of trace+compile into a ~6s
executable load, which is the difference between a number and an rc=3
timeout under the driver's 540s deadline (BENCH_r03).

Warms: the paired engine, the single engine, and the CIGAR-backtrace
kernel at the bucket shapes the e2e extra reaches (64/128 rows after the
substitution fast path strips indel-free records).

Usage: python tools/warm_aot.py  (TPU must be reachable; ~10-20 min cold,
seconds when everything already matches)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snap_rnaseq_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax.numpy as jnp

from snap_rnaseq_tpu.index.hash_index import GenomeIndex
from snap_rnaseq_tpu.models.paired import PairedAligner
from snap_rnaseq_tpu.models.single import SingleAligner
from snap_rnaseq_tpu.ops.cigar import compute_cigars
from snap_rnaseq_tpu.utils.synth_genome import wgsim_pairs

CACHE = os.environ.get("SNAP_TPU_BENCH_CACHE", "/root/bench_cache")
GENOME_BASES = int(os.environ.get("SNAP_TPU_BENCH_BASES", 64_000_000))
B = 1024
READ_LEN = 100


def main():
    t0 = time.time()
    index = GenomeIndex.load(
        os.path.join(CACHE, f"hg{GENOME_BASES // 1_000_000}_s20"))
    codes = np.asarray(index.genome.codes)
    pad = int(index.genome.piece_offsets[0])
    body = codes[pad:pad + GENOME_BASES]
    r0, q0, r1, q1, _, _ = wgsim_pairs(body, B, READ_LEN, seed=0)
    args = tuple(jnp.asarray(x) for x in (r0, q0, r1, q1))

    print(f"[{time.time()-t0:6.1f}s] warming paired engine...", flush=True)
    pa = PairedAligner(index, cand_per_read=64)   # bench operating point
    out = pa.align_batch_device(*args)
    np.asarray(out["pair_found"])          # real fetch (axon sync caveat)
    print(f"[{time.time()-t0:6.1f}s] paired ready "
          f"(pair_found={float(np.asarray(out['pair_found']).mean()):.4f})",
          flush=True)

    print(f"[{time.time()-t0:6.1f}s] warming single engine...", flush=True)
    sa = SingleAligner(index)
    sout = sa.align_batch_device(args[0], args[1])
    np.asarray(sout["result"])
    print(f"[{time.time()-t0:6.1f}s] single ready", flush=True)

    for rows in (64, 128):
        print(f"[{time.time()-t0:6.1f}s] warming cigar kernel B={rows}...",
              flush=True)
        pat = np.zeros((rows, 128), np.uint8)
        txt = np.zeros((rows, 128), np.uint8)
        pl = np.full(rows, READ_LEN, np.int32)
        tl = np.full(rows, READ_LEN, np.int32)
        compute_cigars(pat, pl, txt, tl)
    print(f"[{time.time()-t0:6.1f}s] all warm", flush=True)


if __name__ == "__main__":
    main()
