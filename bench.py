"""Benchmark: alignment throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline: 100 bp PAIRED-END reads against a 250 Mb genome with human-like
repeat structure (snap_rnaseq_tpu/utils/synth_genome.py — SINE/LINE/
satellite families at hg-like densities), default paired operating point
(maxDist 15, 8 seeds, AlignerOptions.cpp:73-77).  This is the shape the
reference was engineered for: popular seeds, overflow-table traffic and
real candidate-set pressure, unlike a uniform-random genome where every
20-mer is unique.  Reads/s counts READS (2 per pair), matching the
reference's self-reported metric (AlignerContext.cpp:382-393).

extra also carries a single-end number on the same genome.

vs_baseline compares against a measurement of the reference binary on the
SAME genome and read shape on this host (BASELINE_MEASURED.json, produced
by tools/measure_reference_baseline.py: single-thread -O2 build x the
Manual's 20x-at-32-threads scaling).  Fallback: a documented constant.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH_PAIRS = 1024
READ_LEN = 100
GENOME_BASES = 250_000_000
ROUNDS = 12
FALLBACK_BASELINE = 500_000.0    # reads/s, 32-thread CPU SNAP estimate


def main():
    from snap_rnaseq_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax
    from snap_rnaseq_tpu.index.genome import genome_from_codes
    from snap_rnaseq_tpu.index.hash_index import GenomeIndex, build_index
    from snap_rnaseq_tpu.models.paired import PairedAligner
    from snap_rnaseq_tpu.models.single import SingleAligner
    from snap_rnaseq_tpu.utils.synth_genome import hg_like_genome, wgsim_pairs

    here = os.path.dirname(os.path.abspath(__file__))
    baseline = FALLBACK_BASELINE
    baseline_src = "fallback-constant"
    meas = os.path.join(here, "BASELINE_MEASURED.json")
    if os.path.exists(meas):
        with open(meas) as f:
            m = json.load(f)
        baseline = float(m.get("paired_reads_per_sec_32t_estimate")
                         or m.get("reads_per_sec_32t_estimate"))
        baseline_src = "measured (see BASELINE_MEASURED.json)"

    cache_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        f"snap_tpu_bench_hg{GENOME_BASES // 1_000_000}_s20")
    if os.path.exists(os.path.join(cache_dir, "index.json")):
        index = GenomeIndex.load(cache_dir)
    else:
        codes = hg_like_genome(GENOME_BASES, seed=0)
        index = build_index(genome_from_codes(codes), seed_len=20)
        index.save(cache_dir)
    codes = np.asarray(index.genome.codes)
    pad = int(index.genome.piece_offsets[0])
    body = codes[pad:pad + GENOME_BASES]

    paired = PairedAligner(index)
    single = SingleAligner(index)

    import jax.numpy as jnp
    pe_batches = []
    for s in range(3):
        r0, q0, r1, q1, _, _ = wgsim_pairs(body, BATCH_PAIRS, READ_LEN,
                                           seed=s)
        pe_batches.append(tuple(jnp.asarray(x) for x in (r0, q0, r1, q1)))

    out = paired.align_batch_device(*pe_batches[0])
    jax.block_until_ready(out["pair_found"])
    t0 = time.time()
    n = 0
    for i in range(ROUNDS):
        out = paired.align_batch_device(*pe_batches[i % 3])
        n += 2 * BATCH_PAIRS
    np.asarray(out["pair_found"]).sum()
    pe_dt = time.time() - t0
    pe_rps = n / pe_dt
    pair_frac = float(np.asarray(out["pair_found"]).mean())

    se_batches = [(r0, q0) for (r0, q0, _, _) in pe_batches]
    sout = single.align_batch_device(*se_batches[0])
    jax.block_until_ready(sout["result"])
    t0 = time.time()
    ns = 0
    for i in range(ROUNDS):
        sout = single.align_batch_device(*se_batches[i % 3])
        ns += BATCH_PAIRS
    se_aligned = float((np.asarray(sout["result"]) > 0).mean())
    se_rps = ns / (time.time() - t0)

    print(json.dumps({
        "metric": "reads aligned/sec/chip (100bp PE, 250Mb hg-like genome, "
                  "paired defaults)",
        "value": round(pe_rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(pe_rps / baseline, 4),
        "extra": {
            "batch_pairs": BATCH_PAIRS, "rounds": ROUNDS,
            "fraction_pairs_found": round(pair_frac, 4),
            "single_end_reads_per_sec": round(se_rps, 1),
            "single_end_fraction_aligned": round(se_aligned, 4),
            "baseline_reads_per_sec": baseline,
            "baseline_source": baseline_src,
        },
    }))


if __name__ == "__main__":
    main()
