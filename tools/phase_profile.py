"""Honest per-phase profile of the engine at the PE bench operating point.

Methodology (PERF.md): N DEPENDENT in-jit iterations per phase, wall/N.
Each iteration's inputs pass through a lax.optimization_barrier together
with the running reduction of the previous iteration's outputs, so XLA
cannot hoist the phase out of the loop or overlap iterations; a single
block_until_ready at the end amortizes the axon tunnel latency.

The phases mirror _paired_align_batch's per-end front half + back half on
real bench data (cached 64Mb index, wgsim reads), with the intermediate
tensors materialised once outside the timed loop.

Usage: python tools/phase_profile.py [iters]
"""
import functools
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
from snap_rnaseq_tpu.models import single as sg
from snap_rnaseq_tpu.models.paired import PairedAligner
from snap_rnaseq_tpu.utils.synth_genome import wgsim_pairs

CACHE = os.environ.get("SNAP_TPU_BENCH_CACHE", "/root/bench_cache")
GENOME_MB = int(os.environ.get("SNAP_TPU_BENCH_BASES", 64_000_000)) // 1_000_000
B = 1024
READ_LEN = 100


def timed(name, fn, args, iters, perturb=None):
    """Run fn(*args) iters times inside one jit with the iterations chained
    through lax.optimization_barrier, so XLA can neither hoist fn out of
    the loop nor overlap iterations.  `perturb` is accepted for call-site
    compatibility and unused (the barrier covers every arg)."""

    @jax.jit
    def loop(args):
        def body(i, carry):
            acc, a = carry
            out = fn(*a)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves
                    if jnp.issubdtype(x.dtype, jnp.number))
            acc = acc + s
            # optimization_barrier ties the next iteration's inputs to this
            # iteration's reduction: XLA cannot hoist fn out of the loop or
            # overlap iterations through the barrier.  (The previous
            # formulation added `min(|acc|, 0)` to an input, which is
            # mathematically always 0 and foldable — see ADVICE.md r3.)
            acc, a = jax.lax.optimization_barrier((acc, tuple(a)))
            return acc, tuple(a)
        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), args))
        return acc

    t0 = time.time()
    loop(args).block_until_ready()
    compile_s = time.time() - t0
    t0 = time.time()
    loop(args).block_until_ready()
    dt = (time.time() - t0) / iters
    print(json.dumps({"phase": name, "ms": round(dt * 1e3, 2),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return dt


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    index = GenomeIndex.load(os.path.join(CACHE, f"hg{GENOME_MB}_s20"))
    pa = PairedAligner(index)
    cfg = pa.cfg
    ecfg = cfg.end_config()
    seed_len = index.seed_len
    genome_size = pa.genome_size

    codes = np.asarray(index.genome.codes)
    pad = int(index.genome.piece_offsets[0])
    body = codes[pad:pad + GENOME_MB * 1_000_000]
    r0, q0, r1, q1, _, _ = wgsim_pairs(body, B, READ_LEN, seed=0)
    reads = jnp.asarray(r0)
    quals = jnp.asarray(q0)

    from snap_rnaseq_tpu.utils.seed_sequencer import seed_position_schedule
    ht_entries = pa._dev["ht_entries"]
    shard_start = pa._dev["shard_start"]
    shard_size = pa._dev["shard_size"]
    overflow = pa._dev["overflow"]
    genome_p4 = pa._dev["genome_p4"]
    piece_starts = pa._dev["piece_starts"]
    cuckoo = pa._cuckoo
    positions, wraps_np = seed_position_schedule(READ_LEN, seed_len)
    S = min(cfg.max_seed_slots, len(positions))
    schedule = jnp.asarray(positions[:S])
    wraps = jnp.asarray(wraps_np[:S])
    sched_static = tuple(int(x) for x in positions[:S])

    print(f"# backend={jax.default_backend()} B={B} e_max={ecfg.e_max}",
          file=sys.stderr, flush=True)

    # ---- materialise intermediates once (outside timing) ----
    seeds = sg.seed_phase(reads, schedule, seed_len, ht_entries, shard_start,
                          shard_size, overflow, genome_size, sched_static,
                          cuckoo)
    cg = jnp.where(seeds["found"][:, :, None], seeds["counts"], 0)
    budget = sg.budget_phase(seeds["valid"], cg, wraps, ecfg)
    cands = sg.expand_phase(seeds, budget, schedule, overflow, ecfg,
                            seed_len, READ_LEN, ecfg.cand_per_read)
    u_full = sg.aggregate_phase(cands)
    u, _ = sg.compact_phase(u_full, B, ecfg)
    sc = sg.filtered_score_phase(u, reads, quals, genome_p4, piece_starts,
                                 ecfg, seed_len, READ_LEN, genome_size, B)
    jax.block_until_ready(sc["score"])

    # ---- timed phases ----
    timed("seed", lambda rd: sg.seed_phase(
        rd, schedule, seed_len, ht_entries, shard_start, shard_size,
        overflow, genome_size, sched_static, cuckoo), (reads,), iters, 0)

    timed("expand", lambda v, c: sg.expand_phase(
        {**seeds, "valid": v, "counts": c}, budget, schedule, overflow,
        ecfg, seed_len, READ_LEN, ecfg.cand_per_read),
        (seeds["valid"], seeds["counts"]), iters, 1)

    timed("aggregate", lambda locs: sg.aggregate_phase(
        {**cands, "loc": locs}), (cands["loc"],), iters, 0)

    timed("compact", lambda locs: sg.compact_phase(
        {**u_full, "loc": locs}, B, ecfg)[0], (u_full["loc"],), iters, 0)

    timed("score(filtered)", lambda locs: sg.filtered_score_phase(
        {**u, "loc": locs}, reads, quals, genome_p4, piece_starts, ecfg,
        seed_len, READ_LEN, genome_size, B), (u["loc"],), iters, 0)

    timed("replay", lambda s: sg.replay_phase(
        u, {**sc, "score": s}, budget, reads, B, schedule.shape[0], ecfg),
        (sc["score"],), iters, 0)

    # whole per-end front half + back half for cross-check
    from snap_rnaseq_tpu.models.paired import _paired_align_batch
    timed("FULL paired batch", lambda rd: _paired_align_batch(
        rd, quals, jnp.asarray(r1), jnp.asarray(q1), ht_entries, shard_start,
        shard_size, overflow, genome_p4, piece_starts, schedule, wraps,
        cuckoo, cfg=cfg, seed_len=seed_len, read_len=READ_LEN,
        genome_size=genome_size, sched_static=sched_static),
        (reads,), max(4, iters // 4), 0)


if __name__ == "__main__":
    main()
