"""Per-read trace: the _DumpAlignments analog (BaseAligner.cpp:622-631).

The production engine is one fused jit; for debugging single-read
disagreements you want the INTERMEDIATES — which seeds hit, which
candidates existed, what each scored, what the selection saw.  The engine
is already decomposed into pure phase functions (models/single.py), so the
trace simply replays them one at a time for a single read (B=1) with the
scoring budget disabled (exhaustive LV over every candidate) and formats
the results.

Usage:
    from snap_rnaseq_tpu.models.trace import trace_read
    print(trace_read(aligner, read_codes, quals))

or via the CLI:  snap-rna-tpu trace <index-dir> <read> [<quals>]
(read as an ACGT string, quals as a phred+33 string; defaults to 'I' * L).
"""
from __future__ import annotations

import numpy as np

from . import single as sg


def trace_read(aligner, read_codes: np.ndarray, quals: np.ndarray) -> str:
    """Phase-by-phase trace of one read through the given SingleAligner."""
    import jax.numpy as jnp

    read_codes = np.asarray(read_codes, np.uint8).reshape(1, -1)
    quals = np.asarray(quals, np.uint8).reshape(1, -1)
    L = read_codes.shape[1]
    cfg = aligner.cfg.resolve_for_read_len(L)
    # exhaustive scoring: no prefilter/compaction/budget, no wide-tier cond
    cfg = sg.SingleAlignerConfig(**{**cfg.__dict__,
                                    "score_budget_per_read": 0,
                                    "compact_per_read": 0,
                                    "overflow_tier": False})
    positions, wraps = aligner.schedule_for(L)
    dev = aligner._dev
    genome = aligner.index.genome
    seed_len = aligner.index.seed_len

    seeds = sg.seed_phase(read_codes, jnp.asarray(positions), seed_len,
                          dev["ht_entries"], dev["shard_start"],
                          dev["shard_size"], dev["overflow"],
                          aligner.genome_size,
                          tuple(int(x) for x in positions), aligner._cuckoo)
    counts = np.asarray(jnp.where(seeds["found"][:, :, None],
                                  seeds["counts"], 0))
    budget = sg.budget_phase(seeds["valid"], jnp.asarray(counts),
                             jnp.asarray(wraps), cfg)
    cands = sg.expand_phase(seeds, budget, jnp.asarray(positions),
                            dev["overflow"], cfg, seed_len, L,
                            cfg.cand_per_read)
    u = sg.aggregate_phase(cands)
    sc = sg.score_phase(u, jnp.asarray(read_codes), jnp.asarray(quals),
                        dev["genome_p4"], dev["piece_starts"], cfg,
                        seed_len, L, aligner.genome_size)
    out = sg.replay_phase(u, sc, budget, jnp.asarray(read_codes), 1,
                          len(positions), cfg)

    lines = [f"read: {L}bp, seed_len {seed_len}, e_max {cfg.e_max}, "
             f"num_seeds {cfg.num_seeds}, max_hits {cfg.max_hits}"]
    valid = np.asarray(seeds["valid"])[0]
    found = np.asarray(seeds["found"])[0]
    applied = np.asarray(budget["applied_act"])[0]
    popular = np.asarray(budget["popular"])[0]
    lines.append("seeds (offset: fwd-hits/rc-hits flags):")
    for s, p in enumerate(positions):
        flags = []
        if not valid[s]:
            flags.append("invalid")
        if not found[s]:
            flags.append("miss")
        for d in range(2):
            if popular[s, d]:
                flags.append(f"popular[{'fr'[d]}]")
            if applied[s, d]:
                flags.append(f"applied[{'fr'[d]}]")
        lines.append(f"  @{int(p):3d}: {counts[0, s, 0]}/{counts[0, s, 1]} "
                     f"{' '.join(flags)}")

    live = np.asarray(u["live"])
    loc = np.asarray(u["loc"])
    dirs = np.asarray(u["dir"])
    score = np.asarray(sc["score"])
    logp = np.asarray(sc["logp"])
    okd = np.asarray(sc["scored_ok"])
    loc_adj = np.asarray(sc["loc_adj"])
    order = np.argsort(np.where(live & okd, score, 1 << 30), kind="stable")
    n_live = int(live.sum())
    lines.append(f"candidates: {n_live} unique "
                 f"(slots {live.shape[0]}, truncated "
                 f"{int(np.asarray(cands['truncated'])[0])})")
    shown = 0
    for c in order:
        if not live[c] or shown >= 50:
            break
        name, off = genome.piece_at(int(loc_adj[c] if okd[c] else loc[c]))
        lines.append(
            f"  {name}:{off + 1} {'fwd' if dirs[c] == 0 else 'rc '} "
            + (f"score {int(score[c]):2d} logp {float(logp[c]):9.3f}"
               if okd[c] else "score >e_max"))
        shown += 1
    if n_live > shown:
        lines.append(f"  ... {n_live - shown} more (unscored/worse)")

    res = {k: np.asarray(v)[0] for k, v in out.items()
           if np.asarray(v).shape[:1] == (1,)}
    status = {0: "NotFound", 1: "SingleHit", 2: "MultipleHits"}[
        int(res["result"])]
    if int(res["result"]) != 0:
        name, off = genome.piece_at(int(res["loc"]))
        where = f"{name}:{off + 1} {'fwd' if int(res['direction']) == 0 else 'rc'}"
    else:
        where = "-"
    lines.append(f"result: {status} {where} score {int(res['score'])} "
                 f"mapq {int(res['mapq'])} "
                 f"log_pbest {float(res['log_pbest']):.3f} "
                 f"log_pall {float(res['log_pall']):.3f} "
                 f"popular_skipped {int(res['popular'])}")
    return "\n".join(lines)
