"""Batched paired-end aligner.

Reference: SNAPLib/IntersectingPairedEndAligner.{h,cpp} (sorted-hit-set
intersection, candidate pools bucketed by best-possible score, pair
probability mass) wrapped by ChimericPairedEndAligner.{h,cpp} (single-end
fallback per end when no pair is found).

TPU redesign: both ends run the single-end candidate phases (seed lookup,
expansion, element aggregation, batched LV scoring) over the same device
program; the reference's coordinated descending walk of two sorted hit lists
(IntersectingPairedEndAligner.cpp:355-512) becomes a dense per-read pair
matrix over the two ends' unique candidates — K x K small (K = candidate
slots/read), entirely on the VPU, with the spacing/orientation window as a
mask.  Pair probability mass and MAPQ follow the reference's formulation
(pair probability = product of end probabilities; MAPQ from best/all pair
mass, IntersectingPairedEndAligner.cpp:514-741), and the chimeric fallback
reuses the per-end replay outputs that the single-end engine already
computes.

The pair edit-distance budget (-d, default 15) bounds the SUM of the two
ends' scores, as in the reference (AlignerOptions.cpp:73, usage text "per
read or pair").
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (DEFAULT_EXTRA_SEARCH_DEPTH, MAX_K, MAX_MERGE_DIST,
                         MAPQ_LIMIT_FOR_SINGLE_HIT, PAIRED_DEFAULTS)
from ..index.hash_index import GenomeIndex
from ..ops.genome_gather import gather_windows
from ..ops.lv import NEG_INF
from ..utils.seed_sequencer import seed_position_schedule
from . import single as sg

NOT_FOUND, SINGLE_HIT, MULTIPLE_HITS = 0, 1, 2
BIG = sg.BIG


@dataclass(frozen=True)
class PairedAlignerConfig:
    seed_len: int
    max_k: int = PAIRED_DEFAULTS["max_dist"]          # pair-total edit budget
    num_seeds: int = PAIRED_DEFAULTS["num_seeds"]
    max_hits: int = PAIRED_DEFAULTS["max_hits"]
    min_spacing: int = PAIRED_DEFAULTS["min_spacing"]
    max_spacing: int = PAIRED_DEFAULTS["max_spacing"]
    extra_search_depth: int = DEFAULT_EXTRA_SEARCH_DEPTH
    cand_per_read: int = 128
    max_seed_slots: int = 32
    force_spacing: bool = False
    score_budget_per_read: int = 16
    compact_per_read: int = 32
    overflow_tier: bool = False
    # Mate-window rescue: scan the spacing windows implied by the mate's
    # best candidates for an alignment the candidate budget lost.  The
    # reference gets this implicitly — its intersection walks COMPLETE hit
    # lists (up to 16000/seed, IntersectingPairedEndAligner.cpp:355-512),
    # so a flood read's true location always reaches pairing; our static
    # budgets truncate floods (measured: satellite reads carry 10^4..10^5
    # raw hits on hg-like genomes), and the rescue recovers exactly the
    # in-window alignments those truncations dropped.  One reversed
    # free-start Myers scan (ops/bitpar.py) per mate candidate window +
    # one whole-read LV for the winner; no effect when the budget already
    # holds the in-window candidates (rescue dedups against them).
    mate_rescue: bool = True
    rescue_mates: int = 2           # mate candidates whose windows are scanned
    # Estimate the pair-probability mass of truncation-dropped candidates
    # (truncated_count x mean kept non-best pair mass) and fold it into the
    # MAPQ denominator.  Conservative direction only (never raises MAPQ);
    # default decided empirically against the reference binary — see
    # PARITY.md.  Env override: SNAP_TPU_TRUNC_MASS=0/1.
    truncation_mass: bool = False

    @property
    def e_max(self) -> int:
        return min(MAX_K, self.max_k + self.extra_search_depth)

    def end_config(self) -> sg.SingleAlignerConfig:
        """Per-end single config used for candidate generation + fallback."""
        return sg.SingleAlignerConfig(
            seed_len=self.seed_len, max_k=self.max_k,
            num_seeds=self.num_seeds, max_hits=self.max_hits,
            extra_search_depth=self.extra_search_depth,
            cand_per_read=self.cand_per_read,
            max_seed_slots=self.max_seed_slots,
            score_budget_per_read=self.score_budget_per_read,
            compact_per_read=self.compact_per_read,
            overflow_tier=self.overflow_tier,
            seed_budget_per_position=True)


def _dense_per_read(u, sc, in_prob_flags, B, K):
    """Scatter the flat, read-sorted candidate arrays into (B, K) dense.

    Only SCORED candidates are densified (unscored rows are dead in the
    pair join anyway), and the K-cap ranks among scored rows — so a wide
    overflow tier carrying hundreds of unscored repeat candidates per read
    can never push a true scored hit past the cap."""
    C = u["read"].shape[0]
    r = u["read"]
    sel = u["live"] & sc["scored_ok"]
    ones = sel.astype(jnp.int32)
    cum = jnp.cumsum(ones) - ones                    # exclusive prefix count
    first = jax.ops.segment_min(jnp.where(sel, cum, jnp.int32(0x7FFFFFF0)),
                                r, num_segments=B, indices_are_sorted=True)
    rank = cum - first[r]
    keep = sel & (rank < K)
    tr = jnp.where(keep, r, B)
    tc = jnp.where(keep, rank, 0)

    def scat(x, fill, dtype=None):
        out = jnp.full((B, K), fill, dtype or x.dtype)
        return out.at[tr, tc].set(x, mode="drop")

    return dict(
        loc=scat(sc["loc_adj"], 0),
        dir=scat(u["dir"], 0),
        score=scat(jnp.where(sc["scored_ok"], sc["score"], BIG), BIG),
        logp=scat(jnp.where(sc["scored_ok"], sc["logp"], NEG_INF), NEG_INF),
        live=scat(sc["scored_ok"].astype(jnp.int32), 0).astype(bool),
        in_prob=scat(in_prob_flags.astype(jnp.int32), 0).astype(bool),
        # scored candidates the K-cap dropped from the pair join (flood
        # reads with > K scored locations) — observable, never silent
        overflow=(sel & ~keep).sum(),
    )


def _mate_rescue_end(d_e, d_m, reads_e, quals_e, genome_p4, piece_starts,
                     ecfg, cfg: PairedAlignerConfig, read_len, genome_size,
                     B, qlp_e=None):
    """One rescued candidate for end e from its mate's top candidates.

    For each of the mate's top `rescue_mates` scored candidates, scan the
    two pair-spacing windows ([loc_m - max_sp, loc_m - min_sp] and
    [loc_m + min_sp, loc_m + max_sp], opposite orientation — the exact
    window pair_phase accepts) with a reversed FREE-START Myers scan
    (ops/bitpar.py track_pos) that returns the best whole-read distance and
    its exact start location; the best in-budget window winner is then
    scored through the standard score_phase (seed_len=0: whole-read LV +
    probability backtrace at the found start), so its score/logp/loc_adj
    are bit-compatible with budget-kept candidates."""
    from ..ops.bitpar import bitpar_distance
    R = cfg.rescue_mates
    K = d_m["score"].shape[1]
    gate = ecfg.e_max
    span = cfg.max_spacing - cfg.min_spacing
    # window margin = the scan's own distance gate (see score_phase's
    # window-margin note)
    M = ecfg.e_max
    WLEN = span + read_len + 2 * M

    # top-R mate candidates by (score asc, logp desc)
    key = jnp.where(d_m["live"],
                    d_m["score"].astype(jnp.float32) * 1e6
                    - jnp.clip(d_m["logp"], -1e5, 0), jnp.float32(3e12))
    rows = jnp.arange(B)
    m_loc, m_dir, m_live = [], [], []
    for _ in range(R):
        w = jnp.argmin(key, axis=1)
        m_loc.append(d_m["loc"][rows, w])
        m_dir.append(d_m["dir"][rows, w])
        m_live.append(key[rows, w] < 3e12)
        key = key.at[rows, w].set(jnp.float32(3e12))
    m_loc = jnp.stack(m_loc, axis=1)                  # (B, R)
    m_dir = jnp.stack(m_dir, axis=1)
    m_live = jnp.stack(m_live, axis=1)

    # window starts: side 0 = upstream of the mate, side 1 = downstream
    lo = jnp.stack([m_loc - cfg.max_spacing,
                    m_loc + cfg.min_spacing], axis=2)  # (B, R, 2)
    NW = R * 2
    win_start = (lo - M).reshape(B * NW)
    dir_r = (1 - m_dir)[:, :, None]
    dir_rows = jnp.broadcast_to(dir_r, (B, R, 2)).reshape(B * NW)
    live_rows = jnp.broadcast_to(m_live[:, :, None], (B, R, 2)).reshape(B * NW)

    from ..ops.bitpar import bitpar_distance_words
    _win, win_words = gather_windows(
        genome_p4, win_start, width=WLEN,
        big=sg.big_locations(genome_size),
        return_packed=True)                                     # (B*NW, .)

    rc_reads = sg.COMP_LUT[reads_e[:, ::-1].astype(jnp.int32)]
    read_both = jnp.stack([reads_e, rc_reads], axis=1)
    ridx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), NW)
    pat = read_both[ridx, dir_rows]                             # (B*NW, L)

    # reversed scan: forward start s maps to reversed end column
    # WLEN - 1 - j_rev; free start + free end = best substring match.
    # The packed-words kernel scans the 4-bit stream back-to-front
    # in-VMEM — no reversed text copy, 4x less staged text.
    enc = bitpar_distance_words(pat[:, ::-1], win_words,
                                jnp.full((B * NW,), WLEN, jnp.int32),
                                P=read_len, TXT=WLEN, packed_off=0,
                                track_pos=True, free_start=True,
                                reverse=True)
    dist = enc >> 12
    start_in_w = WLEN - 1 - (enc & 4095)
    loc_r = win_start + start_in_w
    # start must lie inside the spacing interval for pair_phase to accept
    in_range = (start_in_w >= M) & (start_in_w <= M + span)
    ok = live_rows & in_range & (dist <= gate)

    # best window per read: (dist asc, row asc)
    ekey = jnp.where(ok, dist * NW + jnp.arange(B * NW) % NW,
                     jnp.int32(0x7FFFFFF0)).reshape(B, NW)
    wsel = jnp.argmin(ekey, axis=1)
    valid = ekey[rows, wsel] < 0x7FFFFFF0
    loc_best = loc_r.reshape(B, NW)[rows, wsel]
    dir_best = dir_rows.reshape(B, NW)[rows, wsel]

    # dedup: drop if a live dense candidate already covers the location
    dup = ((jnp.abs(d_e["loc"] - loc_best[:, None]) <= MAX_MERGE_DIST)
           & (d_e["dir"] == dir_best[:, None]) & d_e["live"]).any(axis=1)
    valid = valid & ~dup

    u_r = dict(read=jnp.arange(B, dtype=jnp.int32), dir=dir_best,
               loc=jnp.where(valid, loc_best, 0),
               off=jnp.zeros((B,), jnp.int32), live=valid)
    sc = sg.score_phase(u_r, reads_e, quals_e, genome_p4, piece_starts,
                        ecfg, 0, read_len, genome_size, qlp_both=qlp_e)
    keep = valid & sc["scored_ok"]
    return dict(loc=jnp.where(keep, sc["loc_adj"], 0)[:, None],
                dir=dir_best[:, None],
                score=jnp.where(keep, sc["score"], BIG)[:, None],
                logp=jnp.where(keep, sc["logp"], NEG_INF)[:, None],
                live=keep[:, None], in_prob=keep[:, None],
                n_rescued=keep.sum())


def _append_dense(d, resc):
    out = {k: jnp.concatenate([d[k], resc[k]], axis=1)
           for k in ("loc", "dir", "score", "logp", "live", "in_prob")}
    out["overflow"] = d["overflow"]
    return out


def pair_phase(d0, d1, cfg: PairedAlignerConfig, popular0, popular1,
               trunc_total=None):
    """Dense pair join + selection + pair MAPQ.

    trunc_total: optional (B,) count of expand-truncated candidates across
    both ends; with cfg.truncation_mass the estimated mass of the dropped
    candidates joins the MAPQ denominator."""
    B, K = d0["score"].shape
    maxK, extra = cfg.max_k, cfg.extra_search_depth

    l0 = d0["loc"][:, :, None]
    l1 = d1["loc"][:, None, :]
    dist = jnp.abs(l0 - l1)
    opp = d0["dir"][:, :, None] != d1["dir"][:, None, :]
    window = (dist >= cfg.min_spacing) & (dist <= cfg.max_spacing)
    valid = (d0["live"][:, :, None] & d1["live"][:, None, :] & opp & window)

    s_pair = jnp.where(valid,
                       d0["score"][:, :, None] + d1["score"][:, None, :],
                       BIG).reshape(B, K * K)
    lp_pair = (d0["logp"][:, :, None] + d1["logp"][:, None, :]).reshape(B, K * K)

    # winner: (score asc, prob desc); f32 composite is exact for score<=62
    key = jnp.where(s_pair < BIG,
                    s_pair.astype(jnp.float32) * 1e6 - jnp.clip(lp_pair, -1e5, 0),
                    jnp.float32(3e12))
    w = jnp.argmin(key, axis=1)
    rows = jnp.arange(B)
    best_score = s_pair[rows, w]
    best_logp = lp_pair[rows, w]
    pair_found = best_score <= maxK
    w0, w1 = w // K, w % K

    # pair probability mass over cluster-representative pairs
    limit = jnp.minimum(best_score, maxK) + extra
    in_mass = valid.reshape(B, K * K) & (s_pair <= limit[:, None]) & \
        (d0["in_prob"][:, :, None] & d1["in_prob"][:, None, :]).reshape(B, K * K)
    mx = jnp.maximum(jnp.max(jnp.where(in_mass, lp_pair, NEG_INF), axis=1), -1e29)
    mass = jnp.sum(jnp.where(in_mass, jnp.exp(lp_pair - mx[:, None]), 0.0), axis=1)
    log_pall = jnp.where(mass > 0, jnp.log(mass) + mx, NEG_INF)

    is_best = jnp.zeros((B, K * K), bool).at[rows, w].set(True)
    mass_o = jnp.sum(jnp.where(in_mass & ~is_best,
                               jnp.exp(lp_pair - mx[:, None]), 0.0), axis=1)
    if cfg.truncation_mass and trunc_total is not None:
        # dropped candidates estimated at the mean kept non-best pair mass
        # (same repeat families); adds to BOTH denominators, so MAPQ only
        # ever moves down, and not at all when nothing truncated
        count_o = jnp.sum((in_mass & ~is_best).astype(jnp.int32), axis=1)
        est = trunc_total.astype(jnp.float32) * mass_o \
            / jnp.maximum(count_o, 1).astype(jnp.float32)
        mass = mass + est
        mass_o = mass_o + est
        log_pall = jnp.where(mass > 0, jnp.log(mass) + mx, NEG_INF)
    log_pother = jnp.where(mass_o > 0, jnp.log(mass_o) + mx, NEG_INF)

    popular = popular0 + popular1
    # the reference hands computeMAPQ each END's score, not the pair sum
    # (IntersectingPairedEndAligner.cpp:741 bestResultScore[whichRead]) —
    # only the <5 special-70 gate differs between the two ends
    rows_b = jnp.arange(B)
    s0_best = d0["score"][rows_b, w // K]
    s1_best = d1["score"][rows_b, w % K]
    mapq0 = sg._compute_mapq(log_pall, best_logp, log_pother, s0_best, popular)
    mapq1 = sg._compute_mapq(log_pall, best_logp, log_pother, s1_best, popular)

    return dict(pair_found=pair_found, w0=w0, w1=w1,
                score=jnp.where(pair_found, best_score, -1),
                mapq=jnp.where(pair_found, jnp.minimum(mapq0, mapq1), 0),
                mapq0=jnp.where(pair_found, mapq0, 0),
                mapq1=jnp.where(pair_found, mapq1, 0),
                log_pbest=best_logp, log_pall=log_pall)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "seed_len", "read_len", "genome_size",
                     "sched_static"))
def _paired_align_batch(reads0, quals0, reads1, quals1,
                        ht_entries, shard_start, shard_size,
                        overflow, genome_p4, piece_starts,
                        schedule, wraps, cuckoo=None,
                        *, cfg: PairedAlignerConfig, seed_len: int,
                        read_len: int, genome_size: int,
                        sched_static: tuple = None):
    B = reads0.shape[0]
    S_all = schedule.shape[0]
    # ACTIVE-POSITION lookups: the paired seed budget is position-based
    # (IntersectingPairedEndAligner.cpp:266 — one lookup per position, hit
    # or miss), so the active set is exactly each read's first num_seeds
    # VALID positions — computable from the packed seeds BEFORE the
    # expensive table lookup.  Looking up only those shrinks the cuckoo
    # row gathers and every (B, S, ...) seed-space tensor by
    # S_all/num_seeds (4x at the defaults) with bit-identical results
    # (see seed_phase select_first_valid).
    S = min(cfg.num_seeds, S_all)
    ecfg = cfg.end_config()
    # BOTH ENDS IN ONE PIPELINE: the per-end phase graph used to run twice
    # (two lax.conds of ~24 ms each on v5e, round-4 device profile), and a
    # large share of that is per-op fixed overhead across ~800 small
    # fusions.  Concatenating the ends (rows 0..B-1 = end 0, B..2B-1 =
    # end 1) runs every phase once at 2B rows: data-bound ops cost the
    # same total, overhead-bound ops cost half.  All phases are row-
    # independent; the pooled tier/budget caps now span both ends (the
    # same cross-READ pooling approximation the engine already makes,
    # at 2x scale — overflow counters still observe any truncation).
    reads_cat = jnp.concatenate([reads0, reads1], axis=0)
    quals_cat = jnp.concatenate([quals0, quals1], axis=0)
    B2 = 2 * B
    # one phred-table gather per batch, shared by every scoring site (the
    # tier conds and the per-end rescue would otherwise each pay their own
    # — see filtered_score_phase's qlp_both note)
    from ..ops.lv import phred_log_prob_device
    qlp_cat = phred_log_prob_device(
        jnp.stack([quals_cat, quals_cat[:, ::-1]], axis=1))
    seeds = sg.seed_phase(reads_cat, schedule, seed_len, ht_entries,
                          shard_start, shard_size, overflow,
                          genome_size, sched_static, cuckoo,
                          select_first_valid=S)
    sel_pos = seeds["sel_pos"]                            # (2B, S)
    sched_tab = sg.row_select(
        jnp.broadcast_to(schedule[None, :], (B2, S_all)), sel_pos)
    wraps_tab = sg.row_select(
        jnp.broadcast_to(wraps[None, :], (B2, S_all)), sel_pos)
    cg = jnp.where(seeds["found"][:, :, None], seeds["counts"], 0)
    budget = sg.budget_phase(seeds["valid"], cg, wraps_tab, ecfg)

    def from_cands(cands, score_scale=1):
        """Rowwise back half over the 2B concatenated end rows (see
        single.rowwise_back_half): no pooled compaction, per-read LV
        budget, all replay reductions rowwise.  The dense pair-join view
        is the rowwise arrays themselves (W == cand_per_read)."""
        u2, sc2, single_out = sg.rowwise_back_half(
            cands, budget, reads_cat, quals_cat, genome_p4, piece_starts,
            ecfg, seed_len, read_len, genome_size, S,
            qlp_both=qlp_cat, score_scale=score_scale)
        dense = sg.dense_topk_rowwise(u2, sc2, ecfg.cand_per_read)
        score_overflow = single_out.pop("score_overflow")
        # scalar counters don't survive the per-end row slicing below
        for k in ("n_unique_candidates", "n_scored", "n_bucket2"):
            single_out.pop(k, None)
        eo = dict(dense=dense, single=single_out,
                  n_scored0=sc2["scored_ok"][:B].sum(),
                  n_scored1=sc2["scored_ok"][B:].sum(),
                  score_overflow=score_overflow)
        # residual truncation of the tier that actually ran
        eo["truncated"] = cands["truncated"]
        eo["n_cand0"] = cands["live"][:B].sum()
        eo["n_cand1"] = cands["live"][B:].sum()
        return eo

    big = sg.big_locations(genome_size)
    cands = sg.expand_phase(seeds, budget, sched_tab, overflow, ecfg,
                            seed_len, read_len, ecfg.cand_per_read, big=big)
    if ecfg.overflow_tier and ecfg.cand_per_read > 0:
        # candidate-overflow exact fallback (see single._align_batch):
        # 4x re-expand when the narrow tier truncated any hit list
        eo = jax.lax.cond(
            cands["truncated"].sum() > 0,
            lambda c: from_cands(
                sg.expand_phase(seeds, budget, sched_tab, overflow, ecfg,
                                seed_len, read_len,
                                4 * ecfg.cand_per_read, big=big),
                score_scale=4),
            lambda c: from_cands(c),
            cands)
    else:
        eo = from_cands(cands)

    # split the concatenated outputs back into per-end views; pooled
    # scalar counters (score_overflow, dense overflow) are attributed to
    # end 0 so the pipeline's summed stats stay exact
    ends = []
    for e in (0, 1):
        rows_e = slice(e * B, (e + 1) * B)
        dense_e = {k: (v[rows_e] if getattr(v, "ndim", 0) >= 1 else v)
                   for k, v in eo["dense"].items()}
        dense_e["overflow"] = (eo["dense"]["overflow"] if e == 0
                               else jnp.int32(0))
        single_e = {k: v[rows_e] for k, v in eo["single"].items()}
        ends.append(dict(dense=dense_e, single=single_e,
                         popular=single_e["popular"],
                         truncated=eo["truncated"][rows_e],
                         n_lookups=seeds["found"][rows_e].sum(),
                         n_candidates=eo[f"n_cand{e}"],
                         n_scored=eo[f"n_scored{e}"],
                         score_overflow=(eo["score_overflow"] if e == 0
                                         else jnp.int32(0)),
                         dense_overflow=dense_e["overflow"]))

    if cfg.mate_rescue and cfg.rescue_mates > 0:
        # both rescues read the PRE-append mate dense sets
        rrs = []
        for e, (reads_e, quals_e) in enumerate(((reads0, quals0),
                                                (reads1, quals1))):
            rrs.append(_mate_rescue_end(
                ends[e]["dense"], ends[1 - e]["dense"], reads_e, quals_e,
                genome_p4, piece_starts, ecfg, cfg, read_len, genome_size,
                B, qlp_e=qlp_cat[e * B:(e + 1) * B]))
        for e in (0, 1):
            ends[e]["dense"] = _append_dense(ends[e]["dense"], rrs[e])
            ends[e]["n_rescued"] = rrs[e]["n_rescued"]
    else:
        for e in (0, 1):
            ends[e]["n_rescued"] = jnp.int32(0)

    pr = pair_phase(ends[0]["dense"], ends[1]["dense"], cfg,
                    ends[0]["popular"], ends[1]["popular"],
                    trunc_total=ends[0]["truncated"] + ends[1]["truncated"])

    out = dict(pair_found=pr["pair_found"], pair_score=pr["score"],
               pair_mapq=pr["mapq"], pair_log_pall=pr["log_pall"])
    rows = jnp.arange(B)
    for e in (0, 1):
        d = ends[e]["dense"]
        s = ends[e]["single"]
        wsel = pr["w0"] if e == 0 else pr["w1"]
        p_loc = d["loc"][rows, wsel]
        p_dir = d["dir"][rows, wsel]
        p_scr = d["score"][rows, wsel]
        pf = pr["pair_found"]
        e_mapq = pr[f"mapq{e}"]
        mapq = jnp.where(pf, e_mapq, s["mapq"])
        result = jnp.where(
            pf,
            jnp.where(e_mapq >= MAPQ_LIMIT_FOR_SINGLE_HIT, SINGLE_HIT,
                      MULTIPLE_HITS),
            s["result"])
        out[f"result{e}"] = result
        out[f"loc{e}"] = jnp.where(pf, p_loc, s["loc"])
        out[f"dir{e}"] = jnp.where(pf, p_dir, s["direction"])
        out[f"score{e}"] = jnp.where(pf, p_scr, s["score"])
        out[f"mapq{e}"] = jnp.where(
            jnp.where(pf, True, s["result"] != NOT_FOUND), mapq, 0)
        out[f"truncated{e}"] = ends[e]["truncated"]
        # per-end device counters (BaseAligner.h:113-118 analog), consumed
        # by the pipeline's perf log (models/paired_pipeline.py drain())
        for c in ("n_lookups", "n_candidates", "n_scored",
                  "score_overflow", "dense_overflow", "n_rescued"):
            out[f"{c}{e}"] = ends[e][c]
    return out


class PairedAligner:
    """Host-facing paired-end wrapper (same contract as SingleAligner)."""

    def __init__(self, index: GenomeIndex, config: PairedAlignerConfig | None = None,
                 **overrides):
        self.index = index
        cfg = config or PairedAlignerConfig(seed_len=index.seed_len)
        if overrides:
            cfg = PairedAlignerConfig(**{**cfg.__dict__, **overrides})
        import os as _os
        env_tm = _os.environ.get("SNAP_TPU_TRUNC_MASS")
        if env_tm is not None and "truncation_mass" not in overrides:
            cfg = PairedAlignerConfig(**{**cfg.__dict__,
                                         "truncation_mass": env_tm == "1"})
        self.cfg = cfg
        arrs = index.device_arrays()
        import os
        use_cuckoo = os.environ.get("SNAP_TPU_LOOKUP", "cuckoo") == "cuckoo"
        skip = {"genome_size", "genome_codes"}
        if use_cuckoo:
            skip = skip | {"ht_entries"}
        self._dev = {k: jnp.asarray(v) for k, v in arrs.items()
                     if k not in skip}
        if use_cuckoo:
            from ..index.hash_index import cuckoo_layout_for
            self._cuckoo = {k: jnp.asarray(v)
                            for k, v in cuckoo_layout_for(index).items()}
            self._dev["ht_entries"] = jnp.zeros((1, 3), jnp.uint32)
        else:
            self._cuckoo = None
        from ..ops.genome_gather import pack_genome_4bit
        self._dev["genome_p4"] = jnp.asarray(
            pack_genome_4bit(arrs["genome_codes"]))
        self._dev["piece_starts"] = jnp.asarray(
            index.genome.piece_offsets.astype(np.int32))
        self.genome_size = int(arrs["genome_size"])
        self._aot = {}   # (B, L, dtypes) -> AOT-cached compiled executable

    def align_batch_device(self, reads0, quals0, reads1, quals1):
        B, L = reads0.shape
        positions, wraps = seed_position_schedule(L, self.index.seed_len)
        S = min(self.cfg.max_seed_slots, len(positions))
        dyn_args = (
            reads0, quals0, reads1, quals1,
            self._dev["ht_entries"],
            self._dev["shard_start"], self._dev["shard_size"],
            self._dev["overflow"], self._dev["genome_p4"],
            self._dev["piece_starts"],
            jnp.asarray(positions[:S]), jnp.asarray(wraps[:S]),
            self._cuckoo)
        statics = dict(
            cfg=self.cfg, seed_len=self.index.seed_len, read_len=L,
            genome_size=self.genome_size,
            sched_static=tuple(int(x) for x in positions[:S]))
        # On TPU, dispatch through the persistent AOT executable cache:
        # the cold XLA compile of this module is minutes-scale and JAX's
        # own persistent-cache key is unstable on this host (aot_cache.py).
        from ..utils.aot_cache import aot_enabled, load_or_compile
        if aot_enabled():
            shape_key = (B, L, reads0.dtype, quals0.dtype)
            compiled = self._aot.get(shape_key)
            if compiled is None:
                compiled = load_or_compile(
                    "paired_align", _paired_align_batch, dyn_args, statics)
                if compiled is not None:
                    self._aot[shape_key] = compiled
            if compiled is not None:
                return compiled(*dyn_args)
        return _paired_align_batch(*dyn_args, **statics)

    def align_batch(self, reads0, quals0, reads1, quals1) -> dict:
        out = self.align_batch_device(
            jnp.asarray(reads0), jnp.asarray(quals0),
            jnp.asarray(reads1), jnp.asarray(quals1))
        return jax.device_get(out)
