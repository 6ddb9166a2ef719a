"""Batched single-end aligner: the TPU-native BaseAligner.

Reference: SNAPLib/BaseAligner.{h,cpp}.  The reference engine is a sequential
per-read loop: look up seeds one at a time, insert candidates into 48-wide
weight-list elements, score the highest-weight element with two LV calls,
stop early when no unseen location can win (BaseAligner.cpp:510-1399).

TPU redesign — two phases over a batch of reads:

PHASE A (wide, data-parallel):
  1. pack + look up ALL scheduled seeds for the whole batch at once
     (the reference's dynamic wrap schedule becomes a static position order,
     utils/seed_sequencer.py);
  2. expand every hit into a flat candidate buffer with a
     cumsum+searchsorted slot assignment (no ragged shapes);
  3. aggregate candidates into the reference's (direction, 48-bucket)
     elements by one sort + segment reductions: element weight, creation
     round, lowest-possible-score bound;
  4. score EVERY unique candidate with two batched LV kernel calls (forward
     tail + reversed head, exactly the split of BaseAligner.cpp:1196-1238),
     probability in log space.

PHASE B (replay, tiny):
  the reference's early-exit/score-limit/merge bookkeeping is replayed with
  vectorized segment ops: compute the round R* at which the sequential
  aligner would have stopped (lowest-possible-score bound vs evolving score
  limit, BaseAligner.cpp:1053-1108), drop candidates born later, merge
  nearby candidates into clusters (maxMergeDist=48, BaseAligner.cpp:1296-1331),
  sum cluster-best probabilities for MAPQ, and pick the winner with the
  reference tie-break (score, then probability, then scoring order).

Known deviations from the reference (documented, revisited in later rounds):
  * probabilityOfAllCandidates uses the FINAL score limit for membership,
    not the evolving limit — a candidate scored early under a looser limit
    is only counted here if it also passes the final limit;
  * candidates that join an element after the element was scored are still
    scored here (the reference never rescores such elements);
  * intra-round element ordering is approximated by (weight desc, last-hit
    order asc) rather than the live weight-list FIFO.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (DEFAULT_CONF_DIFF, DEFAULT_EXTRA_SEARCH_DEPTH,
                         INVALID_GENOME_LOCATION, MAX_K, MAX_MERGE_DIST,
                         MAPQ_LIMIT_FOR_SINGLE_HIT, SINGLE_DEFAULTS, SNP_PROB)
from ..index.hash_index import GenomeIndex
from ..ops import lookup as lk
from ..ops.lv import NEG_INF, lv_distance
from ..utils.seed_sequencer import seed_position_schedule

# result codes (analog of AlignmentResult, Aligner.h)
NOT_FOUND, SINGLE_HIT, MULTIPLE_HITS = 0, 1, 2

LOG_ONE_MINUS_SNP = float(np.log1p(-SNP_PROB))
BIG = jnp.int32(0x7FFFFFF0)

COMP_LUT = jnp.asarray(np.array([3, 2, 1, 0, 4, 5, 255, 255], np.uint8))


@dataclass(frozen=True)
class SingleAlignerConfig:
    seed_len: int
    max_k: int = SINGLE_DEFAULTS["max_dist"]
    num_seeds: int = SINGLE_DEFAULTS["num_seeds"]       # -n: applied-seed budget
    max_hits: int = SINGLE_DEFAULTS["max_hits"]         # -h: popularity cutoff
    extra_search_depth: int = DEFAULT_EXTRA_SEARCH_DEPTH
    cand_per_read: int = 128                            # static candidate slots
    max_seed_slots: int = 48                            # schedule positions looked up
    max_hits_to_get: int = 0                            # multi-hit output size

    @property
    def e_max(self) -> int:
        return min(MAX_K, self.max_k + self.extra_search_depth)


def _segment_ids(boundary: jnp.ndarray) -> jnp.ndarray:
    return jnp.cumsum(boundary.astype(jnp.int32)) - 1


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "seed_len", "read_len", "genome_size"))
def _align_batch(reads, quals,
                 ht_keys, ht_val1, ht_val2, shard_start, shard_size,
                 overflow, genome_codes, piece_starts,
                 schedule, wraps,
                 *, cfg: SingleAlignerConfig, seed_len: int, read_len: int,
                 genome_size: int):
    B, L = reads.shape
    S = schedule.shape[0]
    CPR = cfg.cand_per_read
    C = B * CPR
    maxK = cfg.max_k
    extra = cfg.extra_search_depth
    e_max = cfg.e_max

    rc_reads = COMP_LUT[reads[:, ::-1].astype(jnp.int32)]
    rc_quals = quals[:, ::-1]
    n_count = (reads == 4).sum(axis=1)

    # ---------------- seeds: pack + lookup -------------------------------
    packed = lk.pack_seeds(reads, schedule, seed_len)
    found, fwd_val, rc_val = lk.lookup_seeds(
        packed, ht_keys, ht_val1, ht_val2, shard_start, shard_size)

    cnt_f, base_f = lk.expand_counts(fwd_val, overflow, genome_size)
    cnt_r, base_r = lk.expand_counts(rc_val, overflow, genome_size)
    counts = jnp.stack([cnt_f, cnt_r], axis=2)            # (B,S,2)
    bases = jnp.stack([base_f, base_r], axis=2)
    vals = jnp.stack([fwd_val, rc_val], axis=2)

    valid_seed = packed["valid"]                          # (B,S)
    popular = (counts > cfg.max_hits) & valid_seed[:, :, None]
    applied = valid_seed[:, :, None] & ~popular           # (B,S,2)

    # seed budget: position s processed iff applied-count before s < num_seeds
    applied_per_pos = applied.sum(axis=2)                 # (B,S)
    cum_before = jnp.cumsum(applied_per_pos, axis=1) - applied_per_pos
    active_pos = cum_before < cfg.num_seeds               # (B,S)

    applied_act = applied & active_pos[:, :, None]
    n_applied_after = jnp.cumsum(applied_act.astype(jnp.int32), axis=1)  # (B,S,2)

    # lowest possible score of any unseen location, as of the START of each
    # round (BaseAligner.cpp:1053-1061): cummax over previous rounds of
    # floor(nApplied / (wrap+1))
    most = (wraps + 1).astype(jnp.int32)[None, :, None]
    lp_after = jax.lax.cummax(n_applied_after // most, axis=1)           # (B,S,2)
    lp_pre = jnp.concatenate(
        [jnp.zeros((B, 1, 2), jnp.int32), lp_after[:, :-1, :]], axis=1)

    # ---------------- candidate expansion --------------------------------
    used = jnp.where(applied_act & found[:, :, None], counts, 0)         # (B,S,2)
    used2 = used.reshape(B, S * 2)
    cum = jnp.cumsum(used2, axis=1)
    total = cum[:, -1]
    slots = jnp.arange(CPR, dtype=jnp.int32)
    group = jax.vmap(lambda c: jnp.searchsorted(c, slots, side="right"))(cum)
    group = jnp.minimum(group, S * 2 - 1).astype(jnp.int32)
    cand_live = slots[None, :] < jnp.minimum(total, CPR)[:, None]        # (B,CPR)
    n_truncated = jnp.maximum(total - CPR, 0)

    prev_cum = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), cum[:, :-1]], axis=1)
    within = slots[None, :] - jnp.take_along_axis(prev_cum, group, axis=1)

    s_idx = group // 2
    dir_idx = group % 2
    g_base = jnp.take_along_axis(bases.reshape(B, S * 2), group, axis=1)
    g_val = jnp.take_along_axis(vals.reshape(B, S * 2), group, axis=1)
    hit = lk.gather_hit(within, None, g_base, g_val, overflow)           # u32 (B,CPR)

    pos_at = schedule[s_idx]                                             # (B,CPR)
    offset = jnp.where(dir_idx == 0, pos_at, read_len - seed_len - pos_at)
    cand_loc = (hit - offset.astype(jnp.uint32)).astype(jnp.int32)
    cand_live = cand_live & (hit >= offset.astype(jnp.uint32))
    order = (group << 16) | jnp.minimum(within, 0xFFFF)                  # (B,CPR)

    # per-hit lowest-possible bound at creation time
    lp_at = jnp.take_along_axis(lp_pre.reshape(B, S * 2), group, axis=1)

    # ---------------- element aggregation (one sort + segments) ----------
    read_id = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, CPR))
    flat = lambda x: x.reshape(C)
    f_read, f_dir, f_loc = flat(read_id), flat(dir_idx), flat(cand_loc)
    f_order, f_off, f_live = flat(order), flat(offset), flat(cand_live)
    f_lp, f_round = flat(lp_at), flat(s_idx)

    f_loc = jnp.where(f_live, f_loc, BIG)
    perm = jnp.lexsort((f_order, f_loc, f_dir, f_read))
    r_, d_, l_ = f_read[perm], f_dir[perm], f_loc[perm]
    o_, off_, lp_, rd_ = f_order[perm], f_off[perm], f_lp[perm], f_round[perm]
    live_ = f_live[perm]

    elem_loc = l_ - l_ % MAX_MERGE_DIST
    elem_b = jnp.concatenate([jnp.ones(1, bool),
                              (r_[1:] != r_[:-1]) | (d_[1:] != d_[:-1]) |
                              (elem_loc[1:] != elem_loc[:-1])])
    cand_b = jnp.concatenate([jnp.ones(1, bool),
                              (r_[1:] != r_[:-1]) | (d_[1:] != d_[:-1]) |
                              (l_[1:] != l_[:-1])])
    elem_id = _segment_ids(elem_b)
    cand_id = _segment_ids(cand_b)

    ones = live_.astype(jnp.int32)
    elem_weight = jax.ops.segment_sum(ones, elem_id, num_segments=C)
    elem_weight = jnp.minimum(elem_weight, 63)
    elem_last_order = jax.ops.segment_max(
        jnp.where(live_, o_, -1), elem_id, num_segments=C)
    elem_lp = jax.ops.segment_min(
        jnp.where(live_, lp_, BIG), elem_id, num_segments=C)
    cand_first_order = jax.ops.segment_min(
        jnp.where(live_, o_, BIG), cand_id, num_segments=C)
    cand_first_round = jax.ops.segment_min(
        jnp.where(live_, rd_, BIG), cand_id, num_segments=C)
    # seedOffset of the LAST hit on this exact location (the reference
    # overwrites candidate->seedOffset per hit, BaseAligner.cpp:858-861)
    cand_last = jax.ops.segment_max(
        jnp.where(live_, (o_ << 10) | off_, -1), cand_id, num_segments=C)

    is_rep = cand_b & live_           # one representative per unique candidate
    u_read, u_dir, u_loc = r_, d_, l_
    u_off = jnp.where(cand_last[cand_id] >= 0, cand_last[cand_id] & 0x3FF, 0)
    u_order = cand_first_order[cand_id]
    u_round = cand_first_round[cand_id]
    u_weight = elem_weight[elem_id]
    u_last_order = elem_last_order[elem_id]
    u_lp = elem_lp[elem_id]
    u_live = is_rep

    # ---------------- LV scoring (two batched kernel calls) --------------
    read_both = jnp.stack([reads, rc_reads], axis=1)      # (B,2,L)
    qual_both = jnp.stack([quals, rc_quals], axis=1)

    so = jnp.where(u_live, u_off, 0)
    tail = so + seed_len
    loc_c = jnp.where(u_live, u_loc, 0)

    # text length after the reference's piece-boundary clipping
    # (BaseAligner.cpp:1160-1186)
    pidx = jnp.clip(jnp.searchsorted(piece_starts, loc_c, side="right") - 1,
                    0, piece_starts.shape[0] - 1)
    next_start = jnp.where(pidx + 1 < piece_starts.shape[0],
                           piece_starts[jnp.minimum(pidx + 1, piece_starts.shape[0] - 1)],
                           genome_size)
    want = read_len + MAX_K
    crosses = loc_c + want > jnp.minimum(next_start, genome_size)
    end_off = jnp.where(loc_c + want >= genome_size, genome_size, next_start)
    text_len = jnp.where(crosses, end_off - loc_c - 1, want)
    data_ok = text_len >= read_len - MAX_K

    ar = jnp.arange(read_len + MAX_K, dtype=jnp.int32)

    # forward: read tail vs genome from loc+tail
    gi = jnp.clip(loc_c[:, None] + tail[:, None] + ar[None, :], 0, genome_size - 1)
    fwd_text = genome_codes[gi]
    fwd_tlen = jnp.maximum(text_len - tail, 0)
    arp = jnp.arange(read_len, dtype=jnp.int32)
    ridx = jnp.clip(tail[:, None] + arp[None, :], 0, read_len - 1)
    fwd_pat = read_both[u_read, u_dir][jnp.arange(C)[:, None], ridx]
    fwd_qual = qual_both[u_read, u_dir][jnp.arange(C)[:, None], ridx]
    fwd_plen = read_len - tail

    kvec = jnp.where(u_live & data_ok, e_max, 0).astype(jnp.int32)
    r1 = lv_distance(fwd_pat, fwd_plen, fwd_text, fwd_tlen, kvec,
                     fwd_qual, e_max=e_max)

    # backward: reversed head vs reversed genome before loc+so
    bidx = jnp.clip(so[:, None] - 1 - arp[None, :], 0, read_len - 1)
    bwd_pat = read_both[u_read, u_dir][jnp.arange(C)[:, None], bidx]
    bwd_qual = qual_both[u_read, u_dir][jnp.arange(C)[:, None], bidx]
    gbi = jnp.clip(loc_c[:, None] + so[:, None] - 1 - ar[None, :], 0, genome_size - 1)
    bwd_text = genome_codes[gbi]
    bwd_tlen = jnp.minimum(so + MAX_K, loc_c + so)
    r2 = lv_distance(bwd_pat, so, bwd_text, bwd_tlen, kvec,
                     bwd_qual, e_max=e_max)

    scored_ok = u_live & data_ok & (r1.distance >= 0) & (r2.distance >= 0) \
        & (r1.distance + r2.distance <= e_max)
    score = jnp.where(scored_ok, r1.distance + r2.distance, BIG)
    logp = jnp.where(scored_ok,
                     r1.log_prob + r2.log_prob + seed_len * LOG_ONE_MINUS_SNP,
                     NEG_INF)
    loc_adj = jnp.where(scored_ok, loc_c + r2.net_indel, loc_c)

    # ---------------- PHASE B: replay ------------------------------------
    # round at which the sequential engine would stop (score-limit pruning)
    round_of = jnp.clip(u_round, 0, S - 1)
    best_by_round = jax.ops.segment_min(
        jnp.where(scored_ok, score, BIG),
        u_read * S + round_of, num_segments=B * S).reshape(B, S)
    best_upto = jax.lax.cummin(best_by_round, axis=1)
    limit_r = jnp.minimum(best_upto, maxK) + extra
    stop_r = jnp.minimum(lp_after[:, :, 0], lp_after[:, :, 1]) > limit_r  # (B,S)
    # R* = first stopping round (inclusive: candidates from that round exist)
    r_star = jnp.where(stop_r.any(axis=1),
                       jnp.argmax(stop_r, axis=1).astype(jnp.int32),
                       jnp.int32(S - 1))

    in_play = scored_ok & (u_round <= r_star[u_read])
    score_f = jnp.where(in_play, score, BIG)

    # winner per read: (score asc, prob desc, order asc)
    wperm = jnp.lexsort((u_order, -logp, score_f, u_read))
    wread = u_read[wperm]
    first_of_read = jnp.concatenate([jnp.ones(1, bool), wread[1:] != wread[:-1]])
    # scatter winners back per read (reads with no candidates keep slot 0 and
    # are masked by has_best below)
    winner_slot = jnp.zeros(B, jnp.int32).at[wread].max(
        jnp.where(first_of_read, wperm, 0), mode="drop")
    has_best = jax.ops.segment_min(score_f, u_read, num_segments=B) < BIG
    best_score = score_f[winner_slot]
    best_loc = loc_adj[winner_slot]
    best_dir = u_dir[winner_slot]
    best_logp = logp[winner_slot]

    final_limit = jnp.minimum(jnp.minimum(best_score, maxK) + extra, e_max)
    in_prob = in_play & (score <= final_limit[u_read]) & (u_lp <= final_limit[u_read])

    # clusters: chain candidates (sorted by read,dir,loc) with gap <= 48 on
    # the ADJUSTED location (merge logic, BaseAligner.cpp:1296-1331)
    gap_new = jnp.concatenate([jnp.ones(1, bool),
                               (u_read[1:] != u_read[:-1]) |
                               (u_dir[1:] != u_dir[:-1]) |
                               (loc_adj[1:] - loc_adj[:-1] > MAX_MERGE_DIST)])
    clus_id = _segment_ids(gap_new)
    # cluster best by (score, prob): order-insensitive approximation
    clus_key = jnp.where(in_prob,
                         score.astype(jnp.float32) * 1e6 - jnp.clip(logp, -1e5, 0),
                         jnp.float32(3e12))
    clus_min = jax.ops.segment_min(clus_key, clus_id, num_segments=C)
    is_clus_best = in_prob & (clus_key <= clus_min[clus_id])
    # dedup exact ties within a cluster: keep the first
    cum_best = jnp.cumsum(is_clus_best.astype(jnp.int32))
    first_best_rank = jax.ops.segment_min(
        jnp.where(is_clus_best, cum_best, BIG), clus_id, num_segments=C)
    is_clus_best = is_clus_best & (cum_best == first_best_rank[clus_id])

    # probabilityOfAllCandidates = sum of cluster-best probabilities
    clus_logp = jnp.where(is_clus_best, logp, NEG_INF)
    read_max = jax.ops.segment_max(clus_logp, u_read, num_segments=B)
    read_max_s = jnp.maximum(read_max, -1e29)
    psum = jax.ops.segment_sum(
        jnp.where(is_clus_best, jnp.exp(clus_logp - read_max_s[u_read]), 0.0),
        u_read, num_segments=B)
    log_pall = jnp.where(psum > 0, jnp.log(psum) + read_max_s, NEG_INF)

    # "others" mass for the ==70 exactness test
    not_best_slot = is_clus_best & (jnp.arange(C) != winner_slot[u_read])
    psum_o = jax.ops.segment_sum(
        jnp.where(not_best_slot, jnp.exp(jnp.where(not_best_slot, logp, NEG_INF)
                                         - read_max_s[u_read]), 0.0),
        u_read, num_segments=B)
    log_pother = jnp.where(psum_o > 0, jnp.log(psum_o) + read_max_s, NEG_INF)

    popular_n = (popular & active_pos[:, :, None]
                 & (jnp.arange(S)[None, :, None] <= r_star[:, None, None])).sum(axis=(1, 2))

    mapq = _compute_mapq(log_pall, best_logp, log_pother, best_score, popular_n)

    # Final verdict (BaseAligner.cpp:1087-1103): best <= maxK -> Single/Multi
    # by MAPQ; otherwise NotFound, or MultipleHits when every seed was
    # popularity-skipped; too many Ns -> NotFound up front (cpp:652).
    applied_any = applied_act.any(axis=(1, 2))
    aligned = has_best & (best_score <= maxK)
    result = jnp.where(
        aligned,
        jnp.where(mapq >= MAPQ_LIMIT_FOR_SINGLE_HIT, SINGLE_HIT, MULTIPLE_HITS),
        jnp.where(applied_any, NOT_FOUND, MULTIPLE_HITS))
    result = jnp.where(n_count > maxK, NOT_FOUND, result)
    ok = aligned & (n_count <= maxK)
    out_loc = jnp.where(ok, best_loc, jnp.int32(-1))
    mapq = jnp.where(ok, mapq, 0)

    out = dict(result=result, loc=out_loc, direction=best_dir,
               score=jnp.where(has_best, best_score, -1),
               mapq=mapq, log_pbest=best_logp, log_pall=log_pall,
               popular=popular_n, truncated=n_truncated,
               n_lookups=found.sum())

    if cfg.max_hits_to_get > 0:
        out.update(_multi_hits(u_read, loc_adj, u_dir, score, u_order,
                               in_play, B, C, cfg.max_hits_to_get, e_max))
    return out


def _compute_mapq(log_pall, log_pbest, log_pother, score, popular):
    """computeMAPQ (mapq.h:32-65) in log space.

    The reference's double-equality test `pAll == pBest` becomes
    "other mass < 2^-53 of best" — below double ulp, the sum would not have
    changed the 64-bit float.
    """
    exact = log_pother - log_pbest < -36.7368  # log(2^-53)
    special70 = exact & (popular == 0) & (score < 5)

    r = jnp.exp(jnp.minimum(log_pother - log_pbest, 50.0))
    frac = r / (1.0 + r)                      # = 1 - pBest/pAll
    base = jnp.where(frac <= 0, 69,
                     jnp.minimum(69, (-10.0 * jnp.log10(jnp.maximum(frac, 1e-30)))
                                 .astype(jnp.int32)))
    base = jnp.maximum(0, base - jnp.maximum(0, popular - 10) // 2)
    return jnp.where(special70, 70, base).astype(jnp.int32)


def _multi_hits(u_read, loc_adj, u_dir, score, u_order, in_play, B, C,
                max_get, e_max):
    """fillHitsFound analog (BaseAligner.cpp:940-975): up to max_get hits,
    scores within [firstDist, firstDist+4)."""
    score_m = jnp.where(in_play, score, BIG)
    perm = jnp.lexsort((u_order, score_m, u_read))
    r_ = u_read[perm]
    s_ = score_m[perm]
    l_ = loc_adj[perm]
    d_ = u_dir[perm]
    first_score = jax.ops.segment_min(s_, r_, num_segments=B)
    okh = (s_ < BIG) & (s_ < first_score[r_] + 4) & (s_ <= e_max)
    rank = jnp.cumsum(okh.astype(jnp.int32)) - 1
    base_rank = jax.ops.segment_min(jnp.where(okh, rank, BIG), r_, num_segments=B)
    rr = rank - base_rank[r_]
    keep = okh & (rr < max_get)
    # out-of-bounds targets for non-kept entries are dropped by the scatter
    tgt_r = jnp.where(keep, r_, B)
    tgt_c = jnp.where(keep, rr, 0)
    mh_loc = jnp.full((B, max_get), INVALID_GENOME_LOCATION, jnp.uint32)
    mh_dir = jnp.zeros((B, max_get), jnp.int32)
    mh_score = jnp.full((B, max_get), -1, jnp.int32)
    mh_loc = mh_loc.at[tgt_r, tgt_c].set(l_.astype(jnp.uint32), mode="drop")
    mh_dir = mh_dir.at[tgt_r, tgt_c].set(d_, mode="drop")
    mh_score = mh_score.at[tgt_r, tgt_c].set(s_, mode="drop")
    mh_n = jax.ops.segment_sum(keep.astype(jnp.int32), r_, num_segments=B)
    return dict(mh_loc=mh_loc, mh_dir=mh_dir, mh_score=mh_score, mh_n=mh_n)


class SingleAligner:
    """Host-facing wrapper: owns device copies of the index and jits the
    batched engine per (read length, config)."""

    def __init__(self, index: GenomeIndex, config: SingleAlignerConfig | None = None,
                 **overrides):
        self.index = index
        cfg = config or SingleAlignerConfig(seed_len=index.seed_len)
        if overrides:
            cfg = SingleAlignerConfig(**{**cfg.__dict__, **overrides})
        self.cfg = cfg
        arrs = index.device_arrays()
        self._dev = {k: jnp.asarray(v) for k, v in arrs.items()
                     if k != "genome_size"}
        self._dev["piece_starts"] = jnp.asarray(
            index.genome.piece_offsets.astype(np.int32))
        self.genome_size = int(arrs["genome_size"])

    def align_batch(self, reads: np.ndarray, quals: np.ndarray) -> dict:
        """reads: (B, L) uint8 base codes (uniform length); quals ASCII."""
        B, L = reads.shape
        positions, wraps = seed_position_schedule(L, self.index.seed_len)
        S = min(self.cfg.max_seed_slots, len(positions))
        out = _align_batch(
            jnp.asarray(reads), jnp.asarray(quals),
            self._dev["ht_keys"], self._dev["ht_val1"], self._dev["ht_val2"],
            self._dev["shard_start"], self._dev["shard_size"],
            self._dev["overflow"], self._dev["genome_codes"],
            self._dev["piece_starts"],
            jnp.asarray(positions[:S]), jnp.asarray(wraps[:S]),
            cfg=self.cfg, seed_len=self.index.seed_len, read_len=L,
            genome_size=self.genome_size)
        return {k: np.asarray(v) for k, v in out.items()}
