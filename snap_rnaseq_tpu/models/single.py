"""Batched single-end aligner: the TPU-native BaseAligner.

Reference: SNAPLib/BaseAligner.{h,cpp}.  The reference engine is a sequential
per-read loop: look up seeds one at a time, insert candidates into 48-wide
weight-list elements, score the highest-weight element with two LV calls,
stop early when no unseen location can win (BaseAligner.cpp:510-1399).

TPU redesign — phases over a batch of reads, each a pure shape-static
function so the multi-chip path (parallel/sharded.py) can recompose them
around collectives:

  seed_phase      pack + hash-probe ALL scheduled seeds at once
  budget_phase    the reference's seed budget / popularity / lowest-possible
                  -score bookkeeping, from (possibly psum-ed) global counts
  expand_phase    every hit -> flat candidate slot (cumsum + searchsorted;
                  no ragged shapes)
  aggregate_phase candidates -> unique candidates + 48-wide element stats
                  via one lexsort + segment reductions
  score_phase     two batched LV kernel calls per candidate (forward tail +
                  reversed head, the split of BaseAligner.cpp:1196-1238)
  replay_phase    vectorized replay of the sequential engine's early-exit /
                  score-limit / merge logic; winner pick + MAPQ

Known deviations from the reference (documented, revisited in later rounds):
  * probabilityOfAllCandidates uses the FINAL score limit for membership,
    not the evolving limit;
  * candidates that join an element after the element was scored are still
    scored here (the reference never rescores such elements);
  * intra-round element ordering is approximated by (weight desc, last-hit
    order asc) rather than the live weight-list FIFO.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (DEFAULT_EXTRA_SEARCH_DEPTH, INVALID_GENOME_LOCATION,
                         MAX_K, MAX_MERGE_DIST, MAPQ_LIMIT_FOR_SINGLE_HIT,
                         SINGLE_DEFAULTS, SNP_PROB)
from ..index.hash_index import GenomeIndex
from ..ops import lookup as lk
from ..ops.genome_gather import gather_windows, pack_genome_4bit
from ..ops.lv import NEG_INF, PHRED_LOG_PROB, lv_distance
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
    # exact cond-fallback: re-expand at 4x when the narrow candidate tier
    # truncates (repeat-dense batches); False = fixed narrow width
    overflow_tier: bool = False
    max_seed_slots: int = 48                            # schedule positions looked up
    max_hits_to_get: int = 0                            # multi-hit output size
    seed_coverage: float = 0.0      # -sc: num_seeds = cov*readLen/seedLen
    explore_popular: bool = False   # -x: use (capped) hits of popular seeds
    stop_on_first: bool = False     # -f: filtering mode, any hit -> SingleHit
    # candidates surviving the bit-parallel whole-read prefilter that get
    # full LV scoring, per read (average, pooled across the batch); 0
    # disables the prefilter/compaction and scores every candidate slot
    score_budget_per_read: int = 16
    # unique candidates kept after aggregation (live-first compaction, per
    # read pooled); expansion slots are mostly duplicate hits of the same
    # location, so downstream phases shrink ~CPR/this; 0 disables
    compact_per_read: int = 32
    # seed-budget accounting: the single-end BaseAligner counts each applied
    # (seed, direction) separately against num_seeds
    # (BaseAligner.cpp:336 `nSeedsApplied[FORWARD]+nSeedsApplied[RC] <
    # maxSeedsToUse`, :494), while the paired IntersectingPairedEndAligner
    # counts ONE hash-table lookup per seed position
    # (IntersectingPairedEndAligner.cpp:266).  True = the paired semantics.
    seed_budget_per_position: bool = False

    @property
    def e_max(self) -> int:
        return min(MAX_K, self.max_k + self.extra_search_depth)

    def resolve_for_read_len(self, read_len: int) -> "SingleAlignerConfig":
        """-sc: seed budget proportional to read length
        (BaseAligner.cpp maxSeedCoverage path)."""
        if self.seed_coverage <= 0:
            return self
        n = max(1, int(self.seed_coverage * read_len / self.seed_len))
        return SingleAlignerConfig(**{**self.__dict__,
                                      "num_seeds": n, "seed_coverage": 0.0})


def _segment_ids(boundary: jnp.ndarray) -> jnp.ndarray:
    return jnp.cumsum(boundary.astype(jnp.int32)) - 1


def row_select(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis(table, idx, axis=1) for a SMALL per-row table.

    table: (B, G) with G small (seed groups, ~64); idx: (B, W).  The
    one-hot compare + masked sum is exact (exactly one term per output)
    and fuses into one VPU reduction, while XLA's generic gather lowering
    costs ~8 ns/element on TPU (~2.2 ms per (2048, 128) gather in the
    round-4 device profile)."""
    G = table.shape[1]
    onehot = idx[:, :, None] == jnp.arange(G, dtype=idx.dtype)[None, None, :]
    return jnp.where(onehot, table[:, None, :], 0).sum(
        axis=2, dtype=table.dtype)


def _loc_ord(x: jnp.ndarray) -> jnp.ndarray:
    """Monotone uint32 -> int32 order map (sign-bit flip).

    BIG-GENOME MODE: genomes past 2^31 bases (hg19 with padding is
    ~3.2e9; the reference supports the full 2^32 space,
    GenomeIndex.cpp:371-375) store locations as int32-WRAPPED uint32 bit
    patterns.  Arithmetic differences stay correct modulo 2^32, but
    ORDER comparisons need this map (or uint32 casts)."""
    return (x.astype(jnp.uint32) ^ jnp.uint32(0x80000000)).astype(jnp.int32)


def big_locations(genome_size: int) -> bool:
    """Static: does this genome need uint32 (not int31) location order?"""
    return genome_size > (1 << 31) - (1 << 26)


def piece_index_of(piece_starts: jnp.ndarray, loc: jnp.ndarray,
                   big: bool = False) -> jnp.ndarray:
    """searchsorted(piece_starts, loc, 'right') - 1, clipped — as one
    broadcast compare-and-sum.  The piece table is tiny (#chromosomes), so
    the O(C * n_pieces) compare beats jnp.searchsorted's while-loop binary
    search lowering by ~10x on TPU (round-4 device profile)."""
    n = piece_starts.shape[0]
    ps, lq = (piece_starts, loc) if not big else \
        (_loc_ord(piece_starts), _loc_ord(loc))
    idx = (ps[None, :] <= lq[:, None]).sum(
        axis=1, dtype=jnp.int32) - 1
    return jnp.clip(idx, 0, n - 1)


# ----------------------------------------------------------------------
# phases
# ----------------------------------------------------------------------

def seed_phase(reads, schedule, seed_len, ht_entries,
               shard_start, shard_size, overflow, genome_size,
               sched_static=None, cuckoo=None,
               select_first_valid: int = 0):
    """Pack + look up every scheduled seed.  Local to an index shard: seeds
    whose table lives elsewhere simply come back not-found (size 0).

    sched_static: the schedule as a static tuple (positions are a per-read-
    length constant), letting pack_seeds use static slices.

    cuckoo: optional dict(ck_buckets, ck_stash) — the loop-free lookup
    layout (index/hash_index.py build_cuckoo_layout); when present, the
    probe-chain table is bypassed entirely.

    select_first_valid=N: look up only each read's first N VALID schedule
    positions.  Exact for the paired budget semantics
    (seed_budget_per_position: IntersectingPairedEndAligner.cpp:266 counts
    one lookup per position, hit or miss), where budget_phase's active set
    is precisely the first num_seeds valid positions — so positions beyond
    them can never contribute candidates, and skipping their (expensive)
    table lookups changes nothing.  Packing stays full-schedule (static
    slices, pure VPU — cheap); only the gather-heavy lookup shrinks.
    Returns the selected position indices as out["sel_pos"] so the caller
    can build per-read schedule/wraps tables."""
    packed = lk.pack_seeds(
        reads, sched_static if sched_static is not None else schedule,
        seed_len)
    sel_pos = None
    if select_first_valid:
        S8 = select_first_valid
        valid_all = packed["valid"]
        v = valid_all.astype(jnp.int32)
        rank = jnp.cumsum(v, axis=1) - v
        match = valid_all[:, None, :] & (
            rank[:, None, :] == jnp.arange(S8, dtype=jnp.int32)[None, :, None])
        sel_pos = jnp.argmax(match, axis=2).astype(jnp.int32)   # (B, S8)
        sel_ok = match.any(axis=2)
        take = lambda x: jnp.take_along_axis(x, sel_pos, axis=1)
        packed = dict(lo_f=take(packed["lo_f"]), hi_f=take(packed["hi_f"]),
                      lo_r=take(packed["lo_r"]), hi_r=take(packed["hi_r"]),
                      valid=sel_ok, n_hi_bits=packed["n_hi_bits"])
    if cuckoo is not None:
        found, fwd_val, rc_val = lk.lookup_seeds_cuckoo(
            packed, cuckoo["ck_buckets"], cuckoo["ck_buckets2"],
            cuckoo["ck_stash"])
    else:
        found, fwd_val, rc_val = lk.lookup_seeds(
            packed, ht_entries, shard_start, shard_size)
    cnt_f, base_f = lk.expand_counts(fwd_val, overflow, genome_size)
    cnt_r, base_r = lk.expand_counts(rc_val, overflow, genome_size)
    out = dict(
        valid=packed["valid"],
        found=found,
        counts=jnp.stack([cnt_f, cnt_r], axis=2),     # (B,S,2)
        bases=jnp.stack([base_f, base_r], axis=2),
        vals=jnp.stack([fwd_val, rc_val], axis=2),
    )
    if sel_pos is not None:
        out["sel_pos"] = sel_pos
    return out


def budget_phase(valid, counts_global, wraps, cfg: SingleAlignerConfig):
    """Seed budget, popularity skip, and lowest-possible-score tables from
    GLOBAL per-seed hit counts (psum over index shards in the sharded path).

    Mirrors BaseAligner.cpp:686-914 (budget loop + popular skip) and
    :1053-1061 (lowestPossibleScoreOfAnyUnseenLocation).
    """
    B, S = valid.shape
    popular = (counts_global > cfg.max_hits) & valid[:, :, None]
    if cfg.explore_popular:
        # -x: popular seeds still contribute (their hits capped in
        # expand_phase), matching explorePopularSeeds (BaseAligner.cpp:794-800)
        applied = valid[:, :, None] & (counts_global > 0)
    else:
        applied = valid[:, :, None] & ~popular              # (B,S,2)
    if cfg.seed_budget_per_position:
        # paired semantics: every VALID seed position consumes one unit of
        # the budget — hit or miss, popular or not
        # (IntersectingPairedEndAligner.cpp:266, :313)
        lookups = valid.astype(jnp.int32)
        cum_before = jnp.cumsum(lookups, axis=1) - lookups
        active_pos = (cum_before < cfg.num_seeds) & valid
    else:
        applied_per_pos = applied.sum(axis=2)
        cum_before = jnp.cumsum(applied_per_pos, axis=1) - applied_per_pos
        active_pos = cum_before < cfg.num_seeds
    applied_act = applied & active_pos[:, :, None]
    n_applied_after = jnp.cumsum(applied_act.astype(jnp.int32), axis=1)
    # wraps may be per-read (B, S) when the caller pre-selected active
    # positions (seed_phase select_first_valid), or shared (S,)
    most = ((wraps + 1).astype(jnp.int32)[:, :, None] if wraps.ndim == 2
            else (wraps + 1).astype(jnp.int32)[None, :, None])
    lp_after = jax.lax.cummax(n_applied_after // most, axis=1)
    lp_pre = jnp.concatenate(
        [jnp.zeros((B, 1, 2), jnp.int32), lp_after[:, :-1, :]], axis=1)
    return dict(popular=popular, applied_act=applied_act,
                active_pos=active_pos, lp_after=lp_after, lp_pre=lp_pre)


def expand_phase(seeds, budget, schedule, overflow, cfg, seed_len, read_len,
                 cand_slots, big: bool = False):
    """Hits -> flat candidate slots: (loc, dir, order, seedOffset, round,
    lowest-possible bound).  The counts here are LOCAL (this shard's hits);
    the masks are GLOBAL."""
    counts, bases, vals = seeds["counts"], seeds["bases"], seeds["vals"]
    B, S, _ = counts.shape
    CPR = cand_slots

    used = jnp.where(budget["applied_act"] & seeds["found"][:, :, None],
                     counts, 0)
    if cfg.explore_popular:
        used = jnp.minimum(used, cfg.max_hits)
    used2 = used.reshape(B, S * 2)
    # RARE-SEED-FIRST slot filling: each read's candidate budget is filled
    # from its least-popular (seed, dir) groups upward, so when the budget
    # truncates (repeat floods: a satellite read can carry 10^3..10^5 raw
    # hits under the paired 16000-hit cutoff) the dropped candidates are
    # exactly the flood-seed tails — the ones the reference scores LAST and
    # mostly skips via its evolving score limit
    # (IntersectingPairedEndAligner.cpp:514-741 best-possible-score order +
    # early termination).  With no truncation the candidate SET is
    # unchanged, and downstream grouping is order-invariant (aggregate
    # re-sorts by (dir, loc)), so results are bit-identical.
    gi = jnp.broadcast_to(jnp.arange(S * 2, dtype=jnp.int32)[None, :],
                          (B, S * 2))
    used_sorted, perm = jax.lax.sort((used2, gi), dimension=1, num_keys=1,
                                     is_stable=True)
    cum = jnp.cumsum(used_sorted, axis=1)
    total = cum[:, -1]
    slots = jnp.arange(CPR, dtype=jnp.int32)
    # searchsorted(cum, slots, 'right') == #{j: cum[j] <= slot}; the
    # broadcast compare-and-sum is one VPU reduction over 64 groups, while
    # vmapped searchsorted lowers to a 7-iteration while loop that cost
    # 7.6 ms/batch/end on v5e (top-3 op in the round-4 device profile)
    spos = (cum[:, :, None] <= slots[None, None, :]).sum(
        axis=1, dtype=jnp.int32)
    spos = jnp.minimum(spos, S * 2 - 1).astype(jnp.int32)
    group = row_select(perm, spos)                    # original group ids
    cand_live = slots[None, :] < jnp.minimum(total, CPR)[:, None]
    n_truncated = jnp.maximum(total - CPR, 0)

    prev_cum = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), cum[:, :-1]], axis=1)
    within = slots[None, :] - row_select(prev_cum, spos)

    s_idx = group // 2
    dir_idx = group % 2
    g_base = row_select(bases.reshape(B, S * 2), group)
    g_val = row_select(vals.reshape(B, S * 2), group)
    hit = lk.gather_hit(within, None, g_base, g_val, overflow)

    # schedule may be per-read (B, S) when seed_phase pre-selected active
    # positions; row_select beats a tiny-table gather on TPU either way
    pos_at = (row_select(schedule, s_idx) if schedule.ndim == 2
              else schedule[s_idx])
    offset = jnp.where(dir_idx == 0, pos_at, read_len - seed_len - pos_at)
    cand_loc = (hit - offset.astype(jnp.uint32)).astype(jnp.int32)
    cand_live = cand_live & (hit >= offset.astype(jnp.uint32))
    order = (group << 16) | jnp.minimum(within, 0xFFFF)
    lp_at = row_select(budget["lp_pre"].reshape(B, S * 2), group)

    read_id = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, CPR))
    # dead-slot location sentinel: BIG for int31 genomes; big-genome mode
    # uses 0xFFFFFFF0 (beyond any supported genome) so it can never
    # collide with a real location and absorb a live candidate's group
    # representative in the (dir, loc) aggregate
    dead = jnp.int32(-16) if big else BIG
    return dict(read=read_id, dir=dir_idx,
                loc=jnp.where(cand_live, cand_loc, dead),
                order=order, offset=offset,
                round=s_idx, lp=lp_at,
                live=cand_live, truncated=n_truncated)


def _aggregate_rows(c, big: bool = False):
    """Rowwise core of aggregate_phase: returns (rows, W) arrays."""
    # Pack the sort down to one u32 key + three payloads: every operand
    # rides through ~log^2(W) comparator stages, so fewer/narrower
    # operands are a direct win.  Key = dir<<31 | loc reproduces the
    # (dir, loc) lexicographic order exactly (loc < 2^31 for single-chip
    # genomes; dead rows carry loc=BIG and sort to each dir group's
    # tail, as before).  read is constant per row — recomputed, not
    # sorted.  (order, live) and (round, offset) share lanes: order
    # uses 22 bits (group<<16|within), round < 64, offset < 1024.
    #
    # BIG-GENOME MODE (hg scale: locations need all 32 bits,
    # GenomeIndex.cpp:371-375): dir no longer fits in the key word, so
    # the sort runs num_keys=2 on (dir, loc-as-u32) — same grouping, one
    # extra comparator operand; only genomes past 2^31 pay it.
    from ..ops.rowscan import seg_broadcast
    rows, W = c["dir"].shape
    p_ord = c["order"] | (c["live"].astype(jnp.int32) << 30)
    # one payload word for (lp, round, offset): lp < 64 (seed-budget
    # bound), round < 64, offset < 1024 — every dropped sort operand
    # skips ~log^2(W) comparator stages
    p_ro = (c["lp"] << 16) | (c["round"] << 10) | c["offset"]
    if big:
        d_, l_u, p_ord, p_ro = jax.lax.sort(
            (c["dir"], c["loc"].astype(jnp.uint32), p_ord, p_ro),
            dimension=1, num_keys=2, is_stable=False)
        l_ = l_u.astype(jnp.int32)
    else:
        ukey = (c["dir"].astype(jnp.uint32) << 31) | \
            c["loc"].astype(jnp.uint32)
        ukey, p_ord, p_ro = jax.lax.sort(
            (ukey, p_ord, p_ro), dimension=1, num_keys=1,
            is_stable=False)
        d_ = (ukey >> 31).astype(jnp.int32)
        l_u = ukey & jnp.uint32(0x7FFFFFFF)
        l_ = l_u.astype(jnp.int32)
    o_ = p_ord & jnp.int32(0x3FFFFFFF)
    live_ = (p_ord >> 30) > 0
    lp_ = p_ro >> 16
    rd_ = (p_ro >> 10) & jnp.int32(0x3F)
    off_ = p_ro & jnp.int32(0x3FF)

    col0 = jnp.zeros((rows, W), bool).at[:, 0].set(True)
    # 48-bucket ids in uint32 so big-genome locations bucket correctly
    elem_loc = l_u - l_u % jnp.uint32(MAX_MERGE_DIST)
    diff_d = col0 | (d_ != jnp.pad(d_, ((0, 0), (1, 0)))[:, :-1])
    elem_b = diff_d | (elem_loc != jnp.pad(elem_loc,
                                           ((0, 0), (1, 0)))[:, :-1])
    cand_b = diff_d | (l_ != jnp.pad(l_, ((0, 0), (1, 0)))[:, :-1])

    elem_weight = jnp.minimum(
        seg_broadcast(live_.astype(jnp.int32), elem_b, jnp.add, 0), 63)
    elem_lp = seg_broadcast(jnp.where(live_, lp_, BIG), elem_b,
                            jnp.minimum, BIG)
    cand_first_order = seg_broadcast(jnp.where(live_, o_, BIG), cand_b,
                                     jnp.minimum, BIG)
    # first_round needs no scan of its own: within a candidate group the
    # dir (group-id parity) is fixed, so min(order) and min(round) land on
    # the same element and round = group >> 1 = order >> 17
    cand_first_round = jnp.where(cand_first_order < BIG,
                                 cand_first_order >> 17, BIG)
    # seedOffset of the LAST hit on this exact location (the reference
    # overwrites candidate->seedOffset per hit, BaseAligner.cpp:858-861).
    # Packed max runs in uint32 with a +1 bias: (o_ << 10) overflows int32
    # once the group id reaches 32 (seed index 16 — reachable at the
    # single-end default of 25 seeds), which flipped the max's sign.
    cand_last = seg_broadcast(
        jnp.where(live_, ((o_.astype(jnp.uint32) << 10)
                          | off_.astype(jnp.uint32)) + 1, 0),
        cand_b, jnp.maximum, jnp.uint32(0))
    off_out = jnp.where(cand_last > 0,
                        ((cand_last - 1) & jnp.uint32(0x3FF)).astype(jnp.int32),
                        0)

    return dict(
        dir=d_, loc=l_,
        off=off_out,
        order=cand_first_order,
        round=cand_first_round,
        weight=elem_weight,
        lp=elem_lp,
        live=cand_b & live_,          # one representative per unique candidate
    )


def aggregate_phase(c):
    """Sort candidates by (read, dir, loc) and reduce into unique candidates
    + element stats (weight, creation bound, last order; element = 48-wide
    bucket, BaseAligner.h:196-226).

    The candidate arrays arrive as (rows, width) with one READ per row
    (expand_phase's natural shape), so the sort is a cheap ROWWISE 2-key
    (dir, loc) lax.sort instead of a global 3-key lexsort — same grouping,
    ~W log^2 W vs C log^2 C comparator stages.  All downstream segment
    reductions are order-invariant within a (read, dir, loc) group, so the
    within-group order key the global sort had is unnecessary.

    The segment reductions stay ROWWISE too (ops/rowscan.py): segments
    never cross rows, so each one is log2(W) lane-shift steps instead of a
    C-element scatter + gather-back (jax.ops.segment_*) — the flat version
    was the engine's biggest non-gather cost block (PERF.md round 4).

    This wrapper flattens for the legacy flat back half (trace tool, unit
    tests); the engines use _aggregate_rows + the rowwise back half."""
    u2 = _aggregate_rows(c)
    rows, W = u2["dir"].shape
    r_ = jnp.broadcast_to(jnp.arange(rows, dtype=jnp.int32)[:, None],
                          (rows, W))
    flat = lambda x: x.reshape(rows * W)
    out = {k: flat(v) for k, v in u2.items()}
    out["read"] = flat(r_)
    return out


def score_phase(u, reads, quals, genome_p4, piece_starts, cfg, seed_len,
                read_len, genome_size, band: int | None = None,
                window: jnp.ndarray | None = None,
                qlp_both: jnp.ndarray | None = None):
    """Two batched LV calls per unique candidate; log-space probabilities.

    Matches the scoring block of BaseAligner.cpp:1150-1260 including the
    piece-boundary text clipping and the (1-SNP_PROB)^seedLen seed factor.

    `band` narrows the LV diagonal band below cfg.e_max when the caller has
    proven every candidate's distance fits (filtered_score_phase buckets by
    whole-read distance); DP values within a sufficient band are
    band-independent, so results are identical — just cheaper.
    """
    e_max = cfg.e_max if band is None else band
    gate = cfg.e_max
    # window margin: an alignment within the e_max band never reads text
    # beyond e_max bases outside the read span, so the gathered window
    # carries cfg.e_max margin (not the kernel-max MAX_K) — 15-20% less
    # gather/copy traffic at the default operating point, bit-identical
    M = cfg.e_max
    C = u["read"].shape[0]
    rc_reads = COMP_LUT[reads[:, ::-1].astype(jnp.int32)]
    read_both = jnp.stack([reads, rc_reads], axis=1)
    if qlp_both is None:
        # (B, 2, P) u8 quality rows; the LV backend gathers the phred
        # table itself.  Callers that score repeatedly (filtered tiers)
        # pass qlp_both — the pre-gathered f32 log-prob rows — instead.
        qual_both = jnp.stack([quals, quals[:, ::-1]], axis=1)
    else:
        qual_both = qlp_both

    so = jnp.where(u["live"], u["off"], 0)
    tail = so + seed_len
    loc_c = jnp.where(u["live"], u["loc"], 0)
    big = big_locations(genome_size)

    pidx = piece_index_of(piece_starts, loc_c, big=big)
    next_start = jnp.where(
        pidx + 1 < piece_starts.shape[0],
        piece_starts[jnp.minimum(pidx + 1, piece_starts.shape[0] - 1)],
        jnp.int32(np.uint32(genome_size).astype(np.int32)))
    want = read_len + M
    # uint32 arithmetic: exact for int31 genomes too, correct past 2^31
    lu = loc_c.astype(jnp.uint32)
    ns_u = next_start.astype(jnp.uint32)
    gs_u = jnp.uint32(genome_size)
    crosses = lu + want > jnp.minimum(ns_u, gs_u)
    end_off = jnp.where(lu + want >= gs_u, gs_u, ns_u)
    text_len = jnp.where(crosses, (end_off - lu).astype(jnp.int32) - 1,
                         want)
    data_ok = text_len >= read_len - M

    # FREE-PREFIX formulation: both LV calls run on the FULL read row with
    # the pre-seed (head) / post-seed (tail) prefix marked free, so no
    # per-candidate pattern/quality gathers are needed, and both text
    # windows are slices of ONE shared genome window
    # [loc - MAX_K, loc + read_len + MAX_K).  Equivalent to the suffix
    # formulation: the free prefix shifts every DP value by the prefix
    # length and contributes no probability (ops/lv.py `free`).
    sel = read_both[u["read"], u["dir"]]
    selq = qual_both[u["read"], u["dir"]]
    if window is None:
        window = gather_windows(genome_p4, loc_c - M,
                                width=read_len + 2 * M, big=big)
    fwd_text = window[:, M:]
    bwd_text = jnp.flip(window[:, :read_len + M], axis=1)
    plen_full = jnp.full((2 * C,), read_len, jnp.int32)
    kvec = jnp.where(u["live"] & data_ok, e_max, 0).astype(jnp.int32)

    # one fused kernel invocation for both directions (halves dispatch /
    # layout overhead): rows [0, C) = forward tail, rows [C, 2C) = reversed
    # head
    rsel = sel[:, ::-1]
    rselq = selq[:, ::-1]
    # genome-start guard in uint32 (big-genome locations wrap int32)
    bwd_tlen = (read_len - so) + jnp.minimum(
        (so + M).astype(jnp.uint32),
        lu + so.astype(jnp.uint32)).astype(jnp.int32)
    r = lv_distance(
        jnp.concatenate([sel, rsel], axis=0), plen_full,
        jnp.concatenate([fwd_text, bwd_text], axis=0),
        jnp.concatenate([text_len, bwd_tlen], axis=0),
        jnp.concatenate([kvec, kvec], axis=0),
        jnp.concatenate([selq, rselq], axis=0),
        free=jnp.concatenate([tail, read_len - so], axis=0),
        e_max=e_max)
    d1, d2 = r.distance[:C], r.distance[C:]
    lp1, lp2 = r.log_prob[:C], r.log_prob[C:]
    net2 = r.net_indel[C:]

    scored_ok = u["live"] & data_ok & (d1 >= 0) & (d2 >= 0) \
        & (d1 + d2 <= gate)
    score = jnp.where(scored_ok, d1 + d2, BIG)
    logp = jnp.where(scored_ok,
                     lp1 + lp2 + seed_len * LOG_ONE_MINUS_SNP,
                     NEG_INF)
    loc_adj = jnp.where(scored_ok, loc_c + net2, loc_c)
    return dict(score=score, logp=logp, loc_adj=loc_adj, scored_ok=scored_ok)


def stable_partition_indices(mask: jnp.ndarray, K: int) -> jnp.ndarray:
    """First K indices of a stable true-first partition — a cumsum +
    scatter instead of a sort (TPU sorts are bitonic and expensive)."""
    C = mask.shape[0]
    mask_i = mask.astype(jnp.int32)
    pos_true = jnp.cumsum(mask_i) - 1
    n_true = pos_true[-1] + 1
    pos_false = n_true + jnp.cumsum(1 - mask_i) - 1
    dest = jnp.where(mask, pos_true, pos_false)
    inv = jnp.zeros(C, jnp.int32).at[dest].set(
        jnp.arange(C, dtype=jnp.int32))
    return inv[:K]


def compact_phase(u, B, cfg):
    """Live-first stable compaction of the aggregated candidate array.

    After aggregate_phase only one slot per unique (read, dir, loc) is live;
    the rest are duplicate seed hits.  A stable partition preserves the
    (read, dir, loc) order of the live prefix, so the cluster-adjacency
    logic in replay_phase sees the same gaps; dropped live overflow beyond
    the pooled budget is counted like the reference's candidate-pool cap.
    """
    C = u["read"].shape[0]
    CB = min(B * cfg.compact_per_read, C)
    take = stable_partition_indices(u["live"], CB)
    out = {k: v[take] for k, v in u.items()}
    overflow = jnp.maximum(u["live"].sum() - CB, 0)
    return out, overflow


def filtered_score_phase(u, reads, quals, genome_p4, piece_starts, cfg,
                         seed_len, read_len, genome_size, B,
                         qlp_both: jnp.ndarray | None = None):
    """Two-stage scoring: bit-parallel whole-read distances for every
    candidate slot (ops/bitpar.py), then full LV + backtrace only on a
    compacted budget of survivors.

    Exactness: concatenating a candidate's LV head+tail alignments yields a
    whole-read alignment, so whole_dist > e_max implies head+tail scores
    would fail the <= e_max gate in score_phase anyway; dropped candidates
    land with score=BIG/scored_ok=False exactly as if scored.  Survivors
    beyond the static budget are counted in `score_overflow` (the analog of
    the reference's candidate-pool cap, IntersectingPairedEndAligner.h:33).
    """
    from ..ops.bitpar import bitpar_distance
    e_max = cfg.e_max
    C = u["read"].shape[0]
    big = big_locations(genome_size)
    live = u["live"]
    loc_c = jnp.where(live, u["loc"], 0)

    rc_reads = COMP_LUT[reads[:, ::-1].astype(jnp.int32)]
    read_both = jnp.stack([reads, rc_reads], axis=1)
    sel = read_both[u["read"], u["dir"]]                      # (C, L)

    # one shared window per candidate serves the prefilter AND both LV
    # text slices downstream (score_phase's free-prefix formulation);
    # margin = cfg.e_max (see score_phase's window-margin note)
    M = cfg.e_max
    W = read_len + 2 * M
    window = gather_windows(genome_p4, loc_c - M, width=W, big=big)
    want = read_len + e_max
    text = window[:, M:M + want]
    t_len = jnp.full((C,), want, jnp.int32)
    wdist = bitpar_distance(sel, text, t_len, P=read_len)

    # ---- anchored pure-substitution fast path -----------------------------
    # When the free-start whole-read distance equals the ANCHORED hamming
    # distance (read laid at exactly loc, no indels), both seed-split LV
    # calls must return the anchored pure-substitution path: any tail (or
    # head) alignment using an indel to score below its anchored hamming
    # count would concatenate with the other side's anchored alignment into
    # a whole-read path cheaper than wdist — contradiction.  Score and
    # probability then have closed forms (score = hamming; logp = sum of
    # phred log-probs at mismatch offsets + (P - ham) matches; the
    # free-prefix / seed-factor terms telescope to exactly that — see
    # _backtrace_prob), and net_indel = 0 so loc_adj = loc.  This removes
    # the large indel-free majority of survivors from the LV kernels (the
    # hot cost, PERF.md round-3).  Kill-switch: SNAP_TPU_FAST_SUB=0 —
    # consulted at FIRST TRACE only (like SNAP_TPU_LV_LANES): flipping it
    # after the engine has jit-compiled in-process has no effect.
    # Piece-boundary rows (clipped text) keep the LV path untouched.
    #
    # Accepted deviation (tested: test_fast_sub.py::test_equal_cost_
    # indel_substitution_tie): when ham == wdist but an equal-cost
    # indel path ALSO reaches wdist (e.g. 1 ins + 1 del elsewhere vs 2
    # substitutions), the LV backtrace may pick the indel path and report
    # a gap-probability logp where this closed form reports the
    # substitution logp.  score and loc_adj are provably identical (see
    # the contradiction argument above); only logp (hence MAPQ) can
    # differ, and only in such degenerate ties.  The reference has the
    # same ambiguity the other way around (LandauVishkin.h backtrace
    # order), so neither side is canonically "right".
    E0 = min(3, e_max)
    E1 = min(7, e_max)

    score = jnp.full((C,), BIG, jnp.int32)
    logp = jnp.full((C,), NEG_INF, jnp.float32)
    loc_adj = u["loc"]
    scored_ok = jnp.zeros((C,), bool)
    overflow = jnp.int32(0)

    # Phred-to-log-prob ONCE at read scale: gathering the 256-entry float
    # table per (candidate, base) was the single hottest op in the engine
    # (26.9 ms/batch/end for the f32[3.28M] elementwise table gather on
    # v5e — tiny-table gathers lower to per-element dynamic slices).  The
    # (B, 2, P) pre-gather serves the fast path's row gathers AND the LV
    # buckets (score_phase receives it as qlp_both, lv.py skips its own
    # table gather on f32 input) — arithmetic identical, ~1/10 the cost.
    # Callers that invoke this phase from inside lax.cond tiers pass a
    # hoisted qlp_both so the gather runs once per batch, not per branch.
    if qlp_both is None:
        from ..ops.lv import phred_log_prob_device
        qual_both = jnp.stack([quals, quals[:, ::-1]], axis=1)
        qlp_both = phred_log_prob_device(qual_both)

    fast = jnp.zeros((C,), bool)
    if os.environ.get("SNAP_TPU_FAST_SUB", "1") != "0":
        pidx = piece_index_of(piece_starts, loc_c, big=big)
        next_start = jnp.where(
            pidx + 1 < piece_starts.shape[0],
            piece_starts[jnp.minimum(pidx + 1, piece_starts.shape[0] - 1)],
            jnp.int32(np.uint32(genome_size).astype(np.int32)))
        crosses = (loc_c.astype(jnp.uint32) + (read_len + M)
                   > jnp.minimum(next_start.astype(jnp.uint32),
                                 jnp.uint32(genome_size)))
        text0 = window[:, M:M + read_len]
        mm = sel != text0
        ham = mm.sum(axis=1).astype(jnp.int32)
        fast = live & ~crosses & (wdist <= e_max) & (ham == wdist)
        qlp = qlp_both[u["read"], u["dir"]]
        logp_f = (jnp.where(mm, qlp, 0.0).sum(axis=1)
                  + (read_len - ham).astype(jnp.float32)
                  * LOG_ONE_MINUS_SNP)
        score = jnp.where(fast, ham, score)
        logp = jnp.where(fast, logp_f, logp)
        scored_ok = fast

    # Distance buckets: a candidate's LV head/tail distances are each
    # bounded by its whole-read distance (restricting the whole alignment to
    # either side never costs more), so survivors with a small whole-read
    # distance can run in a much narrower DP band — identical results,
    # ~ (D_small/D_full) of the work.  E0 catches the bulk (reads with <=3
    # errors) in a D=7 kernel; E1 the mid tail; bucket 2 the deep tail.
    keep0 = live & ~fast & (wdist <= E0)
    keep1 = live & ~fast & (wdist > E0) & (wdist <= E1)
    keep2 = live & ~fast & (wdist > E1) & (wdist <= e_max)

    per_read = max(cfg.score_budget_per_read, cfg.max_hits_to_get)

    def run_bucket(keep, SB, band, score, logp, loc_adj, scored_ok):
        chosen = stable_partition_indices(keep, SB)
        u_sub = {k: u[k][chosen] for k in ("read", "dir", "loc", "off", "live")}
        u_sub["live"] = u_sub["live"] & keep[chosen]
        sc_sub = score_phase(u_sub, reads, quals, genome_p4, piece_starts,
                             cfg, seed_len, read_len, genome_size, band=band,
                             window=window[chosen], qlp_both=qlp_both)
        score = score.at[chosen].set(
            jnp.where(u_sub["live"], sc_sub["score"], score[chosen]))
        logp = logp.at[chosen].set(
            jnp.where(u_sub["live"], sc_sub["logp"], logp[chosen]))
        loc_adj = loc_adj.at[chosen].set(
            jnp.where(u_sub["live"], sc_sub["loc_adj"], loc_adj[chosen]))
        scored_ok = scored_ok.at[chosen].set(
            jnp.where(u_sub["live"], sc_sub["scored_ok"], scored_ok[chosen]))
        return score, logp, loc_adj, scored_ok

    # Bucket 0 is TWO-TIER: the LV kernel cost is proportional to its
    # static row count, but the live survivor count varies wildly with
    # repeat content.  When the survivors fit in the small tier, running it
    # is bit-identical to running the big tier (the extra big-tier rows are
    # dead: k=0, live=False) — a lax.cond picks the cheap path at runtime
    # with zero accuracy cost; the big tier remains the exact fallback.
    SB_big = min(B * per_read, C)
    SB_small = min(B * max(2, per_read // 4), SB_big)
    # with the substitution fast path on, LV sees only indel/clipped rows —
    # a B-row bottom tier covers the common case at ~1/4 the small tier
    SB_tiny = min(B, SB_small)
    n0 = keep0.sum()
    st = (score, logp, loc_adj, scored_ok)
    if SB_small < SB_big:
        big_side = lambda s: jax.lax.cond(
            n0 <= SB_small,
            lambda t: run_bucket(keep0, SB_small, E0, *t),
            lambda t: run_bucket(keep0, SB_big, E0, *t),
            s)
        if SB_tiny < SB_small:
            st = jax.lax.cond(
                n0 <= SB_tiny,
                lambda s: run_bucket(keep0, SB_tiny, E0, *s),
                big_side, st)
        else:
            st = big_side(st)
    else:
        st = run_bucket(keep0, SB_big, E0, *st)
    score, logp, loc_adj, scored_ok = st
    overflow = overflow + jnp.maximum(n0 - SB_big, 0)

    # buckets 1 and 2 (whole-read distance in (E0,E1] / (E1,e_max]) hold
    # only error-dense reads.  Bucket 1 is where near-repeat candidates
    # (~5% divergence) land on repeat-dense genomes, and dropping them
    # inflates MAPQ (they carry probability mass), so it gets the same
    # two-tier cond as bucket 0: a small tier for the common case and a
    # proportional big-tier fallback selected at runtime.  Bucket 2 (the
    # deep tail) keeps the small pooled cap; overflow is counted.
    for keep, hi in ((keep1, E1), (keep2, e_max)):
        if hi <= E0 or (hi == e_max and e_max <= E1):
            continue
        SBt = min(max(B // 2, 256), C)
        if hi == E1:
            SBt_big = min(B * max(2, per_read // 4), C)
            nk = keep.sum()
            if SBt < SBt_big:
                score, logp, loc_adj, scored_ok = jax.lax.cond(
                    nk <= SBt,
                    lambda s: run_bucket(keep, SBt, hi, *s),
                    lambda s: run_bucket(keep, SBt_big, hi, *s),
                    (score, logp, loc_adj, scored_ok))
            else:
                score, logp, loc_adj, scored_ok = run_bucket(
                    keep, SBt_big, hi, score, logp, loc_adj, scored_ok)
            overflow = overflow + jnp.maximum(nk - SBt_big, 0)
            continue
        score, logp, loc_adj, scored_ok = run_bucket(
            keep, SBt, hi, score, logp, loc_adj, scored_ok)
        overflow = overflow + jnp.maximum(keep.sum() - SBt, 0)

    return dict(score=score, logp=logp, loc_adj=loc_adj, scored_ok=scored_ok,
                score_overflow=overflow, n_bucket2=keep2.sum(),
                n_fast=fast.sum())


def replay_phase(u, sc, budget, reads, B, S, cfg: SingleAlignerConfig):
    """Replay the sequential engine's selection over scored candidates."""
    maxK, extra = cfg.max_k, cfg.extra_search_depth
    C = u["read"].shape[0]
    score, logp, loc_adj = sc["score"], sc["logp"], sc["loc_adj"]
    scored_ok = sc["scored_ok"]
    u_read, u_dir, u_round, u_order, u_lp = (
        u["read"], u["dir"], u["round"], u["order"], u["lp"])

    n_count = (reads == 4).sum(axis=1)

    # stopping round R*: lowest-possible bound exceeds the evolving limit
    round_of = jnp.clip(u_round, 0, S - 1)
    best_by_round = jax.ops.segment_min(
        jnp.where(scored_ok, score, BIG),
        u_read * S + round_of, num_segments=B * S).reshape(B, S)
    best_upto = jax.lax.cummin(best_by_round, axis=1)
    limit_r = jnp.minimum(best_upto, maxK) + extra
    lp_after = budget["lp_after"]
    stop_r = jnp.minimum(lp_after[:, :, 0], lp_after[:, :, 1]) > limit_r
    r_star = jnp.where(stop_r.any(axis=1),
                       jnp.argmax(stop_r, axis=1).astype(jnp.int32),
                       jnp.int32(S - 1))

    in_play = scored_ok & (u_round <= r_star[u_read])
    score_f = jnp.where(in_play, score, BIG)

    # winner per read by (score asc, logp desc, order asc, index asc) via
    # three segment-min passes — no sort.  The f32 composite is exact for
    # score <= 62 (1e6 steps dominate the clipped logp term), the same
    # encoding the cluster selection below uses.
    comp = jnp.where(score_f < BIG,
                     score_f.astype(jnp.float32) * 1e6 - jnp.clip(logp, -1e5, 0),
                     jnp.float32(3e12))
    m1 = jax.ops.segment_min(comp, u_read, num_segments=B,
                             indices_are_sorted=True)
    cand1 = comp <= m1[u_read]
    m2 = jax.ops.segment_min(jnp.where(cand1, u_order, BIG), u_read,
                             num_segments=B, indices_are_sorted=True)
    cand2 = cand1 & (u_order == m2[u_read])
    winner_slot = jax.ops.segment_min(
        jnp.where(cand2, jnp.arange(C, dtype=jnp.int32), BIG), u_read,
        num_segments=B, indices_are_sorted=True)
    has_best = jax.ops.segment_min(score_f, u_read, num_segments=B,
                                   indices_are_sorted=True) < BIG
    winner_slot = jnp.where(has_best, winner_slot, 0)
    best_score = score_f[winner_slot]
    best_loc = loc_adj[winner_slot]
    best_dir = u_dir[winner_slot]
    best_logp = logp[winner_slot]

    final_limit = jnp.minimum(jnp.minimum(best_score, maxK) + extra, cfg.e_max)
    in_prob = in_play & (score <= final_limit[u_read]) & (u_lp <= final_limit[u_read])

    gap_new = jnp.concatenate([jnp.ones(1, bool),
                               (u_read[1:] != u_read[:-1]) |
                               (u_dir[1:] != u_dir[:-1]) |
                               (loc_adj[1:] - loc_adj[:-1] > MAX_MERGE_DIST)])
    clus_id = _segment_ids(gap_new)
    clus_key = jnp.where(in_prob,
                         score.astype(jnp.float32) * 1e6 - jnp.clip(logp, -1e5, 0),
                         jnp.float32(3e12))
    clus_min = jax.ops.segment_min(clus_key, clus_id, num_segments=C,
                                   indices_are_sorted=True)
    is_clus_best = in_prob & (clus_key <= clus_min[clus_id])
    cum_best = jnp.cumsum(is_clus_best.astype(jnp.int32))
    first_best_rank = jax.ops.segment_min(
        jnp.where(is_clus_best, cum_best, BIG), clus_id, num_segments=C,
        indices_are_sorted=True)
    is_clus_best = is_clus_best & (cum_best == first_best_rank[clus_id])

    clus_logp = jnp.where(is_clus_best, logp, NEG_INF)
    read_max = jnp.maximum(jax.ops.segment_max(clus_logp, u_read, num_segments=B,
                                               indices_are_sorted=True),
                           -1e29)
    psum = jax.ops.segment_sum(
        jnp.where(is_clus_best, jnp.exp(clus_logp - read_max[u_read]), 0.0),
        u_read, num_segments=B, indices_are_sorted=True)
    log_pall = jnp.where(psum > 0, jnp.log(psum) + read_max, NEG_INF)

    not_best = is_clus_best & (jnp.arange(C) != winner_slot[u_read])
    psum_o = jax.ops.segment_sum(
        jnp.where(not_best, jnp.exp(jnp.where(not_best, logp, NEG_INF)
                                    - read_max[u_read]), 0.0),
        u_read, num_segments=B, indices_are_sorted=True)
    log_pother = jnp.where(psum_o > 0, jnp.log(psum_o) + read_max, NEG_INF)

    popular_n = (budget["popular"] & budget["active_pos"][:, :, None]
                 & (jnp.arange(S)[None, :, None] <= r_star[:, None, None])
                 ).sum(axis=(1, 2))

    mapq = _compute_mapq(log_pall, best_logp, log_pother, best_score, popular_n)

    applied_any = budget["applied_act"].any(axis=(1, 2))
    aligned = has_best & (best_score <= maxK)
    if cfg.stop_on_first:
        # -f filtering mode: any in-budget hit counts as a SingleHit
        # (BaseAligner.cpp:1373-1381)
        result = jnp.where(aligned, SINGLE_HIT,
                           jnp.where(applied_any, NOT_FOUND, MULTIPLE_HITS))
    else:
        result = jnp.where(
            aligned,
            jnp.where(mapq >= MAPQ_LIMIT_FOR_SINGLE_HIT, SINGLE_HIT, MULTIPLE_HITS),
            jnp.where(applied_any, NOT_FOUND, MULTIPLE_HITS))
    result = jnp.where(n_count > maxK, NOT_FOUND, result)
    ok = aligned & (n_count <= maxK)
    out = dict(result=result,
               loc=jnp.where(ok, best_loc, jnp.int32(-1)),
               direction=best_dir,
               score=jnp.where(has_best, best_score, -1),
               mapq=jnp.where(ok, mapq, 0),
               log_pbest=best_logp, log_pall=log_pall,
               popular=popular_n)
    if cfg.max_hits_to_get > 0:
        out.update(_multi_hits(u_read, loc_adj, u_dir, score, u_order,
                               in_play, B, C, cfg.max_hits_to_get, cfg.e_max))
    return out


def _compute_mapq(log_pall, log_pbest, log_pother, score, popular):
    """computeMAPQ (mapq.h:32-65) in log space.

    The reference's double-equality test `pAll == pBest` becomes
    "other mass < 2^-53 of best" — below double ulp, the 64-bit sum would
    not have changed."""
    exact = log_pother - log_pbest < -36.7368  # log(2^-53)
    special70 = exact & (popular == 0) & (score < 5)
    r = jnp.exp(jnp.minimum(log_pother - log_pbest, 50.0))
    frac = r / (1.0 + r)
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
    tgt_r = jnp.where(keep, r_, B)      # OOB rows dropped by the scatter
    tgt_c = jnp.where(keep, rr, 0)
    mh_loc = jnp.full((B, max_get), INVALID_GENOME_LOCATION, jnp.uint32)
    mh_dir = jnp.zeros((B, max_get), jnp.int32)
    mh_score = jnp.full((B, max_get), -1, jnp.int32)
    mh_loc = mh_loc.at[tgt_r, tgt_c].set(l_.astype(jnp.uint32), mode="drop")
    mh_dir = mh_dir.at[tgt_r, tgt_c].set(d_, mode="drop")
    mh_score = mh_score.at[tgt_r, tgt_c].set(s_, mode="drop")
    mh_n = jax.ops.segment_sum(keep.astype(jnp.int32), r_, num_segments=B)
    return dict(mh_loc=mh_loc, mh_dir=mh_dir, mh_score=mh_score, mh_n=mh_n)


# ----------------------------------------------------------------------
# rowwise back half (round 5)
# ----------------------------------------------------------------------
# The flat back half (compact_phase -> filtered_score_phase ->
# replay_phase above) pools candidates across reads: every selection is a
# C-scale cumsum + scatter + gather-back, every budget a lax.cond whose
# operand tuple shuffles between memory spaces.  The round-4 device
# profile (PERF.md) showed the engine bound by exactly that machinery
# (~72 ms/batch of async HBM<->scratch migrations + scatter fusions), not
# by compute.  The rowwise formulation keeps every post-aggregation array
# (rows, W): selections become lane ranks + small take_along gathers,
# segment ops become log2(W) lane shifts (ops/rowscan.py), the pooled
# compaction disappears entirely (W already bounds candidates per read —
# strictly MORE exact: pooled-cap truncation can no longer drop live
# candidates), and the per-read LV budget replaces the pooled tier conds.
# The flat functions are kept for the per-read trace tool and unit tests.

def rowwise_score_phase(u2, reads, quals, genome_p4, piece_starts, cfg,
                        seed_len, read_len, genome_size,
                        qlp_both: jnp.ndarray | None = None,
                        score_scale: int = 1):
    """Rowwise scoring: bit-parallel whole-read prefilter + anchored
    substitution fast path on ALL (rows, W) candidates; full LV + backtrace
    on up to J survivors per read, selected by lane rank.

    Same exactness contract as filtered_score_phase (whole_dist > e_max
    implies the seed-split LV gate fails; ham == wdist implies the anchored
    pure-substitution closed form) with the pooled score budget replaced by
    a per-read cap J = score_budget_per_read * score_scale; rows beyond J
    are counted in score_overflow, like the reference's candidate-pool cap
    (IntersectingPairedEndAligner.h:33)."""
    from ..ops.bitpar import bitpar_distance_words
    e_max = cfg.e_max
    R, W = u2["dir"].shape
    big = big_locations(genome_size)
    live = u2["live"]
    loc = jnp.where(live, u2["loc"], 0)
    flat_loc = loc.reshape(R * W)

    # margin = cfg.e_max (see score_phase's window-margin note)
    M = cfg.e_max
    WIN = read_len + 2 * M
    window, win_words = gather_windows(genome_p4, flat_loc - M,
                                       width=WIN, big=big,
                                       return_packed=True)
    window = window.reshape(R, W, WIN)

    if cfg.score_budget_per_read == 0:
        # prefilter disabled: full LV on every candidate slot
        u_flat = dict(
            read=jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None],
                                  (R, W)).reshape(R * W),
            dir=u2["dir"].reshape(R * W), loc=u2["loc"].reshape(R * W),
            off=u2["off"].reshape(R * W), live=live.reshape(R * W))
        sc = score_phase(u_flat, reads, quals, genome_p4, piece_starts,
                         cfg, seed_len, read_len, genome_size,
                         window=window.reshape(R * W, WIN),
                         qlp_both=qlp_both)
        return dict(score=sc["score"].reshape(R, W),
                    logp=sc["logp"].reshape(R, W),
                    loc_adj=sc["loc_adj"].reshape(R, W),
                    scored_ok=sc["scored_ok"].reshape(R, W),
                    score_overflow=jnp.int32(0),
                    n_bucket2=jnp.int32(0), n_fast=jnp.int32(0))

    rc_reads = COMP_LUT[reads[:, ::-1].astype(jnp.int32)]
    is_rc = (u2["dir"] == 1)[:, :, None]
    # broadcast select instead of a (C, L) gather: each row only ever
    # needs its own read or its RC
    sel = jnp.where(is_rc, rc_reads[:, None, :], reads[:, None, :])

    want = read_len + e_max
    t_len = jnp.full((R * W,), want, jnp.int32)
    # packed text: the prefilter consumes the 4-bit window words directly
    # (column j = nibble M + j), skipping the 4x-wider i32 text rows
    wdist = bitpar_distance_words(sel.reshape(R * W, read_len),
                                  win_words, t_len,
                                  P=read_len, TXT=want,
                                  packed_off=M).reshape(R, W)

    # piece-boundary clipping predicate (same as score_phase; uint32
    # arithmetic covers big-genome locations)
    pidx = piece_index_of(piece_starts, flat_loc, big=big).reshape(R, W)
    next_start = jnp.where(
        pidx + 1 < piece_starts.shape[0],
        piece_starts[jnp.minimum(pidx + 1, piece_starts.shape[0] - 1)],
        jnp.int32(np.uint32(genome_size).astype(np.int32)))
    crosses = (loc.astype(jnp.uint32) + (read_len + M)
               > jnp.minimum(next_start.astype(jnp.uint32),
                             jnp.uint32(genome_size)))

    if qlp_both is None:
        from ..ops.lv import phred_log_prob_device
        qlp_both = phred_log_prob_device(
            jnp.stack([quals, quals[:, ::-1]], axis=1))

    score = jnp.full((R, W), BIG, jnp.int32)
    logp = jnp.full((R, W), NEG_INF, jnp.float32)
    loc_adj = u2["loc"]
    scored_ok = jnp.zeros((R, W), bool)

    fast = jnp.zeros((R, W), bool)
    if os.environ.get("SNAP_TPU_FAST_SUB", "1") != "0":
        # anchored pure-substitution closed form (see filtered_score_phase
        # for the exactness argument and the documented equal-cost-indel
        # deviation)
        text0 = window[:, :, M:M + read_len]
        mm = sel != text0
        ham = mm.sum(axis=2).astype(jnp.int32)
        fast = live & ~crosses & (wdist <= e_max) & (ham == wdist)
        qlp_sel = jnp.where(is_rc, qlp_both[:, None, 1, :],
                            qlp_both[:, None, 0, :])
        logp_f = (jnp.where(mm, qlp_sel, 0.0).sum(axis=2)
                  + (read_len - ham).astype(jnp.float32)
                  * LOG_ONE_MINUS_SNP)
        score = jnp.where(fast, ham, score)
        logp = jnp.where(fast, logp_f, logp)
        scored_ok = fast

    # LV rows: everything live that the fast path didn't settle and the
    # prefilter didn't reject — selected per READ by lane rank
    need = live & ~fast & (wdist <= e_max)
    J = min(W, max(2, cfg.score_budget_per_read * score_scale))
    need_i = need.astype(jnp.int32)
    rank = jnp.cumsum(need_i, axis=1) - need_i
    need_per_read = need_i.sum(axis=1)

    def run_lv(Jt, score, logp, loc_adj, scored_ok):
        match = need[:, None, :] & (
            rank[:, None, :]
            == jnp.arange(Jt, dtype=jnp.int32)[None, :, None])
        sel_w = jnp.argmax(match, axis=2).astype(jnp.int32)   # (R, Jt)
        lv_valid = match.any(axis=2)
        take = lambda x: jnp.take_along_axis(x, sel_w, axis=1)
        u_sub = dict(
            read=jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None],
                                  (R, Jt)).reshape(R * Jt),
            dir=take(u2["dir"]).reshape(R * Jt),
            loc=take(u2["loc"]).reshape(R * Jt),
            off=take(u2["off"]).reshape(R * Jt),
            live=lv_valid.reshape(R * Jt))
        win_sub = jnp.take_along_axis(window, sel_w[:, :, None],
                                      axis=1).reshape(R * Jt, WIN)
        sc_sub = score_phase(u_sub, reads, quals, genome_p4, piece_starts,
                             cfg, seed_len, read_len, genome_size,
                             window=win_sub, qlp_both=qlp_both)
        # scatter the Jt results back into the (R, W) lanes (tiny scatter)
        rr = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None],
                              (R, Jt))
        tr = jnp.where(lv_valid, rr, R).reshape(R * Jt)
        tc = jnp.where(lv_valid, sel_w, 0).reshape(R * Jt)
        return (score.at[tr, tc].set(sc_sub["score"].reshape(R * Jt),
                                     mode="drop"),
                logp.at[tr, tc].set(sc_sub["logp"].reshape(R * Jt),
                                    mode="drop"),
                loc_adj.at[tr, tc].set(sc_sub["loc_adj"].reshape(R * Jt),
                                       mode="drop"),
                scored_ok.at[tr, tc].set(
                    sc_sub["scored_ok"].reshape(R * Jt), mode="drop"))

    # TINY TIER + POOLED SPILL: after the substitution fast path only
    # indel/clipped rows need the LV kernel (~1-5% of candidates), but
    # the kernel's cost is its STATIC lane count, and a per-read J must
    # cover the worst (flood) read.  Instead: a small per-read tier
    # (J/4) covers the common case, and rows beyond it from ANY read
    # spill into one pooled tier of R rows — flood tails land there
    # without forcing every read's lanes 4x wider.  Rows beyond the
    # pooled capacity are counted in score_overflow exactly as the old
    # per-read cap counted rows beyond J.
    J_small = max(2, J // 4)
    score, logp, loc_adj, scored_ok = run_lv(
        J_small, score, logp, loc_adj, scored_ok)
    if J_small < J:
        SPILL = R
        spill_flat = (need & (rank >= J_small)).reshape(R * W)
        chosen = stable_partition_indices(spill_flat, SPILL)
        ok_sp = spill_flat[chosen]
        u_sp = dict(
            read=(chosen // W).astype(jnp.int32),
            dir=u2["dir"].reshape(R * W)[chosen],
            loc=u2["loc"].reshape(R * W)[chosen],
            off=u2["off"].reshape(R * W)[chosen],
            live=ok_sp)
        win_sp = window.reshape(R * W, WIN)[chosen]
        sc_sp = score_phase(u_sp, reads, quals, genome_p4, piece_starts,
                            cfg, seed_len, read_len, genome_size,
                            window=win_sp, qlp_both=qlp_both)
        def flat_set(dst, new):
            d = dst.reshape(R * W)
            return d.at[chosen].set(jnp.where(ok_sp, new,
                                              d[chosen])).reshape(R, W)
        score = flat_set(score, sc_sp["score"])
        logp = flat_set(logp, sc_sp["logp"])
        loc_adj = flat_set(loc_adj, sc_sp["loc_adj"])
        scored_ok = flat_set(scored_ok, sc_sp["scored_ok"])
        overflow = jnp.maximum(spill_flat.sum() - SPILL, 0)
    else:
        overflow = jnp.maximum(need_per_read - J, 0).sum()

    return dict(score=score, logp=logp, loc_adj=loc_adj, scored_ok=scored_ok,
                score_overflow=overflow,
                n_bucket2=jnp.int32(0), n_fast=fast.sum())


def rowwise_replay_phase(u2, sc2, budget, reads, S, cfg: SingleAlignerConfig):
    """replay_phase with every segment reduction as a row reduction or a
    rowwise lane scan — no flat scatters.  Identical selection math."""
    maxK, extra = cfg.max_k, cfg.extra_search_depth
    R, W = u2["dir"].shape
    score, logp, loc_adj = sc2["score"], sc2["logp"], sc2["loc_adj"]
    scored_ok = sc2["scored_ok"]
    from ..ops.rowscan import seg_broadcast

    n_count = (reads == 4).sum(axis=1)

    round_of = jnp.clip(u2["round"], 0, S - 1)
    rmask = round_of[:, None, :] == jnp.arange(S, dtype=jnp.int32)[None, :, None]
    best_by_round = jnp.min(
        jnp.where(rmask & scored_ok[:, None, :], score[:, None, :], BIG),
        axis=2)                                              # (R, S)
    best_upto = jax.lax.cummin(best_by_round, axis=1)
    limit_r = jnp.minimum(best_upto, maxK) + extra
    lp_after = budget["lp_after"]
    stop_r = jnp.minimum(lp_after[:, :, 0], lp_after[:, :, 1]) > limit_r
    r_star = jnp.where(stop_r.any(axis=1),
                       jnp.argmax(stop_r, axis=1).astype(jnp.int32),
                       jnp.int32(S - 1))

    in_play = scored_ok & (round_of <= r_star[:, None])
    score_f = jnp.where(in_play, score, BIG)

    comp = jnp.where(score_f < BIG,
                     score_f.astype(jnp.float32) * 1e6
                     - jnp.clip(logp, -1e5, 0),
                     jnp.float32(3e12))
    m1 = jnp.min(comp, axis=1)
    cand1 = comp <= m1[:, None]
    m2 = jnp.min(jnp.where(cand1, u2["order"], BIG), axis=1)
    cand2 = cand1 & (u2["order"] == m2[:, None])
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    winner_col = jnp.min(jnp.where(cand2, cols, BIG), axis=1)
    has_best = jnp.min(score_f, axis=1) < BIG
    winner_col = jnp.where(has_best, winner_col, 0)
    pick = lambda x: jnp.take_along_axis(x, winner_col[:, None],
                                         axis=1)[:, 0]
    best_score = pick(score_f)
    best_loc = pick(loc_adj)
    best_dir = pick(u2["dir"])
    best_logp = pick(logp)

    final_limit = jnp.minimum(jnp.minimum(best_score, maxK) + extra,
                              cfg.e_max)
    in_prob = in_play & (score <= final_limit[:, None]) \
        & (u2["lp"] <= final_limit[:, None])

    col0 = jnp.zeros((R, W), bool).at[:, 0].set(True)
    d_prev = jnp.pad(u2["dir"], ((0, 0), (1, 0)))[:, :-1]
    l_prev = jnp.pad(loc_adj, ((0, 0), (1, 0)))[:, :-1]
    gap_new = col0 | (u2["dir"] != d_prev) \
        | (loc_adj - l_prev > MAX_MERGE_DIST)
    clus_key = jnp.where(in_prob,
                         score.astype(jnp.float32) * 1e6
                         - jnp.clip(logp, -1e5, 0),
                         jnp.float32(3e12))
    clus_min = seg_broadcast(clus_key, gap_new, jnp.minimum,
                             jnp.float32(3e12))
    is_clus_best = in_prob & (clus_key <= clus_min)
    cum_best = jnp.cumsum(is_clus_best.astype(jnp.int32), axis=1)
    first_rank = seg_broadcast(jnp.where(is_clus_best, cum_best, BIG),
                               gap_new, jnp.minimum, BIG)
    is_clus_best = is_clus_best & (cum_best == first_rank)

    clus_logp = jnp.where(is_clus_best, logp, NEG_INF)
    read_max = jnp.maximum(jnp.max(clus_logp, axis=1), -1e29)
    psum = jnp.sum(jnp.where(is_clus_best,
                             jnp.exp(clus_logp - read_max[:, None]), 0.0),
                   axis=1)
    log_pall = jnp.where(psum > 0, jnp.log(psum) + read_max, NEG_INF)

    not_best = is_clus_best & (cols != winner_col[:, None])
    psum_o = jnp.sum(jnp.where(not_best,
                               jnp.exp(clus_logp - read_max[:, None]), 0.0),
                     axis=1)
    log_pother = jnp.where(psum_o > 0, jnp.log(psum_o) + read_max, NEG_INF)

    popular_n = (budget["popular"] & budget["active_pos"][:, :, None]
                 & (jnp.arange(S)[None, :, None] <= r_star[:, None, None])
                 ).sum(axis=(1, 2))

    mapq = _compute_mapq(log_pall, best_logp, log_pother, best_score,
                         popular_n)

    applied_any = budget["applied_act"].any(axis=(1, 2))
    aligned = has_best & (best_score <= maxK)
    if cfg.stop_on_first:
        result = jnp.where(aligned, SINGLE_HIT,
                           jnp.where(applied_any, NOT_FOUND, MULTIPLE_HITS))
    else:
        result = jnp.where(
            aligned,
            jnp.where(mapq >= MAPQ_LIMIT_FOR_SINGLE_HIT, SINGLE_HIT,
                      MULTIPLE_HITS),
            jnp.where(applied_any, NOT_FOUND, MULTIPLE_HITS))
    result = jnp.where(n_count > maxK, NOT_FOUND, result)
    ok = aligned & (n_count <= maxK)
    out = dict(result=result,
               loc=jnp.where(ok, best_loc, jnp.int32(-1)),
               direction=best_dir,
               score=jnp.where(has_best, best_score, -1),
               mapq=jnp.where(ok, mapq, 0),
               log_pbest=best_logp, log_pall=log_pall,
               popular=popular_n)
    if cfg.max_hits_to_get > 0:
        out.update(_multi_hits_rowwise(u2, loc_adj, score, in_play,
                                       cfg.max_hits_to_get, cfg.e_max))
    return out


def _multi_hits_rowwise(u2, loc_adj, score, in_play, max_get, e_max):
    """fillHitsFound analog, rowwise: per-row sort by (score, order)."""
    R, W = score.shape
    score_m = jnp.where(in_play, score, BIG)
    s_, o_, l_, d_ = jax.lax.sort(
        (score_m, u2["order"], loc_adj, u2["dir"]), dimension=1, num_keys=2,
        is_stable=True)
    first_score = s_[:, :1]
    okh = (s_ < BIG) & (s_ < first_score + 4) & (s_ <= e_max)
    rank = jnp.cumsum(okh.astype(jnp.int32), axis=1) - 1
    keep = okh & (rank < max_get)
    rr = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None], (R, W))
    tr = jnp.where(keep, rr, R).reshape(R * W)
    tc = jnp.where(keep, rank, 0).reshape(R * W)
    mh_loc = jnp.full((R, max_get), INVALID_GENOME_LOCATION, jnp.uint32)
    mh_dir = jnp.zeros((R, max_get), jnp.int32)
    mh_score = jnp.full((R, max_get), -1, jnp.int32)
    mh_loc = mh_loc.at[tr, tc].set(
        l_.astype(jnp.uint32).reshape(R * W), mode="drop")
    mh_dir = mh_dir.at[tr, tc].set(d_.reshape(R * W), mode="drop")
    mh_score = mh_score.at[tr, tc].set(s_.reshape(R * W), mode="drop")
    mh_n = keep.sum(axis=1)
    return dict(mh_loc=mh_loc, mh_dir=mh_dir, mh_score=mh_score, mh_n=mh_n)


def dense_topk_rowwise(u2, sc2, K):
    """(B, K) dense view of the scored candidates for the pair join.

    Single-chip W == K: the rowwise arrays ARE the dense view.  Wider rows
    (sharded all_gather: W = n_idx * cand_per_read) keep the first K
    scored candidates in (dir, loc) row order — the same selection the
    flat _dense_per_read made (rank among scored rows, read-sorted)."""
    R, W = sc2["score"].shape
    live = u2["live"] & sc2["scored_ok"]
    loc = jnp.where(live, sc2["loc_adj"], 0)
    score = jnp.where(live, sc2["score"], BIG)
    logp = jnp.where(live, sc2["logp"], NEG_INF)
    if W == K:
        return dict(loc=loc, dir=u2["dir"], score=score, logp=logp,
                    live=live, in_prob=live, overflow=jnp.int32(0))
    sel = live.astype(jnp.int32)
    rank = jnp.cumsum(sel, axis=1) - sel
    keep = live & (rank < K)
    match = keep[:, None, :] & (rank[:, None, :]
                                == jnp.arange(K, dtype=jnp.int32)[None, :, None])
    sel_w = jnp.argmax(match, axis=2).astype(jnp.int32)       # (R, K)
    valid = match.any(axis=2)
    take = lambda x, fill: jnp.where(
        valid, jnp.take_along_axis(x, sel_w, axis=1), fill)
    return dict(loc=take(loc, 0), dir=take(u2["dir"], 0),
                score=take(score, BIG), logp=take(logp, NEG_INF),
                live=valid, in_prob=valid,
                overflow=(live & ~keep).sum())


def rowwise_back_half(cands, budget, reads, quals, genome_p4, piece_starts,
                      cfg, seed_len, read_len, genome_size, S,
                      qlp_both=None, score_scale: int = 1):
    """aggregate -> rowwise score -> rowwise replay.  Returns (u2, sc2,
    out) where out carries the replay results + device counters."""
    u2 = _aggregate_rows(cands, big=big_locations(genome_size))
    sc2 = rowwise_score_phase(u2, reads, quals, genome_p4, piece_starts,
                              cfg, seed_len, read_len, genome_size,
                              qlp_both=qlp_both, score_scale=score_scale)
    out = rowwise_replay_phase(u2, sc2, budget, reads, S, cfg)
    out["score_overflow"] = sc2["score_overflow"]
    out["n_unique_candidates"] = u2["live"].sum()
    out["n_scored"] = sc2["scored_ok"].sum()
    out["n_bucket2"] = sc2["n_bucket2"]
    return u2, sc2, out


# ----------------------------------------------------------------------
# single-chip composition
# ----------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("cfg", "seed_len", "read_len", "genome_size",
                     "sched_static"))
def _align_batch(reads, quals,
                 ht_entries, shard_start, shard_size,
                 overflow, genome_p4, piece_starts,
                 schedule, wraps, cuckoo=None,
                 *, cfg: SingleAlignerConfig, seed_len: int, read_len: int,
                 genome_size: int, sched_static: tuple = None):
    B = reads.shape[0]
    S = schedule.shape[0]
    seeds = seed_phase(reads, schedule, seed_len, ht_entries,
                       shard_start, shard_size, overflow, genome_size,
                       sched_static, cuckoo)
    counts_global = jnp.where(seeds["found"][:, :, None], seeds["counts"], 0)
    budget = budget_phase(seeds["valid"], counts_global, wraps, cfg)

    def from_cands(cands, score_scale=1):
        """Rowwise back half for one expand width (see rowwise_back_half).
        score_scale widens the per-read LV budget in the WIDE expand tier
        so the extra candidates it carries don't displace true hits."""
        _u2, _sc2, out = rowwise_back_half(
            cands, budget, reads, quals, genome_p4, piece_starts, cfg,
            seed_len, read_len, genome_size, S, score_scale=score_scale)
        out["truncated"] = cands["truncated"]
        # per-phase device counters (BaseAligner.h:113-118 analog)
        out["n_lookups"] = seeds["found"].sum()
        out["n_candidates"] = cands["live"].sum()
        return out

    big = big_locations(genome_size)
    cands = expand_phase(seeds, budget, schedule, overflow, cfg, seed_len,
                         read_len, cfg.cand_per_read, big=big)
    if not (cfg.overflow_tier and cfg.cand_per_read > 0):
        return from_cands(cands)
    # Candidate-overflow exact fallback: if the narrow expand truncated ANY
    # read's hit list (repeat-dense regime — the silent-accuracy-loss spot
    # flagged against IntersectingPairedEndAligner.h:33's 1e6-candidate
    # pool), re-expand at 4x width and run the wide pipeline.  When the
    # narrow tier did NOT truncate, its result is bit-identical to the wide
    # tier's (extra rows are dead), so this cond preserves exact wide
    # semantics at narrow typical-batch cost.
    return jax.lax.cond(
        cands["truncated"].sum() > 0,
        lambda c: from_cands(
            expand_phase(seeds, budget, schedule, overflow, cfg, seed_len,
                         read_len, 4 * cfg.cand_per_read, big=big),
            score_scale=4),
        lambda c: from_cands(c),
        cands)


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
        import os
        use_cuckoo = os.environ.get("SNAP_TPU_LOOKUP", "cuckoo") == "cuckoo"
        skip = {"genome_size", "genome_codes"}
        if use_cuckoo:
            # the cuckoo layout replaces the probe-chain table on device:
            # don't ship ht_entries to HBM at all
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
        self._dev["genome_p4"] = jnp.asarray(
            pack_genome_4bit(arrs["genome_codes"]))
        self._dev["piece_starts"] = jnp.asarray(
            index.genome.piece_offsets.astype(np.int32))
        self.genome_size = int(arrs["genome_size"])
        self._aot = {}   # (B, L, dtypes) -> AOT-cached compiled executable

    def schedule_for(self, read_len: int):
        positions, wraps = seed_position_schedule(read_len, self.index.seed_len)
        S = min(self.cfg.max_seed_slots, len(positions))
        return positions[:S], wraps[:S]

    def align_batch_device(self, reads, quals):
        """Device-to-device: accepts and returns jnp arrays."""
        B, L = reads.shape
        positions, wraps = self.schedule_for(L)
        dyn_args = (
            reads, quals,
            self._dev["ht_entries"],
            self._dev["shard_start"], self._dev["shard_size"],
            self._dev["overflow"], self._dev["genome_p4"],
            self._dev["piece_starts"],
            jnp.asarray(positions), jnp.asarray(wraps),
            self._cuckoo)
        statics = dict(
            cfg=self.cfg.resolve_for_read_len(L),
            seed_len=self.index.seed_len, read_len=L,
            genome_size=self.genome_size,
            sched_static=tuple(int(x) for x in positions))
        # TPU: persistent AOT executable cache (see models/paired.py and
        # utils/aot_cache.py for why the jit path is not enough here)
        from ..utils.aot_cache import aot_enabled, load_or_compile
        if aot_enabled():
            shape_key = (B, L, reads.dtype, quals.dtype)
            compiled = self._aot.get(shape_key)
            if compiled is None:
                compiled = load_or_compile(
                    "single_align", _align_batch, dyn_args, statics)
                if compiled is not None:
                    self._aot[shape_key] = compiled
            if compiled is not None:
                return compiled(*dyn_args)
        return _align_batch(*dyn_args, **statics)

    def align_batch(self, reads: np.ndarray, quals: np.ndarray) -> dict:
        """reads: (B, L) uint8 base codes (uniform length); quals ASCII."""
        out = self.align_batch_device(jnp.asarray(reads), jnp.asarray(quals))
        return jax.device_get(out)
