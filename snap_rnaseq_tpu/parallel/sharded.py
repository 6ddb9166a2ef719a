"""Multi-chip SPMD alignment: index sharded by seed high-bases over a mesh.

The reference scales by threads over shared memory (ParallelTask.h,
RangeSplitter.h); its only index partitioning is the 4^(seedLen-16) hash
tables selected by a seed's high bases (GenomeIndex.cpp:312-316).  That
partitioning key is exactly our device-sharding seam:

  mesh = ('data', 'index')
  reads   : sharded over 'data' (pure data parallelism over batches)
  hash    : logical tables split into contiguous ranges over 'index', each
            device holding its slot slice + the matching overflow slice
            (overflow is laid out in canonical-seed order, so ranges are
            contiguous — index/hash_index.py)
  genome  : replicated (2-bit-packable later; u8 hg19 fits one chip's HBM)

Data flow per step (shard_map over the mesh):
  1. every (data, index) device packs its reads' seeds and probes its OWN
     table slice; unowned seeds come back not-found;
  2. per-seed hit counts are psum-ed over 'index' -> the global budget /
     popularity / lowest-possible-score bookkeeping is computed identically
     everywhere;
  3. each index device expands ITS hits into candidate slots; candidates
     all_gather over 'index' (the only sizeable collective, rides ICI);
  4. the LV scoring work — the FLOPs — is re-split over 'index' by slicing
     the gathered candidate axis, then all_gather-ed back;
  5. the cheap replay/selection runs replicated.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import INVALID_GENOME_LOCATION, UNUSED_HASH_VALUE
from ..index.hash_index import GenomeIndex
from ..models import single as sg


def _use_cuckoo_lookup() -> bool:
    """The SNAP_TPU_LOOKUP escape hatch (probe-chain fallback), honored by
    the sharded path too so multichip lookup issues can be bisected against
    the reference-layout probe kernel."""
    import os
    return os.environ.get("SNAP_TPU_LOOKUP", "cuckoo") == "cuckoo"


def partition_index(index: GenomeIndex, n_idx: int,
                    use_cuckoo: bool | None = None) -> dict:
    """Split the index into n_idx device slices (stacked leading axis).

    Each slice keeps the FULL logical-shard metadata vectors (n_shards
    entries) with size 0 for unowned tables, so the unmodified lookup kernel
    naturally misses on unowned seeds.
    """
    if use_cuckoo is None:
        use_cuckoo = _use_cuckoo_lookup()
    n_shards = index.n_shards
    if n_idx > n_shards:
        raise ValueError(f"cannot split {n_shards} logical tables over {n_idx} devices")
    starts = index.shard_starts
    ovf_starts = index.shard_ovf_starts
    total_slots = int(starts[-1])
    gsize = index.genome_size

    # contiguous ranges of logical shards, balanced by slot count
    targets = np.linspace(0, total_slots, n_idx + 1)
    cut = np.searchsorted(starts, targets[1:-1], side="left")
    cuts = np.concatenate(([0], cut, [n_shards])).astype(np.int64)

    max_slots = 0
    max_ovf = 1
    for d in range(n_idx):
        lo, hi = cuts[d], cuts[d + 1]
        max_slots = max(max_slots, int(starts[hi] - starts[lo]))
        max_ovf = max(max_ovf, int(ovf_starts[hi] - ovf_starts[lo]))

    entries = np.zeros((n_idx, max_slots, 3), np.uint32)
    entries[:, :, 1] = INVALID_GENOME_LOCATION
    ovf = np.zeros((n_idx, max_ovf), np.uint32)
    sh_start = np.zeros((n_idx, n_shards), np.int32)
    sh_size = np.zeros((n_idx, n_shards), np.int32)

    for d in range(n_idx):
        lo, hi = int(cuts[d]), int(cuts[d + 1])
        s0, s1 = int(starts[lo]), int(starts[hi])
        o0, o1 = int(ovf_starts[lo]), int(ovf_starts[hi])
        entries[d, :s1 - s0, 0] = index.ht_keys[s0:s1]
        v1 = index.ht_val1[s0:s1].astype(np.uint64)
        v2 = index.ht_val2[s0:s1].astype(np.uint64)
        # rebase overflow pointers (value >= genome size) to the local slice
        for v in (v1, v2):
            is_ovf = (v >= gsize) & (v != INVALID_GENOME_LOCATION) & \
                (v != UNUSED_HASH_VALUE)
            v[is_ovf] -= np.uint64(o0)
        entries[d, :s1 - s0, 1] = v1.astype(np.uint32)
        entries[d, :s1 - s0, 2] = v2.astype(np.uint32)
        ovf[d, :o1 - o0] = index.overflow[o0:o1]
        sh_start[d, lo:hi] = (starts[lo:hi] - s0).astype(np.int32)
        sh_size[d, lo:hi] = np.diff(starts[lo:hi + 1]).astype(np.int32)

    # per-device bucket (cuckoo) layouts at ONE common shape, so the
    # loop-free lookup runs inside shard_map (hashing uses GLOBAL shard
    # ids via shard_base; see index/hash_index.py build_cuckoo_layout).
    # With SNAP_TPU_LOOKUP=probe the (expensive) layout build is skipped
    # and placeholder arrays keep the device-put plumbing uniform.
    if not use_cuckoo:
        return dict(ht_entries=entries, overflow=ovf,
                    shard_start=sh_start, shard_size=sh_size, cuts=cuts,
                    ck_buckets=np.zeros((n_idx, 1, 32), np.uint32),
                    ck_buckets2=np.zeros((n_idx, 1, 32), np.uint32),
                    ck_stash=np.zeros((n_idx, 1, 4), np.uint32))
    from ..index.hash_index import build_cuckoo_layout
    max_n = 0
    for d in range(n_idx):
        lo, hi = int(cuts[d]), int(cuts[d + 1])
        s0, s1 = int(starts[lo]), int(starts[hi])
        max_n = max(max_n, int((index.ht_val1[s0:s1] !=
                                np.uint32(INVALID_GENOME_LOCATION)).sum()))
    nb1 = max(16, int(np.ceil(max_n / (8 * 0.8))))
    nb2_min = 16
    while True:
        layouts = []
        for d in range(n_idx):
            lo, hi = int(cuts[d]), int(cuts[d + 1])
            s0, s1 = int(starts[lo]), int(starts[hi])
            layouts.append(build_cuckoo_layout(
                index.ht_keys[s0:s1], entries[d, :s1 - s0, 1],
                entries[d, :s1 - s0, 2], starts[lo:hi + 1] - s0,
                shard_base=lo, nb1=nb1, nb2_min=nb2_min))
        nb2_max = max(l["ck_buckets2"].shape[0] for l in layouts)
        if all(l["ck_buckets2"].shape[0] == nb2_max for l in layouts):
            break
        nb2_min = nb2_max     # rare: rebuild so every device shares a shape
    cuckoo = {k: np.stack([l[k] for l in layouts]) for k in
              ("ck_buckets", "ck_buckets2", "ck_stash")}

    return dict(ht_entries=entries, overflow=ovf,
                shard_start=sh_start, shard_size=sh_size, cuts=cuts,
                **cuckoo)


class ShardedSingleAligner:
    """Single-end aligner running SPMD over a ('data', 'index') mesh."""

    def __init__(self, index: GenomeIndex, mesh: Mesh,
                 config: sg.SingleAlignerConfig | None = None, **overrides):
        self.index = index
        self.mesh = mesh
        cfg = config or sg.SingleAlignerConfig(seed_len=index.seed_len)
        if overrides:
            cfg = sg.SingleAlignerConfig(**{**cfg.__dict__, **overrides})
        self.cfg = cfg
        self.n_data = mesh.shape["data"]
        self.n_idx = mesh.shape["index"]
        self._use_cuckoo = _use_cuckoo_lookup()
        parts = partition_index(index, self.n_idx, self._use_cuckoo)

        def put(arr, spec):
            return jax.device_put(arr, NamedSharding(mesh, spec))

        # pop each host slice as it lands on-device: at hg19 scale the
        # stacked entries are ~48 GB, and holding host + device copies
        # simultaneously would double peak RSS
        self._ht = {k: put(parts.pop(k), P("index"))
                    for k in ("ht_entries", "overflow",
                              "shard_start", "shard_size",
                              "ck_buckets", "ck_buckets2", "ck_stash")}
        from ..ops.genome_gather import pack_genome_4bit
        self._genome = put(pack_genome_4bit(
            np.ascontiguousarray(index.genome.codes)), P())
        self._pieces = put(index.genome.piece_offsets.astype(np.int32), P())
        self.genome_size = index.genome_size

    def align_batch_device(self, reads, quals) -> dict:
        """Same contract as SingleAligner.align_batch_device (device dict),
        so the host pipelines can run on a mesh unchanged."""
        reads = np.asarray(reads)
        quals = np.asarray(quals)
        B, L = reads.shape
        if B % self.n_data:
            raise ValueError("batch must divide the data axis")
        positions, wraps = seed_position_schedule_cached(L, self.index.seed_len,
                                                         self.cfg.max_seed_slots)
        return _sharded_align(
            jax.device_put(reads, NamedSharding(self.mesh, P("data"))),
            jax.device_put(quals, NamedSharding(self.mesh, P("data"))),
            self._ht["ht_entries"],
            self._ht["shard_start"], self._ht["shard_size"],
            self._ht["overflow"], self._genome, self._pieces,
            jnp.asarray(positions), jnp.asarray(wraps),
            self._ht["ck_buckets"], self._ht["ck_buckets2"],
            self._ht["ck_stash"],
            mesh=self.mesh, cfg=self.cfg.resolve_for_read_len(L),
            seed_len=self.index.seed_len,
            read_len=L, genome_size=self.genome_size, n_idx=self.n_idx,
            use_cuckoo=self._use_cuckoo)

    def align_batch(self, reads: np.ndarray, quals: np.ndarray) -> dict:
        out = self.align_batch_device(reads, quals)
        return jax.device_get(out)


def seed_position_schedule_cached(read_len, seed_len, max_slots):
    from ..utils.seed_sequencer import seed_position_schedule
    positions, wraps = seed_position_schedule(read_len, seed_len)
    S = min(max_slots, len(positions))
    return positions[:S], wraps[:S]


def _end_pipeline(reads_l, quals_l, entries_l, sstart_l, ssize_l, ovf_l,
                  genome, pieces, schedule, wraps, cfg, seed_len, read_len,
                  genome_size, n_idx, cuckoo_l=None):
    """One end's sharded candidate+score pipeline (inside shard_map).

    Returns (u, sc, single_out, budget, truncated) — the same intermediate
    contract the single-chip paired engine builds per end
    (models/paired.py:_paired_align_batch), with the seed lookup on the
    local index slice (loop-free bucket layout when cuckoo_l is present),
    hit counts psum-ed, candidates all_gather-ed, and the single-chip fast
    scoring path (compact tier ladder + bit-parallel prefilter + banded LV
    buckets) re-split over the 'index' axis.
    """
    B = reads_l.shape[0]
    S = schedule.shape[0]
    seeds = sg.seed_phase(reads_l, schedule, seed_len, entries_l,
                          sstart_l, ssize_l, ovf_l, genome_size,
                          None, cuckoo_l)
    counts_local = jnp.where(seeds["found"][:, :, None], seeds["counts"], 0)
    counts_global = jax.lax.psum(counts_local, "index")
    budget = sg.budget_phase(seeds["valid"], counts_global, wraps, cfg)
    big = sg.big_locations(genome_size)
    cands = sg.expand_phase(seeds, budget, schedule, ovf_l, cfg, seed_len,
                            read_len, cfg.cand_per_read, big=big)
    gathered = {}
    for k in ("read", "dir", "loc", "order", "offset", "round", "lp", "live"):
        g = jax.lax.all_gather(cands[k], "index")     # (n_idx, B, CPR)
        # one row per READ (all shards' candidates side by side) — the
        # shape _aggregate_rows' rowwise sort groups on
        gathered[k] = jnp.swapaxes(g, 0, 1).reshape(B, -1)
    # Rowwise back half (models/single.py round 5): the (B, Wg) candidate
    # rows are replicated over 'index' after the all_gather; the scoring
    # work — the FLOPs — is re-split over 'index' by slicing the LANE axis
    # (Wg = n_idx * CPR is divisible by construction), then all_gather-ed
    # back; the cheap rowwise replay runs replicated.
    u2 = sg._aggregate_rows(gathered, big=big)
    me = jax.lax.axis_index("index")
    Wg = u2["dir"].shape[1]
    W_slice = Wg // n_idx
    u_slice = {k: jax.lax.dynamic_slice_in_dim(v, me * W_slice, W_slice,
                                               axis=1)
               for k, v in u2.items()}
    sc_slice = sg.rowwise_score_phase(
        u_slice, reads_l, quals_l, genome, pieces, cfg, seed_len,
        read_len, genome_size)
    scalars = {k: sc_slice.pop(k)
               for k in ("score_overflow", "n_bucket2", "n_fast")}
    sc2 = {}
    for k, v in sc_slice.items():
        g = jax.lax.all_gather(v, "index")            # (n_idx, B, W_slice)
        sc2[k] = jnp.swapaxes(g, 0, 1).reshape(B, Wg)
    single_out = sg.rowwise_replay_phase(u2, sc2, budget, reads_l, S, cfg)
    single_out["score_overflow"] = jax.lax.psum(scalars["score_overflow"],
                                                "index")
    dense = sg.dense_topk_rowwise(u2, sc2, cfg.cand_per_read)
    single_out["n_found"] = jax.lax.psum(seeds["found"].sum(), "index")
    return dense, single_out, budget, cands["truncated"]


class ShardedPairedAligner:
    """Paired-end aligner over the same ('data', 'index') mesh.

    Both ends run the sharded single-end pipeline; the dense pair join +
    pair MAPQ (models/paired.py:pair_phase, the TPU shape of
    IntersectingPairedEndAligner.cpp:355-741) is per-read math and runs
    replicated within each data shard.
    """

    def __init__(self, index: GenomeIndex, mesh: Mesh, config=None,
                 **overrides):
        from ..models.paired import PairedAlignerConfig
        self.index = index
        self.mesh = mesh
        cfg = config or PairedAlignerConfig(seed_len=index.seed_len)
        if overrides:
            cfg = PairedAlignerConfig(**{**cfg.__dict__, **overrides})
        self.cfg = cfg
        self.n_data = mesh.shape["data"]
        self.n_idx = mesh.shape["index"]
        self._use_cuckoo = _use_cuckoo_lookup()
        parts = partition_index(index, self.n_idx, self._use_cuckoo)

        def put(arr, spec):
            return jax.device_put(arr, NamedSharding(mesh, spec))

        # pop each host slice as it lands on-device: at hg19 scale the
        # stacked entries are ~48 GB, and holding host + device copies
        # simultaneously would double peak RSS
        self._ht = {k: put(parts.pop(k), P("index"))
                    for k in ("ht_entries", "overflow",
                              "shard_start", "shard_size",
                              "ck_buckets", "ck_buckets2", "ck_stash")}
        from ..ops.genome_gather import pack_genome_4bit
        self._genome = put(pack_genome_4bit(
            np.ascontiguousarray(index.genome.codes)), P())
        self._pieces = put(index.genome.piece_offsets.astype(np.int32), P())
        self.genome_size = index.genome_size

    def align_batch_device(self, reads0, quals0, reads1, quals1) -> dict:
        reads0, quals0 = np.asarray(reads0), np.asarray(quals0)
        reads1, quals1 = np.asarray(reads1), np.asarray(quals1)
        B, L = reads0.shape
        if B % self.n_data:
            raise ValueError("batch must divide the data axis")
        positions, wraps = seed_position_schedule_cached(
            L, self.index.seed_len, self.cfg.max_seed_slots)
        sharded = NamedSharding(self.mesh, P("data"))
        return _sharded_align_paired(
            jax.device_put(reads0, sharded), jax.device_put(quals0, sharded),
            jax.device_put(reads1, sharded), jax.device_put(quals1, sharded),
            self._ht["ht_entries"],
            self._ht["shard_start"], self._ht["shard_size"],
            self._ht["overflow"], self._genome, self._pieces,
            jnp.asarray(positions), jnp.asarray(wraps),
            self._ht["ck_buckets"], self._ht["ck_buckets2"],
            self._ht["ck_stash"],
            mesh=self.mesh, cfg=self.cfg, seed_len=self.index.seed_len,
            read_len=L, genome_size=self.genome_size, n_idx=self.n_idx,
            use_cuckoo=self._use_cuckoo)

    def align_batch(self, reads0, quals0, reads1, quals1) -> dict:
        out = self.align_batch_device(reads0, quals0, reads1, quals1)
        return jax.device_get(out)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "cfg", "seed_len", "read_len", "genome_size",
                     "n_idx", "use_cuckoo"))
def _sharded_align_paired(reads0, quals0, reads1, quals1, ht_entries,
                          shard_start, shard_size, overflow, genome_codes,
                          piece_starts, schedule, wraps, ck_b1, ck_b2, ck_st,
                          *, mesh, cfg,
                          seed_len, read_len, genome_size, n_idx,
                          use_cuckoo=True):
    from ..models.paired import (MAPQ_LIMIT_FOR_SINGLE_HIT, MULTIPLE_HITS,
                                 NOT_FOUND, SINGLE_HIT, _dense_per_read,
                                 pair_phase)
    ecfg = cfg.end_config()

    def step(reads0_l, quals0_l, reads1_l, quals1_l, entries_l, sstart_l,
             ssize_l, ovf_l, genome, pieces, ck_b1_l, ck_b2_l, ck_st_l):
        entries_l = entries_l[0]
        sstart_l, ssize_l, ovf_l = sstart_l[0], ssize_l[0], ovf_l[0]
        cuckoo_l = dict(ck_buckets=ck_b1_l[0], ck_buckets2=ck_b2_l[0],
                        ck_stash=ck_st_l[0]) if use_cuckoo else None
        B = reads0_l.shape[0]

        ends = []
        for reads_l, quals_l in ((reads0_l, quals0_l), (reads1_l, quals1_l)):
            dense, single_out, _budget, trunc = _end_pipeline(
                reads_l, quals_l, entries_l, sstart_l, ssize_l, ovf_l,
                genome, pieces, schedule, wraps, ecfg, seed_len, read_len,
                genome_size, n_idx, cuckoo_l)
            ends.append(dict(dense=dense, single=single_out,
                             popular=single_out["popular"],
                             truncated=jax.lax.psum(trunc, "index")))

        if cfg.mate_rescue and cfg.rescue_mates > 0:
            # mirror models/paired.py: mate-window rescue on the local
            # (replicated-genome) shard; scoring is replicated across the
            # index axis — B rows, negligible next to the shard pipelines
            from ..models.paired import _append_dense, _mate_rescue_end
            rrs = []
            for e, (reads_l, quals_l) in enumerate(
                    ((reads0_l, quals0_l), (reads1_l, quals1_l))):
                rrs.append(_mate_rescue_end(
                    ends[e]["dense"], ends[1 - e]["dense"], reads_l,
                    quals_l, genome, pieces, ecfg, cfg, read_len,
                    genome_size, B))
            for e in (0, 1):
                ends[e]["dense"] = _append_dense(ends[e]["dense"], rrs[e])

        pr = pair_phase(ends[0]["dense"], ends[1]["dense"], cfg,
                        ends[0]["popular"], ends[1]["popular"])
        out = dict(pair_found=pr["pair_found"], pair_score=pr["score"],
                   pair_mapq=pr["mapq"], pair_log_pall=pr["log_pall"])
        rows = jnp.arange(B)
        for e in (0, 1):
            d = ends[e]["dense"]
            s = ends[e]["single"]
            wsel = pr["w0"] if e == 0 else pr["w1"]
            pf = pr["pair_found"]
            e_mapq = pr[f"mapq{e}"]
            mapq = jnp.where(pf, e_mapq, s["mapq"])
            out[f"result{e}"] = jnp.where(
                pf,
                jnp.where(e_mapq >= MAPQ_LIMIT_FOR_SINGLE_HIT,
                          SINGLE_HIT, MULTIPLE_HITS),
                s["result"])
            out[f"loc{e}"] = jnp.where(pf, d["loc"][rows, wsel], s["loc"])
            out[f"dir{e}"] = jnp.where(pf, d["dir"][rows, wsel],
                                       s["direction"])
            out[f"score{e}"] = jnp.where(pf, d["score"][rows, wsel],
                                         s["score"])
            out[f"mapq{e}"] = jnp.where(
                jnp.where(pf, True, s["result"] != NOT_FOUND), mapq, 0)
            out[f"truncated{e}"] = ends[e]["truncated"]
        return out

    from jax.experimental.shard_map import shard_map
    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"),
                  P("index"), P("index"), P("index"), P("index"),
                  P(), P(), P("index"), P("index"), P("index")),
        out_specs=P("data"),
        check_rep=False)
    return fn(reads0, quals0, reads1, quals1, ht_entries, shard_start,
              shard_size, overflow, genome_codes, piece_starts,
              ck_b1, ck_b2, ck_st)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "cfg", "seed_len", "read_len", "genome_size",
                     "n_idx", "use_cuckoo"))
def _sharded_align(reads, quals, ht_entries, shard_start,
                   shard_size, overflow, genome_codes, piece_starts,
                   schedule, wraps, ck_b1, ck_b2, ck_st,
                   *, mesh, cfg, seed_len, read_len,
                   genome_size, n_idx, use_cuckoo=True):

    def step(reads_l, quals_l, entries_l, sstart_l, ssize_l, ovf_l,
             genome, pieces, ck_b1_l, ck_b2_l, ck_st_l):
        # leading device axis of size 1 from shard_map: strip it
        entries_l = entries_l[0]
        sstart_l, ssize_l, ovf_l = sstart_l[0], ssize_l[0], ovf_l[0]
        cuckoo_l = dict(ck_buckets=ck_b1_l[0], ck_buckets2=ck_b2_l[0],
                        ck_stash=ck_st_l[0]) if use_cuckoo else None
        B = reads_l.shape[0]

        _dense, out, _budget, trunc = _end_pipeline(
            reads_l, quals_l, entries_l, sstart_l, ssize_l, ovf_l,
            genome, pieces, schedule, wraps, cfg, seed_len, read_len,
            genome_size, n_idx, cuckoo_l)
        out["truncated"] = jax.lax.psum(trunc, "index")
        # scalar stats don't fit P('data') out_specs; fold into a per-read vec
        out["n_lookups"] = jnp.broadcast_to(
            out.pop("n_found")[None], (B,))
        out["score_overflow_vec"] = jnp.broadcast_to(
            out.pop("score_overflow")[None], (B,))
        return out

    from jax.experimental.shard_map import shard_map
    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P("data"), P("data"),
                  P("index"), P("index"), P("index"), P("index"),
                  P(), P(), P("index"), P("index"), P("index")),
        out_specs=P("data"),
        check_rep=False)
    return fn(reads, quals, ht_entries, shard_start,
              shard_size, overflow, genome_codes, piece_starts,
              ck_b1, ck_b2, ck_st)
