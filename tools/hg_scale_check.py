"""Validate the hg19-scale index (tools/hg_scale_build.py output) by
host-probe lookups — the 32-bit-location / genome-scale correctness proof
that doesn't need the (>>HBM) table resident on a device.

For N random genome positions: pack the seed (index/seeds.py, the exact
reference 2-bit layout, Seed.h:38-51), look it up via the host probe
chain (the oracle the TPU kernels are tested against), and assert the
sampled position is among the returned locations.  Also spot-checks that
overflow lists are descending (GenomeIndex.cpp:538-620) and counts
per-seed hit sizes.  Appends a `lookup_check` block to HG_SCALE.json.

Run:  python tools/hg_scale_check.py [index_dir] [n_checks]
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np

from snap_rnaseq_tpu.index.hash_index import GenomeIndex
from snap_rnaseq_tpu.index.seeds import pack_seeds_at

IDX = sys.argv[1] if len(sys.argv) > 1 else \
    os.environ.get("SNAP_TPU_HG_DIR", "/tmp/snap_tpu_hg3g")
N = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000


def main():
    t0 = time.time()
    idx = GenomeIndex.load(IDX)
    load_s = time.time() - t0
    print(f"loaded {IDX} in {load_s:.0f}s: {idx.genome.num_bases:,} bases, "
          f"{idx.ht_keys.shape[0]:,} slots", flush=True)
    seed_len = idx.seed_len
    codes = idx.genome.codes
    rng = np.random.default_rng(0)
    pos = rng.integers(0, idx.genome.num_bases - seed_len, N)
    fwd, rc, valid = pack_seeds_at(codes, pos, seed_len)

    t1 = time.time()
    ok = miss = invalid = 0
    hit_sizes = []
    desc_ok = True
    for i in range(N):
        if not valid[i]:
            invalid += 1
            continue
        hits, rhits = idx.lookup_seed(int(fwd[i]), int(rc[i]))
        hit_sizes.append(len(hits) + len(rhits))
        if len(hits) > 1:
            desc_ok &= bool((np.diff(hits.astype(np.int64)) < 0).all())
        if np.uint32(pos[i]) in hits:
            ok += 1
        else:
            miss += 1
    check_s = time.time() - t1
    hs = np.asarray(hit_sizes)
    res = dict(n_checked=int(ok + miss), found=ok, missing=miss,
               invalid_windows=invalid,
               overflow_descending=bool(desc_ok),
               hit_size_p50=float(np.percentile(hs, 50)),
               hit_size_p99=float(np.percentile(hs, 99)),
               hit_size_max=int(hs.max()),
               load_s=round(load_s, 1), check_s=round(check_s, 1))

    # wgsim seeding accuracy at genome scale: for error-bearing reads, do
    # the looked-up seeds vote the true origin?  (The full engine needs
    # the table sharded over a multi-chip mesh at this footprint; this
    # exercises the same lookup path the device kernels mirror.)
    t2 = time.time()
    n_reads, L = 2000, 100
    sched = [0, 20, 40, 60, 80, 10, 30, 50]           # paired 8-seed schedule
    r_rng = np.random.default_rng(1)
    starts = r_rng.integers(0, idx.genome.num_bases - L - 600, n_reads)
    top_correct = cand_seen = 0
    for i in range(n_reads):
        s = int(starts[i])
        read = codes[s:s + L].copy()
        n_sub = r_rng.binomial(L, 0.01)
        if n_sub:
            ps = r_rng.integers(0, L, n_sub)
            read[ps] = (read[ps] + r_rng.integers(1, 4, n_sub)) % 4
        f, rcp, v = pack_seeds_at(read, np.asarray(sched), seed_len)
        votes = {}
        for k in range(len(sched)):
            if not v[k]:
                continue
            hits, _rh = idx.lookup_seed(int(f[k]), int(rcp[k]))
            for h in hits[:64]:
                votes[int(h) - sched[k]] = votes.get(int(h) - sched[k], 0) + 1
        if not votes:
            continue
        cand_seen += s in votes
        top = max(votes.items(), key=lambda kv: (kv[1], -abs(kv[0] - s)))[0]
        top_correct += (top == s)
    res["wgsim_seeding"] = dict(
        n_reads=n_reads, sub_rate=0.01,
        true_origin_in_candidates_pct=round(100 * cand_seen / n_reads, 2),
        top_voted_is_true_pct=round(100 * top_correct / n_reads, 2),
        check_s=round(time.time() - t2, 1))
    print(json.dumps(res, indent=1))
    assert miss == 0, f"{miss} sampled positions missing from the index"
    assert desc_ok, "overflow lists not descending"
    path = os.path.join(HERE, "HG_SCALE.json")
    if os.path.exists(path):
        blob = json.load(open(path))
        blob["lookup_check"] = res
        with open(path, "w") as f:
            json.dump(blob, f, indent=1)
        print("HG_SCALE.json updated")


if __name__ == "__main__":
    main()
