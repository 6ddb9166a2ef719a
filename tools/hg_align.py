"""Align wgsim pairs against the hg19-scale (3.2 Gb) index on a sharded
virtual mesh — the regime that REQUIRES index sharding (the 48 GB tables
exceed one chip's HBM; reference: GenomeIndex.cpp:844-963 load path,
Manual.pdf section 1 "48 GB required").

Runs on the 8-virtual-device CPU mesh (1 data x 8 index): each device
holds ~6 GB of hash-table slice; lookups miss on unowned seeds, hit
counts psum over 'index', candidates all_gather — the exact dataflow a
real multi-chip pod would run over ICI.

Writes HG_ALIGN.json: recall vs wgsim truth, pair rate, truncation and
rescue counters at real hg repeat density (hit-list p99 ~17k,
HG_SCALE.json).

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        SNAP_TPU_LOOKUP=probe python tools/hg_align.py [n_pairs]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SNAP_TPU_LOOKUP", "probe")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

from snap_rnaseq_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import numpy as np
from jax.sharding import Mesh

from snap_rnaseq_tpu.index.hash_index import GenomeIndex
from snap_rnaseq_tpu.parallel.sharded import ShardedPairedAligner
from snap_rnaseq_tpu.utils.synth_genome import wgsim_pairs

CACHE = os.environ.get("SNAP_TPU_BENCH_CACHE", "/root/bench_cache")
IDX_DIR = os.environ.get("SNAP_TPU_HG_INDEX", os.path.join(CACHE, "hg3g"))
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "HG_ALIGN.json")
READ_LEN = 100
B = int(os.environ.get("SNAP_TPU_HG_BATCH", 256))


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    t0 = time.time()
    log = lambda m: print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

    log(f"loading {IDX_DIR} (mmap)")
    index = GenomeIndex.load(IDX_DIR)
    gsize = index.genome_size
    log(f"genome {gsize:,} bases, {index.n_shards} logical shards")

    devs = np.array(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devs, ("data", "index"))
    log("partitioning + uploading the index over 8 devices "
        "(~48 GB of table slices)...")
    al = ShardedPairedAligner(index, mesh, cand_per_read=64)
    log("index resident on mesh")

    # wgsim truth needs raw codes; sample fragments from the mmap'd genome
    codes = index.genome.codes          # memmap
    pad = int(index.genome.piece_offsets[0])
    body_len = gsize - pad

    rng = np.random.default_rng(0)
    stats = dict(n_pairs=0, pos0_ok=0, pos1_ok=0, pair_found=0,
                 both_pos_ok=0, truncated0=0, truncated1=0,
                 mapq_ge10_ok=0, mapq_ge10=0)
    t_align = 0.0
    done = 0
    while done < n_pairs:
        n = min(B, n_pairs - done)
        # sample a window then wgsim inside it (keeps the memmap reads
        # sequential instead of 3.2 Gb random access)
        wstart = int(rng.integers(0, body_len - 2_000_000))
        window = np.asarray(codes[pad + wstart:pad + wstart + 2_000_000])
        window = np.minimum(window, 4)          # pad codes 5 -> N for wgsim
        r0, q0, r1, q1, p0, p1 = wgsim_pairs(
            window, n, READ_LEN, seed=int(rng.integers(1 << 30)))
        if n < B:
            padn = B - n
            r0 = np.pad(r0, ((0, padn), (0, 0)), constant_values=4)
            r1 = np.pad(r1, ((0, padn), (0, 0)), constant_values=4)
            q0 = np.pad(q0, ((0, padn), (0, 0)), constant_values=ord("!"))
            q1 = np.pad(q1, ((0, padn), (0, 0)), constant_values=ord("!"))
        ta = time.time()
        out = al.align_batch(r0, q0, r1, q1)
        t_align += time.time() - ta
        true0 = pad + wstart + p0
        true1 = pad + wstart + p1
        # engine locations are uint32 bit patterns in int32 arrays
        loc0 = out["loc0"][:n].astype(np.int32).view(
            np.uint32).astype(np.int64)
        loc1 = out["loc1"][:n].astype(np.int32).view(
            np.uint32).astype(np.int64)
        ok0 = np.abs(loc0 - true0) <= 2
        ok1 = np.abs(loc1 - true1) <= 2
        pf = out["pair_found"][:n].astype(bool)
        mq = np.minimum(out["mapq0"][:n], out["mapq1"][:n])
        stats["n_pairs"] += n
        stats["pos0_ok"] += int(ok0.sum())
        stats["pos1_ok"] += int(ok1.sum())
        stats["both_pos_ok"] += int((ok0 & ok1).sum())
        stats["pair_found"] += int(pf.sum())
        stats["truncated0"] += int(np.asarray(out["truncated0"]).sum())
        stats["truncated1"] += int(np.asarray(out["truncated1"]).sum())
        hi = mq >= 10
        stats["mapq_ge10"] += int(hi.sum())
        stats["mapq_ge10_ok"] += int((hi & ok0 & ok1).sum())
        done += n
        if done % (B * 8) == 0 or done >= n_pairs:
            log(f"{done}/{n_pairs} pairs; "
                f"recall0 {stats['pos0_ok']/done:.4f} "
                f"recall1 {stats['pos1_ok']/done:.4f} "
                f"pair {stats['pair_found']/done:.4f} "
                f"({done/max(t_align,1e-9):,.0f} pairs/s align)")
            result = dict(
                index=IDX_DIR, genome_bases=int(gsize),
                mesh="1 data x 8 index (virtual CPU)",
                lookup=os.environ.get("SNAP_TPU_LOOKUP"),
                batch_pairs=B, read_len=READ_LEN,
                recall0=stats["pos0_ok"] / done,
                recall1=stats["pos1_ok"] / done,
                pair_recall=stats["both_pos_ok"] / done,
                pair_found_rate=stats["pair_found"] / done,
                mapq_ge10_precision=(stats["mapq_ge10_ok"]
                                     / max(stats["mapq_ge10"], 1)),
                align_pairs_per_s=done / max(t_align, 1e-9),
                wall_s=round(time.time() - t0, 1),
                **stats)
            with open(OUT, "w") as f:
                json.dump(result, f, indent=1)
    log(f"done -> {OUT}")


if __name__ == "__main__":
    main()
