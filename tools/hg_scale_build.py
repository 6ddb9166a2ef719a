"""hg19-scale index-build proof (VERDICT r2 item #3, host-side half).

Builds a 3.2 Gbase, 24-chromosome synthetic genome with human-like repeat
structure (utils/synth_genome.hg_like_genome) and runs the memory-bounded
chunked index builder (index/hash_index.build_index_chunked) at the
reference's hg19 operating point (seed_len 20, 32-bit location space,
GenomeIndex.cpp:371-375).  Records build bases/s — the reference prints
the same metric at build end (GenomeIndex.cpp:290-291) — plus table and
overflow statistics, into HG_SCALE.json at the repo root.

Run:  python tools/hg_scale_build.py [n_bases]  (default 3.2e9)
Artifacts: genome + index under $SNAP_TPU_HG_DIR (default
/tmp/snap_tpu_hg3g); JSON summary + progress log printed to stdout.
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np

from snap_rnaseq_tpu.index.genome import Genome
from snap_rnaseq_tpu.index.hash_index import build_index_chunked
from snap_rnaseq_tpu.utils.synth_genome import hg_like_genome
from snap_rnaseq_tpu.utils.tables import BASE_PAD

N_BASES = int(float(sys.argv[1])) if len(sys.argv) > 1 else 3_200_000_000
N_CHROMS = 24
SEED_LEN = 20
OUT = os.environ.get("SNAP_TPU_HG_DIR", "/tmp/snap_tpu_hg3g")
PAD = 500


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    os.makedirs(OUT, exist_ok=True)
    t0 = time.time()
    # --- genome synthesis (24 chromosomes, hg-like repeat mix) ---
    per = N_BASES // N_CHROMS
    pad = np.full(PAD, BASE_PAD, dtype=np.uint8)
    parts, names, offsets = [], [], []
    pos = 0
    for c in range(N_CHROMS):
        t = time.time()
        chrom = hg_like_genome(per, seed=100 + c)
        parts.append(pad)
        pos += PAD
        names.append(f"chr{c + 1}")
        offsets.append(pos)
        parts.append(chrom)
        pos += chrom.size
        log(f"chr{c + 1}: {chrom.size:,} bases in {time.time() - t:.1f}s")
    parts.append(pad)
    flat = np.concatenate(parts)
    del parts
    genome = Genome(codes=flat, piece_names=names,
                    piece_offsets=np.asarray(offsets, dtype=np.int64),
                    padding=PAD)
    synth_s = time.time() - t0
    log(f"genome: {genome.num_bases:,} flat bases, {N_CHROMS} pieces, "
        f"synth {synth_s:.0f}s")

    # --- chunked build (the memory-bounded path, bit-identical output) ---
    t1 = time.time()
    idx = build_index_chunked(genome, seed_len=SEED_LEN, verbose=True)
    build_s = time.time() - t1
    bases_per_s = genome.num_bases / build_s
    log(f"build: {build_s:.0f}s = {bases_per_s:,.0f} bases/s")

    occupied = int((idx.ht_val1 != 0xFFFFFFFE).sum())
    n_overflow = int(idx.overflow.shape[0])
    summary = {
        "n_bases": int(genome.num_bases),
        "n_chromosomes": N_CHROMS,
        "seed_len": SEED_LEN,
        "synth_s": round(synth_s, 1),
        "build_s": round(build_s, 1),
        "build_bases_per_s": round(bases_per_s),
        "total_slots": int(idx.ht_keys.shape[0]),
        "occupied_slots": occupied,
        "overflow_entries": n_overflow,
        "ht_bytes": int(idx.ht_keys.nbytes + idx.ht_val1.nbytes
                        + idx.ht_val2.nbytes),
        "overflow_bytes": int(idx.overflow.nbytes),
        "host": "1-core CPU (this bench host)",
    }
    log(json.dumps(summary))
    with open(os.path.join(HERE, "HG_SCALE.json"), "w") as f:
        json.dump(summary, f, indent=1)
    log("HG_SCALE.json written")

    t2 = time.time()
    idx.save(OUT)
    summary["save_s"] = round(time.time() - t2, 1)
    with open(os.path.join(HERE, "HG_SCALE.json"), "w") as f:
        json.dump(summary, f, indent=1)
    log(f"saved to {OUT} in {time.time() - t2:.0f}s")


if __name__ == "__main__":
    main()
