"""Device-op profile of the paired engine via jax.profiler + raw xplane.

The per-phase fori-loop tool (phase_profile.py) keeps hitting multi-minute
remote compiles through the axon tunnel; this is the method that actually
produced the round-4 numbers (PERF.md): trace a few real engine batches
with jax.profiler, then parse the xplane.pb protobuf directly
(tensorflow.tsl; tensorboard-plugin-profile's converter is version-broken
in this image) and aggregate per-op device self-time.

Usage: python tools/xprof_dump.py [n_top]
Env:   SNAP_TPU_BENCH_CACHE / SNAP_TPU_BENCH_BASES as elsewhere.
Prints a per-op table (device self-time, ms/batch) plus a per-category
rollup keyed on the op-name prefix XLA assigns (fusion, gather, sort, ...).
"""
import glob
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snap_rnaseq_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from snap_rnaseq_tpu.index.hash_index import GenomeIndex
from snap_rnaseq_tpu.models.paired import PairedAligner
from snap_rnaseq_tpu.utils.synth_genome import wgsim_pairs

CACHE = os.environ.get("SNAP_TPU_BENCH_CACHE", "/root/bench_cache")
GENOME_BASES = int(os.environ.get("SNAP_TPU_BENCH_BASES", 64_000_000))
B = int(os.environ.get("SNAP_TPU_PROF_B", 1024))
N_BATCH = int(os.environ.get("SNAP_TPU_PROF_BATCHES", 4))
READ_LEN = 100


def collect_xplane(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    per_op = defaultdict(float)     # op name -> total self ns
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name:
                continue
            emeta = plane.event_metadata
            for line in plane.lines:
                # XLA Ops line carries per-op self time; step lines don't
                if "XLA Ops" not in line.name and "Ops" not in line.name:
                    continue
                for ev in line.events:
                    name = emeta[ev.metadata_id].name
                    per_op[name] += ev.duration_ps / 1e3  # ps -> ns
    return per_op


def main():
    n_top = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    t0 = time.time()
    index = GenomeIndex.load(
        os.path.join(CACHE, f"hg{GENOME_BASES // 1_000_000}_s20"))
    codes = np.asarray(index.genome.codes)
    pad = int(index.genome.piece_offsets[0])
    body = codes[pad:pad + GENOME_BASES]
    batches = []
    for s in range(N_BATCH):
        r0, q0, r1, q1, _, _ = wgsim_pairs(body, B, READ_LEN, seed=s)
        batches.append(tuple(jnp.asarray(x) for x in (r0, q0, r1, q1)))

    pa = PairedAligner(index, cand_per_read=64)
    out = pa.align_batch_device(*batches[0])
    np.asarray(out["pair_found"])          # compile + program-load, unsynced
    print(f"[{time.time()-t0:.1f}s] engine warm; tracing {N_BATCH} batches",
          flush=True)

    logdir = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(logdir):
        for b in batches:
            out = pa.align_batch_device(*b)
        np.asarray(out["pair_found"])
    print(f"[{time.time()-t0:.1f}s] traced -> {logdir}", flush=True)

    per_op = collect_xplane(logdir)
    total_ms = sum(per_op.values()) / 1e6
    print(f"\ntotal device self-time: {total_ms:.1f} ms over {N_BATCH} "
          f"batches -> {total_ms / N_BATCH:.1f} ms/batch "
          f"({2 * B * N_BATCH / (total_ms / 1e3):,.0f} reads/s device-bound)")

    rollup = defaultdict(float)
    for name, ns in per_op.items():
        cat = re.split(r"[.\d]", name, 1)[0]
        rollup[cat] += ns
    print("\nper-category (ms/batch):")
    for cat, ns in sorted(rollup.items(), key=lambda kv: -kv[1]):
        print(f"  {ns / 1e6 / N_BATCH:8.2f}  {cat}")

    print(f"\ntop {n_top} ops (ms/batch):")
    for name, ns in sorted(per_op.items(), key=lambda kv: -kv[1])[:n_top]:
        print(f"  {ns / 1e6 / N_BATCH:8.3f}  {name}")


if __name__ == "__main__":
    main()
