"""Measure the reference binary's reads/s on this host -> BASELINE_MEASURED.json.

bench.py's vs_baseline divides by a 32-thread CPU SNAP estimate.  By default
that is a documented constant; this tool replaces it with a measurement of an
actual reference binary (built out-of-tree — see PARITY.md for the build
recipe) on the same read shape bench.py uses.

Usage:
    python -m snap_rnaseq_tpu.tools.measure_reference_baseline \
        --ref-bin /tmp/refbuild/snap-rna \
        --genome-idx <dir> --transcriptome-idx <dir> --gtf <file> \
        --reads <fastq> [--threads-factor 20] [--opt-factor 1.0]

threads-factor extrapolates the single-thread measurement to the reference's
32-thread operating point (the reference Manual's scaling); opt-factor
corrects for a deoptimized oracle build (-O0 ~ 2-4x slower than -O3 — set it
explicitly if your binary is -O0, and say so in your report).  Both factors
are recorded in the output so the extrapolation is auditable.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time


def measure(ref_bin, gidx, tidx, gtf, reads, threads=1):
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "out.sam")
        t0 = time.time()
        proc = subprocess.run(
            [ref_bin, "single", gidx, tidx, gtf, reads,
             "-o", out, "-t", str(threads)],
            capture_output=True, text=True, cwd=tmp)
        wall = time.time() - t0
        n_reads = sum(1 for _ in open(reads)) // 4
        stats_rps = None
        m = re.search(r"(\d+)\s+(\d+)\s*\(at:", proc.stdout)
        if m:
            stats_rps = float(m.group(2))
        return dict(wall_s=wall, n_reads=n_reads,
                    wall_reads_per_sec=n_reads / wall,
                    stats_reads_per_sec=stats_rps,
                    returncode=proc.returncode)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ref-bin", required=True)
    p.add_argument("--genome-idx", required=True)
    p.add_argument("--transcriptome-idx", required=True)
    p.add_argument("--gtf", required=True)
    p.add_argument("--reads", required=True)
    p.add_argument("--threads-factor", type=float, default=20.0,
                   help="1-thread -> 32-thread scaling (Manual's figure)")
    p.add_argument("--opt-factor", type=float, default=1.0,
                   help=">1 if the measured binary is deoptimized (-O0)")
    p.add_argument("-o", "--output",
                   default=os.path.join(os.path.dirname(os.path.dirname(
                       os.path.dirname(os.path.abspath(__file__)))),
                       "BASELINE_MEASURED.json"))
    a = p.parse_args(argv)

    r = measure(a.ref_bin, a.genome_idx, a.transcriptome_idx, a.gtf, a.reads)
    if r["returncode"] != 0:
        print("reference binary failed", file=sys.stderr)
        return 1
    one_t = r["stats_reads_per_sec"] or r["wall_reads_per_sec"]
    est = one_t * a.threads_factor * a.opt_factor
    payload = dict(
        reads_per_sec_1t_measured=one_t,
        threads_factor=a.threads_factor,
        opt_factor=a.opt_factor,
        reads_per_sec_32t_estimate=est,
        raw=r,
    )
    with open(a.output, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
