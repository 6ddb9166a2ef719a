"""Position/MAPQ agreement study vs the reference binary at scale.

VERDICT r2 item #10: quantify the engine's documented replay deviations
(models/single.py:24-30) on >= 1M reads by aligning the SAME wgsim pairs
with both the reference snap-rna binary (built out-of-tree, PARITY.md
recipe) and our paired engine, then reporting the distribution of
position and MAPQ differences plus a wgsim-truth adjudication of every
disagreement (who matched the simulated origin).

Two-step flow (the reference side runs on CPU; ours prefers the TPU):

  1. --write-fastq: generate N wgsim pairs from the index's genome and
     dump pe_1.fq/pe_2.fq (+ true_p0/p1.npy) for the reference binary:
       python tools/agreement_study.py --index <dir> --n-pairs 500000 \
           --write-fastq /tmp/agree250
       /tmp/refbuild/snap-rna paired <ref-idx> <tidx> <gtf> \
           /tmp/agree250/pe_1.fq /tmp/agree250/pe_2.fq -o ref_pe.sam -t 1
  2. default: align the same pairs with our engine and compare against
     --ref-sam, writing a JSON summary (+ a markdown table on stdout).

Positions are compared 1-based piece-relative, exact match only (the
reference emits a single location per mate); MAPQ deltas are histogrammed.
Reference metric rows: SAM.cpp:820-975 (POS), mapq.h:32-65 (MAPQ).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np


def gen_pairs(index, n_pairs, read_len, seed):
    from snap_rnaseq_tpu.utils.synth_genome import wgsim_pairs
    codes = np.asarray(index.genome.codes)
    pad = int(index.genome.piece_offsets[0])
    body = codes[pad:index.genome.num_bases - pad]
    return pad, wgsim_pairs(body, n_pairs, read_len, seed=seed)


def write_fastq(outdir, n_pairs, read_len, gen):
    from snap_rnaseq_tpu.utils.tables import decode_bases
    os.makedirs(outdir, exist_ok=True)
    r0, q0, r1, q1, p0, p1 = gen
    qual = b"I" * read_len
    for mate, r in ((1, r0), (2, r1)):
        with open(f"{outdir}/pe_{mate}.fq", "wb") as f:
            for lo in range(0, n_pairs, 65536):
                hi = min(lo + 65536, n_pairs)
                flat = decode_bases(r[lo:hi].reshape(-1))
                f.write(b"".join(
                    b"@p%d/%d\n%s\n+\n%s\n"
                    % (i, mate,
                       flat[(i - lo) * read_len:(i - lo + 1) * read_len],
                       qual)
                    for i in range(lo, hi)))
    np.save(f"{outdir}/true_p0.npy", p0)
    np.save(f"{outdir}/true_p1.npy", p1)
    print(f"{n_pairs} pairs written to {outdir}", flush=True)


def parse_ref_sam(path):
    """(qname, mate) -> (pos, mapq) for primary mapped records."""
    ref = {}
    with open(path) as f:
        for line in f:
            if line.startswith("@"):
                continue
            fl = line.split("\t", 5)
            flag = int(fl[1])
            if flag & 0x104:                  # secondary or unmapped
                continue
            ref[(fl[0], 1 if flag & 0x80 else 0)] = (int(fl[3]), int(fl[4]))
    return ref


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True, help="our GenomeIndex dir")
    p.add_argument("--n-pairs", type=int, default=500_000)
    p.add_argument("--read-len", type=int, default=100)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--write-fastq", metavar="DIR",
                   help="dump reads for the reference binary and exit")
    p.add_argument("--ref-sam", help="reference binary paired SAM output")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--out-json", default="/tmp/agreement_study.json")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (default: session backend)")
    p.add_argument("--engine-json", default="{}",
                   help="PairedAlignerConfig overrides as JSON "
                        "(budget/rescue tuning A/Bs)")
    a = p.parse_args(argv)

    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from snap_rnaseq_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    from snap_rnaseq_tpu.index.hash_index import GenomeIndex

    idx = GenomeIndex.load(a.index)
    pad, gen = gen_pairs(idx, a.n_pairs, a.read_len, a.seed)
    if a.write_fastq:
        write_fastq(a.write_fastq, a.n_pairs, a.read_len, gen)
        return 0
    if not a.ref_sam:
        p.error("--ref-sam required unless --write-fastq")

    from snap_rnaseq_tpu.models.paired import PairedAligner
    r0, q0, r1, q1, p0, p1 = gen
    al = PairedAligner(idx, **json.loads(a.engine_json))
    B = a.batch
    keys = ("loc0", "loc1", "mapq0", "mapq1", "result0", "result1",
            "pair_found")
    acc = {k: [] for k in keys}
    t0 = time.time()
    for s in range(0, a.n_pairs, B):
        n = min(B, a.n_pairs - s)
        pad_n = B - n
        args = []
        for x in (r0, q0, r1, q1):
            xb = x[s:s + n]
            if pad_n:
                xb = np.concatenate([xb, np.zeros((pad_n,) + x.shape[1:],
                                                  x.dtype)])
            args.append(xb)
        out = al.align_batch(*args)
        for k in keys:
            acc[k].append(np.asarray(out[k])[:n])
        if s % (B * 64) == 0:
            done = s + n
            print(f"  aligned {done}/{a.n_pairs} "
                  f"({2 * done / (time.time() - t0):,.0f} reads/s)",
                  flush=True)
    res = {k: np.concatenate(v) for k, v in acc.items()}
    align_s = time.time() - t0

    ref = parse_ref_sam(a.ref_sam)
    truth = (p0, p1)
    compared = mism = mapq_exact = 0
    dm_hist = {}
    dpos_class = {"ours_truth": 0, "ref_truth": 0, "both_off": 0}
    mism_hi = ours_hi_truth = ref_hi_truth = 0
    ref_only = ours_only = 0
    for i in range(a.n_pairs):
        qn = f"p{i}"
        for mate in (0, 1):
            got = ref.get((qn, mate))
            found = int(res[f"result{mate}"][i]) != 0
            if got is None:
                ours_only += found
                continue
            if not found:
                ref_only += 1
                continue
            rpos, rmq = got
            ours = int(res[f"loc{mate}"][i]) - pad + 1
            mq = int(res[f"mapq{mate}"][i])
            compared += 1
            d = abs(mq - rmq)
            dm_hist[d] = dm_hist.get(d, 0) + 1
            mapq_exact += (d == 0)
            if ours != rpos:
                mism += 1
                t = int(truth[mate][i]) + 1
                o_t, r_t = abs(ours - t) <= 2, abs(rpos - t) <= 2
                dpos_class["ours_truth" if o_t and not r_t else
                           "ref_truth" if r_t and not o_t else
                           "both_off"] += 1
                if mq > 10 and rmq > 10:
                    mism_hi += 1
                    ours_hi_truth += o_t
                    ref_hi_truth += r_t

    summary = dict(
        n_pairs=a.n_pairs, read_len=a.read_len, seed=a.seed,
        index=a.index, ref_sam=a.ref_sam,
        records_compared=compared,
        position_exact_pct=round(100 * (1 - mism / max(compared, 1)), 4),
        position_mismatches=mism,
        mismatch_truth_adjudication=dpos_class,
        high_mapq_mismatches=mism_hi,
        high_mapq_ours_match_truth=ours_hi_truth,
        high_mapq_ref_match_truth=ref_hi_truth,
        mapq_exact_pct=round(100 * mapq_exact / max(compared, 1), 4),
        dmapq_hist={str(k): v for k, v in sorted(dm_hist.items())},
        ref_aligned_we_missed=ref_only,
        we_aligned_ref_missed=ours_only,
        engine_align_s=round(align_s, 1),
        engine_reads_per_s=round(2 * a.n_pairs / align_s),
    )
    print(json.dumps(summary, indent=1))
    with open(a.out_json, "w") as f:
        json.dump(summary, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
