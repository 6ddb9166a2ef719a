#!/bin/sh
# 1M-read (500k-pair) agreement study vs the reference binary on the
# 250 Mb hg-like genome — the round-3 AGREEMENT_1M.json protocol
# (PARITY.md), re-run against the current engine (VERDICT r5 #4).
# Requires tools/ref_side_build.sh to have built /tmp/refbuild/snap-rna.
set -e
R=/tmp/refbuild
A=/tmp/agree250
CACHE=${SNAP_TPU_BENCH_CACHE:-/root/bench_cache}
IDX=$CACHE/hg250_s20
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/snap_tpu_jax_cache
mkdir -p $A

if [ ! -f $IDX/index.json ]; then
  echo "[$(date +%T)] build our 250Mb index"
  nice -n 19 python - <<EOF
import sys
sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
from snap_rnaseq_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
from snap_rnaseq_tpu.index.genome import genome_from_codes
from snap_rnaseq_tpu.index.hash_index import build_index
from snap_rnaseq_tpu.utils.synth_genome import hg_like_genome
codes = hg_like_genome(250_000_000, seed=0)
build_index(genome_from_codes(codes), seed_len=20).save('$IDX')
print('saved $IDX')
EOF
fi

if [ ! -f $A/bench.fa ]; then
  echo "[$(date +%T)] write 250Mb FASTA + tiny GTF"
  nice -n 19 python - <<EOF
import sys, numpy as np
sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
from snap_rnaseq_tpu.index.hash_index import GenomeIndex
from snap_rnaseq_tpu.utils.tables import decode_bases
g = GenomeIndex.load('$IDX').genome
with open('$A/bench.fa', 'wb') as f:
    ends = np.append(g.piece_offsets[1:], g.num_bases)
    for i, name in enumerate(g.piece_names):
        s = int(g.piece_offsets[i]); e = int(ends[i]) - g.padding
        codes = np.asarray(g.codes[s:e]).copy(); codes[codes > 3] = 0
        f.write(b'>' + name.encode() + b'\n')
        seq = decode_bases(codes)
        for o in range(0, len(seq), 70):
            f.write(seq[o:o + 70] + b'\n')
name = g.piece_names[0]
with open('$A/anno.gtf', 'w') as f:
    for lo, hi in ((1001, 1300), (2001, 2300)):
        f.write(f'{name}\ttest\texon\t{lo}\t{hi}\t.\t+\t.\t'
                f'gene_id "G1"; transcript_id "T1";\n')
print('fasta+gtf written')
EOF
fi

if [ ! -f $A/pe_1.fq ]; then
  echo "[$(date +%T)] write 500k wgsim pairs (seed 1)"
  nice -n 19 python tools/agreement_study.py --index $IDX \
    --n-pairs 500000 --seed 1 --cpu --write-fastq $A
fi

if [ ! -f $A/refidx/GenomeIndex ]; then
  echo "[$(date +%T)] reference index build (250Mb)"
  nice -n 19 $R/snap-rna index $A/bench.fa $A/refidx -t1
fi
if [ ! -f $A/tidx/GenomeIndex ]; then
  nice -n 19 $R/snap-rna transcriptome $A/anno.gtf $A/bench.fa $A/tidx -t1
fi

if [ ! -f $A/ref_pe.sam ]; then
  echo "[$(date +%T)] reference paired alignment (1M reads)"
  nice -n 19 $R/snap-rna paired $A/refidx $A/tidx $A/anno.gtf \
    $A/pe_1.fq $A/pe_2.fq -o $A/ref_pe.sam -t 1
fi

echo "[$(date +%T)] our engine + comparison (CPU backend)"
nice -n 19 python tools/agreement_study.py --index $IDX \
  --n-pairs 500000 --seed 1 --cpu --ref-sam $A/ref_pe.sam \
  --out-json /root/repo/AGREEMENT_1M.json
echo "[$(date +%T)] DONE -> AGREEMENT_1M.json"
