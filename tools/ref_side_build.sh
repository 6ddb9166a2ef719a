#!/bin/sh
# Reference-side pipeline for the agreement study (PARITY.md protocol):
# out-of-tree -O0 build of the reference binary, bench-genome FASTA +
# tiny GTF, reference index + transcriptome, reference paired alignment
# of the shared wgsim read set.  Everything niced; artifacts in /tmp.
set -e
R=/tmp/refbuild
A=/tmp/agree64
CACHE=${SNAP_TPU_BENCH_CACHE:-/root/bench_cache}

echo "[$(date +%T)] copy + build reference (-O0)"
if [ ! -x $R/snap-rna ]; then
  rm -rf $R && cp -r /root/reference $R
  # build fix on the out-of-tree copy: Compat.h's MS-SAL macro
  # (#define __in) clobbers a libstdc++12 parameter name; fully include
  # the std headers first so their include guards shield them
  python3 - <<'EOF'
p = '/tmp/refbuild/SNAPLib/Compat.h'
src = open(p).read()
marker = '#define __in /* nothing */'
pre = ('#include <tuple>\n#include <memory>\n#include <functional>\n'
       '#include <string>\n#include <vector>\n#include <map>\n'
       '#include <algorithm>\n#include <iostream>\n')
if pre not in src:
    src = src.replace(marker, pre + marker, 1)
    open(p, 'w').write(src)
# bool->pointer returns GCC12 rejects even with -fpermissive
for g, idxs in (('/tmp/refbuild/SNAPLib/GenomeIndex.cpp', (302, 307, 856)),
                ('/tmp/refbuild/SNAPLib/ReadSupplierQueue.cpp', (594,))):
    lines = open(g).readlines()
    for i in idxs:
        if lines[i].strip() == 'return false;':
            lines[i] = lines[i].replace('return false;', 'return NULL;')
    open(g, 'w').writelines(lines)
EOF
  cd $R && nice -n 19 make -j1 CXXFLAGS="-O0 -Wno-format -fpermissive -MMD -ISNAPLib -msse" \
    > /tmp/refbuild_make.log 2>&1
  ls -la $R/snap-rna
fi

mkdir -p $A
cd /root/repo

if [ ! -f $A/bench.fa ]; then
  echo "[$(date +%T)] write bench genome FASTA + tiny GTF"
  nice -n 19 python - <<'EOF'
import sys
sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np
from snap_rnaseq_tpu.index.hash_index import GenomeIndex
from snap_rnaseq_tpu.utils.tables import decode_bases
idx = GenomeIndex.load('/root/bench_cache/hg64_s20')
g = idx.genome
with open('/tmp/agree64/bench.fa', 'wb') as f:
    ends = np.append(g.piece_offsets[1:], g.num_bases)
    for i, name in enumerate(g.piece_names):
        s = int(g.piece_offsets[i]); e = int(ends[i]) - g.padding
        codes = np.asarray(g.codes[s:e]).copy()
        codes[codes > 3] = 0
        f.write(b'>' + name.encode() + b'\n')
        seq = decode_bases(codes)
        for o in range(0, len(seq), 70):
            f.write(seq[o:o + 70] + b'\n')
name = g.piece_names[0]
with open('/tmp/agree64/anno.gtf', 'w') as f:
    for kind, lo, hi in (("exon", 1001, 1300), ("exon", 2001, 2300)):
        f.write(f'{name}\ttest\t{kind}\t{lo}\t{hi}\t.\t+\t.\t'
                f'gene_id "G1"; transcript_id "T1";\n')
print('fasta+gtf written')
EOF
fi

if [ ! -f $A/pe_1.fq ]; then
  echo "[$(date +%T)] write shared wgsim read set (16k pairs, seed 0)"
  nice -n 19 python tools/agreement_study.py --index $CACHE/hg64_s20 \
    --n-pairs 16384 --seed 0 --cpu --write-fastq $A
fi

if [ ! -f $A/refidx/GenomeIndex ]; then
  echo "[$(date +%T)] reference index build"
  nice -n 19 $R/snap-rna index $A/bench.fa $A/refidx -t1
fi
if [ ! -f $A/tidx/GenomeIndex ]; then
  echo "[$(date +%T)] reference transcriptome build"
  nice -n 19 $R/snap-rna transcriptome $A/anno.gtf $A/bench.fa $A/tidx -t1
fi

echo "[$(date +%T)] reference paired alignment"
nice -n 19 $R/snap-rna paired $A/refidx $A/tidx $A/anno.gtf \
  $A/pe_1.fq $A/pe_2.fq -o $A/ref_pe.sam -t 1
echo "[$(date +%T)] DONE: $A/ref_pe.sam"
