"""Multi-host scale-out tests.

Verifies (1) input range splitting partitions FASTQ records exactly
(RangeSplitter.h:37-55 semantics), (2) the multi-process jax.distributed
fleet produces byte-identical output to a single-host run (the multi-host
analog of ParallelTask determinism), and (3) cross-host stats merging.
"""
import json
import os

import numpy as np
import pytest

from snap_rnaseq_tpu.index.genome import genome_from_codes
from snap_rnaseq_tpu.index.hash_index import build_index
from snap_rnaseq_tpu.io import range_split as rs
from snap_rnaseq_tpu.utils.synth_genome import wgsim_pairs
from snap_rnaseq_tpu.utils.tables import decode_bases

N_PAIRS = 48
L = 100


@pytest.fixture(scope="module")
def mh_fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh")
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, 300_000, dtype=np.uint8)
    index = build_index(genome_from_codes(codes), seed_len=20)
    index.save(str(d / "idx"))
    r0, q0, r1, q1, p0, p1 = wgsim_pairs(codes, N_PAIRS, L, seed=1)
    for path, reads, quals, suff in ((d / "r1.fq", r0, q0, b"/1"),
                                     (d / "r2.fq", r1, q1, b"/2")):
        with open(path, "wb") as f:
            for i in range(N_PAIRS):
                f.write(b"@pair" + str(i).encode() + suff + b"\n"
                        + decode_bases(reads[i]) + b"\n+\n"
                        + bytes(quals[i] + 33) + b"\n")
    return d


def test_fastq_range_split_partitions(mh_fixture):
    d = mh_fixture
    path = str(d / "r1.fq")
    from snap_rnaseq_tpu.io.fastq import read_fastq
    all_ids = [r.rid for r in read_fastq(path)]
    for n in (1, 2, 3, 5):
        ranges = rs.split_fastq_ranges(path, n)
        assert ranges[0][0] == 0
        assert ranges[-1][1] == os.path.getsize(path)
        got = []
        for s, e in ranges:
            got.extend(r.rid for r in rs.read_fastq_range(path, s, e))
        assert got == all_ids, f"n={n}"


def test_paired_range_split_consistent(mh_fixture):
    d = mh_fixture
    p0, p1 = str(d / "r1.fq"), str(d / "r2.fq")
    for n in (2, 3):
        ranges = rs.split_paired_fastq_ranges(p0, p1, n)
        seen = []
        for r0, r1 in ranges:
            for a, b in rs.read_paired_fastq_range(p0, p1, r0, r1):
                assert a.rid.split(b"/")[0] == b.rid.split(b"/")[0]
                seen.append(a.rid)
        assert len(seen) == N_PAIRS


@pytest.mark.slow
def test_multihost_matches_single_host(mh_fixture):
    d = mh_fixture
    from snap_rnaseq_tpu.models.paired_pipeline import (PairedEndPipeline,
                                                        PairedPipelineOptions)
    from snap_rnaseq_tpu.index.hash_index import GenomeIndex
    from snap_rnaseq_tpu.parallel.multihost import launch_local

    index = GenomeIndex.load(str(d / "idx"))
    opt = PairedPipelineOptions(batch_size=64)
    pipe = PairedEndPipeline(index, options=opt, cand_per_read=32,
                             max_seed_slots=16)
    ref_out = str(d / "single.sam")
    ref_stats = pipe.run(str(d / "r1.fq"), str(d / "r2.fq"), ref_out,
                         command_line="mh-test")

    mh_out = str(d / "multi.sam")
    merged = launch_local(
        2, str(d / "idx"), (str(d / "r1.fq"), str(d / "r2.fq")), mh_out,
        paired=True, batch_size=64,
        aligner_args=dict(cand_per_read=32, max_seed_slots=16))

    def body(p):
        return [l for l in open(p, "rb") if l[:1] != b"@"]

    assert body(mh_out) == body(ref_out)
    assert merged["total_reads"] == ref_stats.total_reads == 2 * N_PAIRS
    assert merged["aligned_as_pairs"] == ref_stats.aligned_as_pairs
    assert merged["n_hosts"] == 2
