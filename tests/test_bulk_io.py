"""Bulk (vectorized) I/O path parity vs the per-read path.

The bulk FASTQ ingest + bulk SAM emitter (io/bulk.py) must be
byte-identical to the SamRecordBuilder path on the same corpus — the
reference pins its output with golden-SAM diffs (tests/datatest.py);
here the per-read path IS the golden oracle.
"""
import os

import numpy as np
import pytest

from snap_rnaseq_tpu.index.genome import genome_from_codes
from snap_rnaseq_tpu.index.hash_index import build_index
from snap_rnaseq_tpu.models.paired import PairedAligner
from snap_rnaseq_tpu.models.paired_pipeline import (PairedEndPipeline,
                                                    PairedPipelineOptions)
from snap_rnaseq_tpu.utils.tables import decode_bases, reverse_complement_codes


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("bulk")
    rng = np.random.default_rng(7)
    G = 60000
    codes = rng.integers(0, 4, G, dtype=np.uint8)
    g = genome_from_codes(codes)
    idx = build_index(g, seed_len=20)

    L, FRAG = 100, 260
    pairs = []
    q = b"I" * L

    def fr_pair(s, sub0=0, sub1=0):
        fwd = codes[s:s + L].copy()
        rc = reverse_complement_codes(codes[s + FRAG - L:s + FRAG])
        for arr, k in ((fwd, sub0), (rc, sub1)):
            for _ in range(k):
                p = int(rng.integers(0, L))
                arr[p] = (arr[p] + int(rng.integers(1, 4))) % 4
        return decode_bases(fwd), decode_bases(rc)

    for i in range(24):
        s = int(rng.integers(0, G - FRAG))
        a, b = fr_pair(s, sub0=i % 3, sub1=(i + 1) % 3)
        pairs.append((b"p%d/1" % i, a, q, b"p%d/2" % i, b, q))
    # clipping: trailing '#' quality run on read0 (still >= 50 bases left)
    s = int(rng.integers(0, G - FRAG))
    a, b = fr_pair(s)
    pairs.append((b"clip/1", a, b"I" * 90 + b"#" * 10, b"clip/2", b, q))
    # leading '#' run on read1
    s = int(rng.integers(0, G - FRAG))
    a, b = fr_pair(s)
    pairs.append((b"clipf/1", a, q, b"clipf/2", b, b"#" * 8 + b"I" * 92))
    # one all-N end (useless, mate still aligns)
    s = int(rng.integers(0, G - FRAG))
    a, b = fr_pair(s)
    pairs.append((b"halfn/1", b"N" * L, q, b"halfn/2", b, q))
    # both ends hopeless -> filtered without aligning
    pairs.append((b"badn/1", b"N" * L, q, b"badn/2", b"N" * L, q))
    # quality-gate failure on read0 (reference consults only read0)
    s = int(rng.integers(0, G - FRAG))
    a, b = fr_pair(s)
    pairs.append((b"lowq/1", a, b"%" * L, b"lowq/2", b, q))
    # id forms: spaces, no /1 suffix
    s = int(rng.integers(0, G - FRAG))
    a, b = fr_pair(s)
    pairs.append((b"spaced extra", a, q, b"spaced extra", b, q))
    # random (unmappable) pair
    pairs.append((b"rand/1",
                  decode_bases(rng.integers(0, 4, L, dtype=np.uint8)),
                  q,
                  b"rand/2",
                  decode_bases(rng.integers(0, 4, L, dtype=np.uint8)),
                  q))

    with open(d / "r1.fq", "wb") as f0, open(d / "r2.fq", "wb") as f1:
        for id0, s0, q0, id1, s1, q1 in pairs:
            f0.write(b"@" + id0 + b"\n" + s0 + b"\n+\n" + q0 + b"\n")
            f1.write(b"@" + id1 + b"\n" + s1 + b"\n+\n" + q1 + b"\n")
    aligner = PairedAligner(idx, cand_per_read=16, max_seed_slots=16)
    return d, idx, aligner, len(pairs)


def _run(d, idx, aligner, name, bulk, **opt_kw):
    opt = PairedPipelineOptions(batch_size=16, **opt_kw)
    pipe = PairedEndPipeline(idx, options=opt, aligner=aligner)
    out = d / name
    os.environ["SNAP_TPU_BULK_IO"] = "1" if bulk else "0"
    try:
        stats = pipe.run(str(d / "r1.fq"), str(d / "r2.fq"), str(out),
                         command_line="parity-test")
    finally:
        os.environ.pop("SNAP_TPU_BULK_IO", None)
    return out, stats


def _body(path):
    with open(path, "rb") as f:
        return f.read()


def _split(path):
    header, body = [], []
    with open(path, "rb") as f:
        for line in f:
            (header if line.startswith(b"@") else body).append(line)
    return header, body


def test_bulk_matches_legacy_sam(corpus):
    """Same records (multiset) + same stats.  Byte order differs only
    because the legacy path emits filtered pairs out of input order (the
    bulk path preserves input order, like the reference's per-pair loop,
    PairedAligner.cpp:547)."""
    d, idx, aligner, n = corpus
    out_b, st_b = _run(d, idx, aligner, "bulk.sam", True)
    out_l, st_l = _run(d, idx, aligner, "legacy.sam", False)
    hb, bb = _split(out_b)
    hl, bl = _split(out_l)
    assert hb == hl
    assert sorted(bb) == sorted(bl)
    assert st_b.total_reads == st_l.total_reads == 2 * n
    assert st_b.useful_reads == st_l.useful_reads
    assert st_b.single_hits == st_l.single_hits
    assert st_b.multi_hits == st_l.multi_hits
    assert st_b.not_found == st_l.not_found
    assert st_b.aligned_as_pairs == st_l.aligned_as_pairs
    assert (st_b.mapq_histogram == st_l.mapq_histogram).all()
    assert (st_b.distance_histogram.counts
            == st_l.distance_histogram.counts).all()
    assert (st_b.score_histogram.counts
            == st_l.score_histogram.counts).all()


def test_bulk_byte_exact_clean_corpus(corpus, tmp_path):
    """On a corpus with no filtered-out pairs the two paths are
    byte-identical, including clipping, RC, mismatch CIGARs, TLEN."""
    d, idx, aligner, n = corpus
    # drop the three pairs the reference filters before aligning
    skip = (b"@badn", b"@lowq")
    for r in ("r1", "r2"):
        lines = _body(d / f"{r}.fq").split(b"\n")
        keep = []
        for i in range(0, len(lines) - 1, 4):
            if not lines[i].startswith(skip):
                keep += lines[i:i + 4]
        with open(tmp_path / f"{r}.fq", "wb") as f:
            f.write(b"\n".join(keep) + b"\n")
    opt = PairedPipelineOptions(batch_size=16)
    outs = {}
    for tag, bulk in (("b", True), ("l", False)):
        pipe = PairedEndPipeline(idx, options=opt, aligner=aligner)
        os.environ["SNAP_TPU_BULK_IO"] = "1" if bulk else "0"
        try:
            pipe.run(str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq"),
                     str(tmp_path / f"out_{tag}.sam"),
                     command_line="parity-test")
        finally:
            os.environ.pop("SNAP_TPU_BULK_IO", None)
        outs[tag] = _body(tmp_path / f"out_{tag}.sam")
    assert outs["b"] == outs["l"]


def test_bulk_matches_legacy_sorted(corpus):
    d, idx, aligner, n = corpus
    out_b, _ = _run(d, idx, aligner, "bulk_s.sam", True, sorted_output=True)
    out_l, _ = _run(d, idx, aligner, "legacy_s.sam", False,
                    sorted_output=True)
    hb, bb = _split(out_b)
    hl, bl = _split(out_l)
    assert hb == hl
    assert sorted(bb) == sorted(bl)


def test_bulk_matches_legacy_filter_a(corpus):
    d, idx, aligner, n = corpus
    out_b, _ = _run(d, idx, aligner, "bulk_a.sam", True, pass_filter="a")
    out_l, _ = _run(d, idx, aligner, "legacy_a.sam", False, pass_filter="a")
    hb, bb = _split(out_b)
    hl, bl = _split(out_l)
    assert hb == hl
    assert sorted(bb) == sorted(bl)


def test_bulk_gz_roundtrip(corpus):
    """gz FASTQ in, gz SAM out through the bulk path."""
    import gzip
    d, idx, aligner, n = corpus
    for r in ("r1", "r2"):
        with open(d / f"{r}.fq", "rb") as f, \
                gzip.open(d / f"{r}.fq.gz", "wb") as z:
            z.write(f.read())
    opt = PairedPipelineOptions(batch_size=16)
    pipe = PairedEndPipeline(idx, options=opt, aligner=aligner)
    stats = pipe.run(str(d / "r1.fq.gz"), str(d / "r2.fq.gz"),
                     str(d / "bulk_gz.sam.gz"), command_line="parity-test")
    assert stats.total_reads == 2 * n
    plain = _body(d / "bulk.sam") if (d / "bulk.sam").exists() else None
    got = gzip.decompress(_body(d / "bulk_gz.sam.gz"))
    if plain is not None:
        assert got == plain


def test_bulk_fastq_scan_chunks(tmp_path):
    """Chunked scanning reassembles records across chunk boundaries."""
    from snap_rnaseq_tpu.io.bulk import scan_fastq_stream
    rng = np.random.default_rng(1)
    path = tmp_path / "t.fq"
    want = []
    with open(path, "wb") as f:
        for i in range(500):
            L = int(rng.integers(30, 150))
            seq = decode_bases(rng.integers(0, 4, L, dtype=np.uint8))
            f.write(b"@read_%d some desc\n" % i + seq + b"\n+\n"
                    + b"I" * L + b"\n")
            want.append((b"read_%d some desc" % i, seq))
    got = []
    for buf, recs in scan_fastq_stream(path, chunk_bytes=4096):
        for io_, il, so, sl, qo in recs:
            got.append((buf[io_:io_ + il], buf[so:so + sl]))
    assert got == want
