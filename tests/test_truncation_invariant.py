"""Flood-read truncation invariant (VERDICT r4 #8).

On a repeat-dense batch the candidate budget truncates hit lists
constantly (the hg regime: per-end hit totals p99 ~17k, HG_SCALE.json).
The mitigations — rare-seed-first slot filling, the 4x overflow tier,
and mate-window rescue — must together keep PAIR recall within a couple
of percent of an effectively untruncated (huge-budget) run.  Pins the
invariant that previously held only by agreement-study anecdote.
Reference analog: IntersectingPairedEndAligner.h:32-33's own capacity
constants bound the same loss.
"""
import numpy as np
import pytest

from snap_rnaseq_tpu.index.genome import genome_from_codes
from snap_rnaseq_tpu.index.hash_index import build_index
from snap_rnaseq_tpu.models.paired import PairedAligner
from snap_rnaseq_tpu.utils.tables import reverse_complement_codes


def test_pair_recall_under_truncation():
    rng = np.random.default_rng(12)
    G = 400_000
    codes = rng.integers(0, 4, G, dtype=np.uint8)
    # heavy repeat family: a 500bp unit tiled 200x with 1% divergence,
    # so repeat-anchored seeds carry ~200-hit lists
    unit = rng.integers(0, 4, 500, dtype=np.uint8)
    block = np.tile(unit, 200)
    mut = rng.random(block.size) < 0.01
    block[mut] = (block[mut] + rng.integers(1, 4, mut.sum())) % 4
    codes[100_000:100_000 + block.size] = block
    g = genome_from_codes(codes)
    idx = build_index(g, seed_len=20)

    B, L, FRAG = 64, 100, 300
    r0 = np.empty((B, L), np.uint8)
    r1 = np.empty((B, L), np.uint8)
    starts = np.empty(B, np.int64)
    for i in range(B):
        # half the pairs anchored inside the repeat sea
        if i % 2:
            s = 100_000 + int(rng.integers(0, block.size - FRAG))
        else:
            s = int(rng.integers(0, 99_000))
        starts[i] = s
        f = codes[s:s + L].copy()
        rc = reverse_complement_codes(codes[s + FRAG - L:s + FRAG])
        for arr in (f, rc):
            p = int(rng.integers(0, L))
            arr[p] = (arr[p] + 1) % 4
        r0[i], r1[i] = f, rc
    q = np.full((B, L), ord("I"), np.uint8)
    base = int(g.piece_offsets[0])

    def run(**kw):
        al = PairedAligner(idx, max_seed_slots=16, **kw)
        out = al.align_batch(r0, q, r1, q)
        loc0 = np.asarray(out["loc0"]).astype(np.int32).view(np.uint32)
        ok = (np.abs(loc0.astype(np.int64) - (starts + base)) <= 2) \
            & np.asarray(out["pair_found"])
        return ok, out

    # truncation-heavy operating point (narrow budget, tier+rescue on)
    ok_narrow, out_n = run(cand_per_read=16)
    # effectively untruncated: budget covers the whole repeat family
    ok_wide, out_w = run(cand_per_read=256, overflow_tier=False)

    n_narrow, n_wide = int(ok_narrow.sum()), int(ok_wide.sum())
    assert int(np.asarray(out_n["truncated0"]).sum()) > 0, \
        "batch failed to exercise truncation"
    # some repeat pairs are genuinely ambiguous even untruncated (a
    # 1%-divergent copy can outscore the origin once errors are injected)
    assert n_wide >= int(0.8 * B), (n_wide, B)
    # the invariant: narrow-budget pair recall within 5% of untruncated
    assert n_narrow >= n_wide - max(2, int(0.05 * n_wide)), \
        (n_narrow, n_wide)
