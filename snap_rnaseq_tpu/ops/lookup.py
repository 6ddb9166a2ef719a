"""Batched seed packing + hash-table lookup on device.

TPU-native analog of GenomeIndex::lookupSeed (GenomeIndex.cpp:966-1086) and
SNAPHashTable::Lookup (HashTable.h:74-105):

* seeds for a whole batch of reads are packed with vectorized shifts
  (Seed.h:38-51 semantics: A=0,G=1,C=2,T=3, RC = code^3 mirrored);
* the probe loop is ONE lax.while_loop over the whole (B, S) seed tensor:
  every iteration gathers a key/value lane per seed and advances unfinished
  lanes along the reference's probe sequence (murmur start, quadratic for 5
  probes, then linear) — the loop runs for the max probe count in the batch,
  not the sum;
* seeds longer than 16 bases select a shard (= the reference's per-high-bases
  hash table, GenomeIndex.cpp:316) via (start, size) metadata gathers.

All arithmetic is uint32/int32 — no 64-bit needed on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import INVALID_GENOME_LOCATION, UNUSED_HASH_VALUE

_EMPTY = jnp.uint32(INVALID_GENOME_LOCATION)
_UNUSED = jnp.uint32(UNUSED_HASH_VALUE)
MAX_PROBES = 64  # safety bound; real probe chains are < 10 at our load factor


def murmur32(key: jnp.ndarray) -> jnp.ndarray:
    """MurmurHash3 finalizer (HashTable.h:60-72) on uint32 lanes."""
    k = key.astype(jnp.uint32)
    k = k ^ (k >> 16)
    k = k * jnp.uint32(0x85EBCA6B)
    k = k ^ (k >> 13)
    k = k * jnp.uint32(0xC2B2AE35)
    k = k ^ (k >> 16)
    return k


def pack_seeds(reads: jnp.ndarray, positions, seed_len: int):
    """Pack seeds of each read at the given start positions.

    reads: (B, L) uint8 base codes; positions: STATIC tuple of start
    positions (the shared schedule) — the seed windows become static
    slices, no gather at all.  Returns dict with lo/hi (u32 (B,S)) for fwd
    and rc packs plus validity.  Bases are 2-bit big-endian-by-base; lo =
    last 16 bases, hi = the rest (Seed.h:60-66).
    """
    B, L = reads.shape
    if not isinstance(positions, (tuple, list)):
        import numpy as _np
        if isinstance(positions, _np.ndarray):
            positions = tuple(int(p) for p in positions)
        else:
            # traced schedule (e.g. inside shard_map): gather formulation
            return _pack_seeds_gather(reads, positions, seed_len)
    else:
        positions = tuple(int(p) for p in positions)
    n_hi = max(0, seed_len - 16)

    # per-base columns once: codes (B, L) uint32 + complement
    w_all = reads.astype(jnp.uint32)
    wc_all = w_all ^ jnp.uint32(3)
    ok_all = reads < 4

    los_f, his_f, los_r, his_r, valids = [], [], [], [], []
    for p in positions:
        lo_f = jnp.zeros((B,), jnp.uint32)
        hi_f = jnp.zeros((B,), jnp.uint32)
        lo_r = jnp.zeros((B,), jnp.uint32)
        hi_r = jnp.zeros((B,), jnp.uint32)
        valid = jnp.ones((B,), bool)
        for i in range(seed_len):
            c = jnp.minimum(p + i, L - 1)
            valid = valid & ok_all[:, c]
            sh = 2 * (seed_len - 1 - i)
            if sh >= 32:
                hi_f = hi_f | (w_all[:, c] << (sh - 32))
            else:
                lo_f = lo_f | (w_all[:, c] << sh)
            shr = 2 * i
            if shr >= 32:
                hi_r = hi_r | (wc_all[:, c] << (shr - 32))
            else:
                lo_r = lo_r | (wc_all[:, c] << shr)
        los_f.append(lo_f); his_f.append(hi_f)
        los_r.append(lo_r); his_r.append(hi_r)
        valids.append(valid)
    return dict(lo_f=jnp.stack(los_f, axis=1), hi_f=jnp.stack(his_f, axis=1),
                lo_r=jnp.stack(los_r, axis=1), hi_r=jnp.stack(his_r, axis=1),
                valid=jnp.stack(valids, axis=1), n_hi_bits=2 * n_hi)


def lookup_seeds(packed: dict, ht_entries,
                 shard_start, shard_size):
    """Probe the index for every (read, seed).

    ht_entries: (slots, 3) u32 — the reference's 12-byte
    {key, value1, value2} entries interleaved (HashTable.h:119-123) so one
    probe is ONE gather of three adjacent words instead of three scattered
    gathers.

    Returns (found, fwd_val, rc_val): found bool (B,S); values u32 (B,S)
    holding the reference entry halves already swapped so fwd_val describes
    the seed as read and rc_val its reverse complement (the
    isBiggerThanItsReverseComplement dance of GenomeIndex.cpp:984-1010).
    """
    lo_f, hi_f = packed["lo_f"], packed["hi_f"]
    lo_r, hi_r = packed["lo_r"], packed["hi_r"]
    valid = packed["valid"]

    # canonical = min((hi,lo) fwd, (hi,lo) rc) lexicographically
    fwd_smaller = (hi_f < hi_r) | ((hi_f == hi_r) & (lo_f <= lo_r))
    key = jnp.where(fwd_smaller, lo_f, lo_r)
    shard = jnp.where(fwd_smaller, hi_f, hi_r).astype(jnp.int32)
    palindrome = (hi_f == hi_r) & (lo_f == lo_r)

    base = shard_start[shard]
    size = shard_size[shard]
    size_safe = jnp.maximum(size, 1)

    idx0 = (murmur32(key) % size_safe.astype(jnp.uint32)).astype(jnp.int32)

    def gather(idx):
        e = ht_entries[base + idx]
        return e[..., 0], e[..., 1], e[..., 2]

    k0, v10, v20 = gather(idx0)
    hit0 = (k0 == key) & (v10 != _EMPTY)
    dead0 = (size <= 0) | ~valid

    # Phase 1: a few UNROLLED probe rounds over every lane — covers almost
    # every seed at our load factor.  Phase 2 compacts the stragglers into a
    # small dense array before the data-dependent loop, so long probe chains
    # never drag full-batch gathers along (the TPU shape of the reference's
    # per-seed probe loop, HashTable.h:74-105).
    done = hit0 | dead0
    found = hit0 & ~dead0
    slot_v1 = jnp.where(hit0, v10, _UNUSED)
    slot_v2 = jnp.where(hit0, v20, _UNUSED)
    idx = idx0
    n_probes = jnp.zeros_like(idx0)
    UNROLLED = 4
    for r in range(1, UNROLLED + 1):
        step = jnp.int32(r * r) if r < 5 else jnp.int32(1)
        idx = jnp.where(done, idx, (idx + step) % size_safe)
        n_probes = jnp.where(done, n_probes, n_probes + 1)
        kk, v1, v2 = gather(idx)
        is_hit = (kk == key) & (v1 != _EMPTY)
        is_end = (v1 == _EMPTY) | (n_probes > size + 5)
        newly = ~done & (is_hit | is_end)
        found = jnp.where(newly & is_hit, True, found)
        slot_v1 = jnp.where(newly & is_hit, v1, slot_v1)
        slot_v2 = jnp.where(newly & is_hit, v2, slot_v2)
        done = done | newly

    # Phase 2: compact the stragglers into dense REM-sized blocks and probe
    # each block with a data-dependent loop.  The OUTER loop repeats the
    # compaction until no lane is pending, so a batch with more than REM
    # stragglers (dense tables — e.g. reference-built indices at slack 0.3 —
    # make long probe chains common) still resolves every lane exactly;
    # with the usual straggler counts it runs a single round.
    B, S = key.shape
    BS = B * S
    REM = min(BS, max(256, BS // 16))
    flat = lambda x: x.reshape(BS)
    f_key, f_base, f_size = flat(key), flat(base), flat(size_safe)

    def outer_cond(st):
        done_f = st[0]
        return ~done_f.all()

    def outer_body(st):
        done_f, idx_f, np_f, found_f, v1_f, v2_f = st
        # stable pending-first partition via cumsum (no sort)
        mask_i = (~done_f).astype(jnp.int32)
        pos_true = jnp.cumsum(mask_i) - 1
        n_true = pos_true[-1] + 1
        dest = jnp.where(~done_f, pos_true,
                         n_true + jnp.cumsum(1 - mask_i) - 1)
        inv = jnp.zeros(BS, jnp.int32).at[dest].set(
            jnp.arange(BS, dtype=jnp.int32))
        take = inv[:REM]

        c_key = f_key[take]
        c_base = f_base[take]
        c_size = f_size[take]
        c_idx = idx_f[take]
        c_n = np_f[take]
        c_done = done_f[take] | (jnp.arange(REM) >= n_true)
        c_found = jnp.zeros(REM, bool)
        c_v1 = jnp.full(REM, _UNUSED)
        c_v2 = jnp.full(REM, _UNUSED)

        def cond(state):
            done_c, *_, n = state
            return (~done_c).any() & (n < MAX_PROBES)

        def body(state):
            done_c, idx_c, v1_c, v2_c, np_c, found_c, n = state
            np_c = jnp.where(done_c, np_c, np_c + 1)
            step = jnp.where(np_c < 5, np_c * np_c, 1)
            idx_c = jnp.where(done_c, idx_c, (idx_c + step) % c_size)
            e = ht_entries[c_base + idx_c]
            kk, v1, v2 = e[..., 0], e[..., 1], e[..., 2]
            is_hit = (kk == c_key) & (v1 != _EMPTY)
            is_end = (v1 == _EMPTY) | (np_c > c_size + 5)
            newly = ~done_c & (is_hit | is_end)
            found_c = jnp.where(newly & is_hit, True, found_c)
            v1_c = jnp.where(newly & is_hit, v1, v1_c)
            v2_c = jnp.where(newly & is_hit, v2, v2_c)
            return done_c | newly, idx_c, v1_c, v2_c, np_c, found_c, n + 1

        state0 = (c_done, c_idx, c_v1, c_v2, c_n, c_found,
                  jnp.int32(UNROLLED))
        _, c_idx, c_v1, c_v2, c_n, c_found, _ = jax.lax.while_loop(
            cond, body, state0)

        # every taken lane is finished now (MAX_PROBES acts as the
        # reference's nProbes > tableSize + 5 not-found guard)
        done_f = done_f.at[take].set(True)
        found_f = found_f.at[take].max(c_found)
        v1_f = v1_f.at[take].min(c_v1)
        v2_f = v2_f.at[take].min(c_v2)
        idx_f = idx_f.at[take].set(c_idx)
        np_f = np_f.at[take].set(c_n)
        return done_f, idx_f, np_f, found_f, v1_f, v2_f

    st0 = (flat(done), flat(idx), flat(n_probes), flat(found),
           flat(slot_v1), flat(slot_v2))
    done_f, _, _, found_f, v1_f, v2_f = jax.lax.while_loop(
        outer_cond, outer_body, st0)
    found = found_f.reshape(B, S)
    v1 = v1_f.reshape(B, S)
    v2 = v2_f.reshape(B, S)

    fwd_val = jnp.where(found, jnp.where(fwd_smaller, v1, v2), _UNUSED)
    rc_val = jnp.where(found, jnp.where(fwd_smaller, v2, v1), _UNUSED)
    rc_val = jnp.where(palindrome, fwd_val, rc_val)
    return found, fwd_val, rc_val


_CK_SALT1 = jnp.uint32(0x9E3779B1)
_CK_SALT2 = jnp.uint32(0x85EBCA77)


def _range_reduce(h: jnp.ndarray, n: int) -> jnp.ndarray:
    """Map uniform u32 h -> [0, n) as (h * n) >> 32 (Lemire's fast range
    reduction) — u32 modulo lowers to a catastrophically slow division
    sequence on TPU, while this is a handful of 16-bit-limb multiplies.
    The host-side build (index/hash_index.py _ck_h1/_ck_h2) uses the same
    mapping, so bucket assignments agree bit-for-bit."""
    n = int(n)
    a0 = h & jnp.uint32(0xFFFF)
    a1 = h >> 16
    b0 = jnp.uint32(n & 0xFFFF)
    b1 = jnp.uint32(n >> 16)
    p00 = a0 * b0
    p10 = a1 * b0
    p01 = a0 * b1
    p11 = a1 * b1
    carry = ((p00 >> 16) + (p10 & jnp.uint32(0xFFFF))
             + (p01 & jnp.uint32(0xFFFF))) >> 16
    return p11 + (p10 >> 16) + (p01 >> 16) + carry


def _canonicalize(packed: dict):
    """Canonical (key, shard) per seed + the fwd/rc value-swap predicates
    (the isBiggerThanItsReverseComplement dance, GenomeIndex.cpp:984-1010)."""
    lo_f, hi_f = packed["lo_f"], packed["hi_f"]
    lo_r, hi_r = packed["lo_r"], packed["hi_r"]
    fwd_smaller = (hi_f < hi_r) | ((hi_f == hi_r) & (lo_f <= lo_r))
    key = jnp.where(fwd_smaller, lo_f, lo_r)
    shard = jnp.where(fwd_smaller, hi_f, hi_r)
    palindrome = (hi_f == hi_r) & (lo_f == lo_r)
    return key, shard, fwd_smaller, palindrome


def lookup_seeds_cuckoo(packed: dict, ck_buckets, ck_buckets2, ck_stash):
    """Loop-free lookup against the two-level bucket layout
    (index/hash_index.py build_cuckoo_layout): exactly two 32-word row
    gathers per seed + a broadcast compare against the fixed stash.
    Returns the same (found, fwd_val, rc_val) contract as lookup_seeds —
    identical values, since the bucket table holds exactly the occupied
    entries of the probe-chain table.
    """
    key, shard, fwd_smaller, palindrome = _canonicalize(packed)
    valid = packed["valid"]
    CAP = ck_buckets.shape[1] // 4

    h1 = _range_reduce(murmur32(key ^ (shard * _CK_SALT1)),
                       ck_buckets.shape[0])
    h2 = _range_reduce(murmur32((key + _CK_SALT2) ^ (shard * _CK_SALT2)),
                       ck_buckets2.shape[0])

    found = jnp.zeros(key.shape, bool)
    v1 = jnp.zeros(key.shape, jnp.uint32)
    v2 = jnp.zeros(key.shape, jnp.uint32)
    for tbl, h in ((ck_buckets, h1), (ck_buckets2, h2)):
        rows = tbl[h.astype(jnp.int32)]                 # (B, S, 4*CAP)
        for j in range(CAP):
            m = (rows[..., j] == key) & (rows[..., CAP + j] == shard)
            found = found | m
            v1 = jnp.where(m, rows[..., 2 * CAP + j], v1)
            v2 = jnp.where(m, rows[..., 3 * CAP + j], v2)
    # stash: at most CUCKOO_STASH entries, broadcast compare
    st_m = (key[..., None] == ck_stash[None, None, :, 0]) & \
           (shard[..., None] == ck_stash[None, None, :, 1])
    any_st = st_m.any(axis=-1)
    found = found | any_st
    v1 = jnp.where(any_st,
                   jnp.max(jnp.where(st_m, ck_stash[None, None, :, 2], 0),
                           axis=-1), v1)
    v2 = jnp.where(any_st,
                   jnp.max(jnp.where(st_m, ck_stash[None, None, :, 3], 0),
                           axis=-1), v2)

    found = found & valid
    fwd_val = jnp.where(found, jnp.where(fwd_smaller, v1, v2), _UNUSED)
    rc_val = jnp.where(found, jnp.where(fwd_smaller, v2, v1), _UNUSED)
    rc_val = jnp.where(palindrome, fwd_val, rc_val)
    return found, fwd_val, rc_val


def expand_counts(val: jnp.ndarray, overflow: jnp.ndarray, genome_size) -> tuple:
    """Decode an entry half into (count, list_base).

    count: 0 (unused), 1 (direct location), or overflow count.
    list_base: index into `overflow` of the first location (descending list),
    or -1 when the value IS the single location (GenomeIndex.cpp:1013-1086).
    """
    gsize = jnp.uint32(genome_size)
    is_unused = val == _UNUSED
    is_single = val < gsize
    ovf_off = jnp.where(is_single | is_unused, 0, val - gsize).astype(jnp.int32)
    ovf_count = overflow[jnp.clip(ovf_off, 0, overflow.shape[0] - 1)] if overflow.shape[0] else jnp.zeros_like(val)
    count = jnp.where(is_unused, 0,
                      jnp.where(is_single, 1, ovf_count)).astype(jnp.int32)
    list_base = jnp.where(is_single | is_unused, -1, ovf_off + 1)
    return count, list_base


def gather_hit(slot_in_list, count, list_base, val, overflow):
    """Location of the `slot_in_list`-th hit of an entry half."""
    direct = list_base < 0
    ovf_idx = jnp.clip(list_base + slot_in_list, 0,
                       max(overflow.shape[0] - 1, 0))
    from_ovf = overflow[ovf_idx] if overflow.shape[0] else jnp.zeros_like(val)
    return jnp.where(direct, val, from_ovf)


def _pack_seeds_gather(reads: jnp.ndarray, positions: jnp.ndarray,
                       seed_len: int):
    """Gather-based packing for traced (non-static) schedules."""
    B, L = reads.shape
    S = positions.shape[0]
    idx = positions[None, :, None] + jnp.arange(seed_len, dtype=jnp.int32)
    window = jnp.take_along_axis(
        reads[:, None, :].astype(jnp.int32),
        jnp.broadcast_to(jnp.clip(idx, 0, L - 1), (B, S, seed_len)), axis=2)
    valid = (window < 4).all(axis=2)
    n_hi = max(0, seed_len - 16)
    lo_f = jnp.zeros((B, S), jnp.uint32)
    hi_f = jnp.zeros((B, S), jnp.uint32)
    lo_r = jnp.zeros((B, S), jnp.uint32)
    hi_r = jnp.zeros((B, S), jnp.uint32)
    w = window.astype(jnp.uint32)
    wc = w ^ jnp.uint32(3)
    for i in range(seed_len):
        sh = 2 * (seed_len - 1 - i)
        if sh >= 32:
            hi_f = hi_f | (w[:, :, i] << (sh - 32))
        else:
            lo_f = lo_f | (w[:, :, i] << sh)
        shr = 2 * i
        if shr >= 32:
            hi_r = hi_r | (wc[:, :, i] << (shr - 32))
        else:
            lo_r = lo_r | (wc[:, :, i] << shr)
    return dict(lo_f=lo_f, hi_f=hi_f, lo_r=lo_r, hi_r=hi_r, valid=valid,
                n_hi_bits=2 * n_hi)
