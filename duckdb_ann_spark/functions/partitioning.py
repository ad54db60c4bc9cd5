"""Collision-free hash partitioning for dense integer keys.

`df.repartition(k, col)` places a row in partition
`pmod(murmur3(col), k)` — for k dense cell ids hashed into k partitions
~1/e of the partitions stay EMPTY while ~26% receive two or more cells
(balls-in-bins). When the per-key work is a whole graph build, a
two-cell task runs its builds sequentially and doubles the stage wall
(observed live on the 300k reference-default smoke: 10/12 cells done in
~27 min, then ~1h for two collision tasks). Round 10 fixed that with
`repartitionByRange`, whose range-boundary sampling job re-runs the
upstream (assignment) pass once more — a measurable build-wall tax at
bench scale.

This module removes both costs: precompute, per dense key c in
[0, k), a TOKEN t_c whose Spark hash lands exactly in partition c, map
the key column through the token table, and `repartition(k, token)`
becomes a perfect 1:1 key→partition placement with NO sampling job.

The token search needs Spark's exact hash: `Murmur3Hash` over one INT
column with seed 42 (what both `F.hash` and `HashPartitioning` compute
— Murmur3_x86_32.hashInt). It is re-implemented here and pinned
against `F.hash` by a unit test, so a Spark-side change of the hash
would fail loud instead of silently skewing partitions.
"""

from __future__ import annotations

import numpy as np


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def murmur3_hash_int(value: int, seed: int = 42) -> int:
    """Spark's `Murmur3Hash` of a single INT column (seed 42) — the
    hash behind `F.hash(int_col)` AND `repartition(n, int_col)`
    placement. Returns the signed 32-bit java int."""
    k1 = ((value & 0xFFFFFFFF) * 0xCC9E2D51) & 0xFFFFFFFF
    k1 = _rotl32(k1, 15)
    k1 = (k1 * 0x1B873593) & 0xFFFFFFFF
    h1 = (seed & 0xFFFFFFFF) ^ k1
    h1 = _rotl32(h1, 13)
    h1 = (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF
    h1 ^= 4  # total byte length of the hashed row (one int)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1 - 0x100000000 if h1 >= 0x80000000 else h1


def exact_partition_tokens(n: int) -> np.ndarray:
    """tokens[c] = the smallest non-negative int whose Spark hash lands
    in partition c of n (`pmod(murmur3(t), n) == c`). Mapping a dense
    key column c → tokens[c] and `repartition(n, token_col)` places key
    c in partition c exactly — one task per key, zero collisions, zero
    sampling jobs. The search is driver-side and O(n log n) expected
    (coupon collector); n here is a shard/cell count, never data-sized."""
    tokens = np.full(n, -1, dtype=np.int64)
    found, t = 0, 0
    while found < n:
        p = murmur3_hash_int(t) % n  # python % IS pmod for n > 0
        if tokens[p] < 0:
            tokens[p] = t
            found += 1
        t += 1
    return tokens
