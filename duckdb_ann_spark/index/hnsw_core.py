"""Layered HNSW graph (Malkov & Yashunin 2016) in numpy.

Real multi-layer HNSW backing `CREATE INDEX ... USING FAISS WITH
(type='HNSW', hnsw_m=...)` — the reference delegates to libfaiss's
`IndexHNSWFlat(dimension, hnsw_m)` (`/root/reference/src/faiss_index.cpp:47-48`,
param plumbing `src/include/faiss_index.hpp:37-113`); this is an
independent re-implementation of the same published algorithm:

* geometric level assignment with ``mL = 1/ln(M)`` — deterministic per
  label via a splitmix64 mixer instead of an RNG, so rebuilds of the
  same rows produce byte-identical graphs (required by the restart /
  serialization round-trip tests);
* layer 0 holds every node with degree bound ``2M`` (faiss convention),
  upper layers hold a geometrically thinning subset with bound ``M``;
* insert: greedy 1-NN descent from the top entry to ``level+1``, then
  per-layer ``efConstruction`` beam search + the paper's Algorithm-4
  neighbor-selection heuristic, bidirectional linking with overflow
  re-selection;
* search: greedy descent to layer 1, beam search with
  ``ef = max(k, efSearch)`` on layer 0 — `efSearch` arrives through the
  engine's `search_complexity` plumbing, like the reference maps it.

Distances use the shared `_dists` kernel from `vamana_core`, so HNSW
ranks candidates bitwise-identically to every other engine path.

Insert-throughput finding (round 5): a 2k x d128 build profiles at
~1.1 ms/row, ~45 beam hops per insert with ~15 small-numpy ops per hop
(heap pop, adjacency filter, visited mask, one `_dists` einsum, bisect
maintenance). The round-5 rewrites (dense bool visited mask, numpy
adjacency filtering, batched beam-threshold discard, vectorized
Algorithm-4 occlusion — all verified byte-identical graphs) bought
~5-10%; the remainder is per-hop interpreter/numpy-dispatch overhead
that only a compiled kernel (numba/cython, not in this runtime) or a
semantics-changing batch insert could remove. This is the documented
justification for the engines' `shards=0` auto default: per-shard
builds are capped at AUTO_SHARD_ROWS=25k rows (~30 s of sequential
insert) and run in parallel executors, so single-graph insert speed is
a per-shard constant, not the corpus-scale bottleneck.
"""

from __future__ import annotations

import bisect
import heapq
import math

import numpy as np

from .vamana_core import NO_EDGE, _dist, _dists, _mix64

# Max dim for the wave-batched level-0 build body (round-14 gate,
# env-overridable for A/B like the vamana wave knobs — executors read
# their own copy of this module, so only the env reaches them). Round
# 15 (r14 verdict item 5): the dim-128 regression the gate was hiding
# was the wave kernel's qs-repeat + diff TEMPS (two (rows, dim)
# allocations growing with dim); with the in-place segment subtract in
# `vamana_core.multi_slab_visited` the wave WINS past 64 — interleaved
# min-of-3 per-row vs wave16 at m32/ef64: 4000x128 5.52->5.03s
# (1.10x, recall 0.939/0.938), 4000x256 6.78->6.16s (1.10x,
# 0.932/0.928), 4000x64 m16/ef40 4.43->3.87s (1.14x) — but still
# loses at 2000x768 (4.20->4.36s, 0.96x): at that dim the merged
# slab rows blow past cache and the wave only adds working set. Gate
# raised 64 -> 256; 768-dim builds keep the per-row slab body.
import os as _os

WAVE_MAX_DIM = int(_os.environ.get("SPARK_GRAFT_HNSW_WAVE_MAX_DIM", "256"))


def _level_for(label: int, ml: float) -> int:
    """Deterministic geometric level: splitmix64(label) → U(0,1] →
    floor(-ln(u) * mL). An RNG would make the graph depend on build
    order/restarts; a mixed hash of the label keeps it a pure function
    of the row set. Shares `_mix64` with the entry-point sampling so the
    'same version-stable mixer' invariant has one implementation."""
    u = (_mix64(label) + 1) / 2.0**64  # (0, 1]
    return int(-math.log(u) * ml)


class HnswGraph:
    """In-memory layered HNSW over float32 vectors.

    Layer 0 adjacency lives in a dense (n, 2M) u32 matrix (the same
    shape `.diskann` serializes, so the on-disk body stays mmap-able);
    upper layers are {label: np.ndarray} dicts, one per layer."""

    def __init__(self, dim: int, m: int = 32, ef_construction: int = 64,
                 metric: str = "l2", capacity: int = 1024):
        self.dim = dim
        self.m = int(m)
        self.m0 = 2 * self.m
        self.ef_construction = int(ef_construction)
        self.metric = metric
        self.ml = 1.0 / math.log(self.m) if self.m > 1 else 1.0
        self.n = 0
        self.vectors = np.zeros((capacity, dim), dtype=np.float32)
        self.adjacency = np.full((capacity, self.m0), NO_EDGE, dtype=np.uint32)
        self.levels = np.zeros(capacity, dtype=np.uint8)
        self.upper: list[dict[int, np.ndarray]] = []  # upper[l-1][label]
        self.entry_point = -1
        self.max_level = 0
        # build-time layer-0 back-connection slack (round 15 — the HNSW
        # twin of VamanaGraph._slack): >0 only inside build_hnsw's bulk
        # body; _finalize_slack() narrows before the graph escapes
        self._slack = 0

    # engine-facing parity with VamanaGraph -----------------------------
    @property
    def entry_points(self) -> list[int]:
        return [self.entry_point] if self.entry_point >= 0 else []

    @property
    def max_degree(self) -> int:  # serialized body degree = layer 0
        return self.m0

    @property
    def build_complexity(self) -> int:
        return self.ef_construction

    # -- storage --------------------------------------------------------
    def _grow(self, need: int) -> None:
        cap = self.vectors.shape[0]
        if need <= cap:
            return
        new_cap = max(need, cap * 2)
        self.vectors = np.vstack(
            [self.vectors, np.zeros((new_cap - cap, self.dim), dtype=np.float32)]
        )
        self.adjacency = np.vstack(
            [self.adjacency,
             np.full((new_cap - cap, self.adjacency.shape[1]), NO_EDGE,
                     dtype=np.uint32)]
        )
        self.levels = np.concatenate(
            [self.levels, np.zeros(new_cap - cap, dtype=np.uint8)]
        )

    def _neighbors(self, i: int, layer: int) -> list[int]:
        if layer == 0:
            adj = self.adjacency[i]
            return adj[adj != NO_EDGE].tolist()
        if layer > len(self.upper):  # node assigned here, no links yet
            return []
        arr = self.upper[layer - 1].get(i)
        return [] if arr is None else arr.tolist()

    def _set_neighbors(self, i: int, layer: int, ids: list[int]) -> None:
        if layer == 0:
            ids = ids[: self.m0 + self._slack]
            row = self.adjacency[i]
            row[: len(ids)] = ids
            row[len(ids):] = NO_EDGE
        else:
            while len(self.upper) < layer:
                self.upper.append({})
            self.upper[layer - 1][i] = np.asarray(ids[: self.m], dtype=np.int64)

    # -- search ---------------------------------------------------------
    def _search_layer(self, q: np.ndarray, entries: list[tuple[float, int]],
                      ef: int, layer: int,
                      visited_out: set | None = None) -> list[tuple[float, int]]:
        """Beam search on one layer → ascending (dist, label), len <= ef.
        Neighbor distances of each hop are evaluated in ONE batched
        kernel call (same `_dists` reduction as every other path, so
        results are bitwise-identical to the pre-optimization loop); the
        visited set is a dense bool mask and the adjacency row is
        filtered in numpy (set-of-int bookkeeping dominated build time).
        `visited_out` collects every node touched (the VamanaGraph
        `return_visited` contract)."""
        visited = np.zeros(self.n, dtype=bool)
        for _, i in entries:
            visited[i] = True
        cand = list(entries)
        heapq.heapify(cand)
        result = sorted(entries)[:ef]
        upper = self.upper[layer - 1] if 0 < layer <= len(self.upper) else None
        while cand:
            c_dist, c_id = heapq.heappop(cand)
            if len(result) >= ef and c_dist > result[-1][0]:
                break
            if layer == 0:
                adj = self.adjacency[c_id]
                nbrs = adj[adj != NO_EDGE]  # u32 indexes fine, no copy
            else:
                nbrs = upper.get(c_id) if upper is not None else None
                if nbrs is None:
                    continue
            nbrs = nbrs[~visited[nbrs]]
            if not nbrs.size:
                continue
            visited[nbrs] = True
            ds = _dists(self.metric, self.vectors[nbrs], q)
            if len(result) >= ef:
                # batch-discard against the CURRENT worst: the live
                # threshold inside the loop below only tightens, so
                # pre-filtering with it keeps exactly the elements the
                # sequential scan could accept — bitwise-identical
                # results, ~4x fewer python-loop iterations
                keep = ds < result[-1][0]
                if not keep.any():
                    continue
                nbrs, ds = nbrs[keep], ds[keep]
            for nb, d in zip(nbrs.tolist(), ds.tolist()):
                if len(result) < ef or d < result[-1][0]:
                    bisect.insort(result, (d, nb))
                    if len(result) > ef:
                        result.pop()
                    heapq.heappush(cand, (d, nb))
        if visited_out is not None:
            visited_out.update(np.flatnonzero(visited).tolist())
        return result

    def _search_layer0_slab(self, q: np.ndarray,
                            entries: list[tuple[float, int]],
                            ef: int, B: int) -> list[tuple[float, int]]:
        """Frontier-slab beam search on LAYER 0 → ascending (dist,
        label), len <= ef — the bulk-build twin of `_search_layer`
        (round 13, same design as `VamanaGraph._slab_search_visited`):
        each wave expands the B best unexpanded candidates within the
        current ef-th-best threshold and scores all their unvisited
        neighbors in ONE `_dists` kernel, so the per-hop python
        bookkeeping that dominated the build (round-5 finding in the
        module docstring) amortizes across the wave. The final result
        is the top-ef of the visited set — the same quantity the
        sequential beam converges to — but the visited set itself
        differs (waved expansion order), so only `build_hnsw` calls
        this, behind vamana_core.BULK_MIN_ROWS; searches and appends
        keep `_search_layer` byte-for-byte."""
        vis = np.zeros(self.n, dtype=bool)
        # preallocated (capacity-doubling) visited buffers — same
        # round-14 allocator-churn fix as VamanaGraph._slab_search_visited
        m = len(entries)
        cap = max(2 * (ef + m), 64)
        ids_b = np.empty(cap, dtype=np.int64)
        ds_b = np.empty(cap, dtype=np.float64)
        exp_b = np.zeros(cap, dtype=bool)
        ids_b[:m] = np.fromiter((i for _, i in entries), np.int64, count=m)
        ds_b[:m] = [d for d, _ in entries]
        vis[ids_b[:m]] = True
        while True:
            une = np.flatnonzero(~exp_b[:m])
            if not une.size:
                break
            ds = ds_b[:m]
            if m >= ef:
                thresh = np.partition(ds, ef - 1)[ef - 1]
                une = une[ds[une] <= thresh]
                if not une.size:
                    break
            if une.size > B:
                une = une[np.argpartition(ds[une], B - 1)[:B]]
            exp_b[une] = True
            rows = self.adjacency[ids_b[une]].reshape(-1)
            rows = rows[rows != NO_EDGE].astype(np.int64)
            rows = rows[~vis[rows]]
            if rows.size:
                rows = np.unique(rows)
                vis[rows] = True
                nds = _dists(self.metric, self.vectors[rows], q)
                if m + rows.size > cap:
                    cap = max(2 * cap, m + rows.size)
                    ids_b = np.concatenate(
                        [ids_b[:m], np.empty(cap - m, np.int64)]
                    )
                    ds_b = np.concatenate(
                        [ds_b[:m], np.empty(cap - m, np.float64)]
                    )
                    exp_b = np.concatenate(
                        [exp_b[:m], np.zeros(cap - m, bool)]
                    )
                ids_b[m:m + rows.size] = rows
                ds_b[m:m + rows.size] = nds.astype(np.float64)
                m += rows.size
        ids, ds = ids_b[:m], ds_b[:m]
        top = np.lexsort((ids, ds))[:ef]
        return [(float(ds[i]), int(ids[i])) for i in top]

    def _select(self, cands: list[tuple[float, int]], mm: int) -> list[int]:
        """Algorithm 4 neighbor selection: scan candidates by ascending
        distance, keep e only when it is closer to q than to every
        already-kept neighbor (diversity pruning). Ties are broken by
        the (dist, id) candidate order, keeping selection deterministic.

        The candidate-pool pairwise distances are computed as ONE kernel
        upfront (same GEMM shape robust_prune uses) — per-pair scalar
        `_dist` calls inside the keep loop dominated build time."""
        if not cands:
            return []
        ids = [e for _, e in cands]
        pool = np.ascontiguousarray(self.vectors[np.asarray(ids)])
        if self.metric == "ip":
            pair = -(pool @ pool.T)
        else:
            n2 = np.einsum("ij,ij->i", pool, pool)
            pair = n2[:, None] + n2[None, :] - 2.0 * (pool @ pool.T)
            np.maximum(pair, 0.0, out=pair)
        # occlusion scan, vectorized: candidate i is dropped iff some
        # already-kept s has pair[i, s] < d_i (same `>=` tie behavior as
        # the previous per-pair generator scan, ~L*mm fewer py-ops)
        d_q = np.fromiter((d for d, _ in cands), dtype=np.float64,
                          count=len(cands))
        occluded = np.zeros(len(cands), dtype=bool)
        kept: list[int] = []  # positions into cands
        for i in range(len(cands)):
            if occluded[i]:
                continue
            kept.append(i)
            if len(kept) >= mm:
                break
            # column i == pair[tested, kept], exactly the elements the
            # previous scalar scan compared (don't rely on gemm output
            # being bit-symmetric)
            occluded |= pair[:, i] < d_q
        if not kept:  # degenerate pool (all occluded): keep the nearest
            kept = [0]
        return [ids[i] for i in kept]

    # -- insert ---------------------------------------------------------
    def insert(self, vector, _slab_B: int = 0) -> int:
        """`_slab_B > 0` switches the LAYER-0 beam to the frontier-slab
        body (bulk builds only — `build_hnsw` passes it behind
        vamana_core.BULK_MIN_ROWS; appends never do)."""
        v = np.asarray(vector, dtype=np.float32)
        label = self.n
        self._grow(label + 1)
        self.vectors[label] = v
        self.n += 1
        lvl = _level_for(label, self.ml)
        self.levels[label] = min(lvl, 255)

        if label == 0:
            self.entry_point = 0
            self.max_level = lvl
            return 0

        ep = [(_dist(self.metric, v, self.vectors[self.entry_point]),
               self.entry_point)]
        for lc in range(self.max_level, lvl, -1):
            ep = self._search_layer(v, ep, 1, lc)
        for lc in range(min(lvl, self.max_level), -1, -1):
            if lc == 0 and _slab_B:
                w = self._search_layer0_slab(
                    v, ep, self.ef_construction, _slab_B
                )
            else:
                w = self._search_layer(v, ep, self.ef_construction, lc)
            mm = self.m0 if lc == 0 else self.m
            nbrs = self._select(w, mm)
            self._set_neighbors(label, lc, nbrs)
            # layer-0 rows may OVERFLOW to m0+slack during bulk builds
            # (round 15, see build_hnsw) — the re-select then amortizes
            # to once per slack-fill + the finalize pass
            cap_eff = mm + (self._slack if lc == 0 else 0)
            for nb in nbrs:
                cur = self._neighbors(nb, lc)
                if label in cur:
                    continue
                if len(cur) < cap_eff:
                    self._set_neighbors(nb, lc, cur + [label])
                else:
                    # overflow: re-select among current + new by distance
                    # to nb, with the same deterministic heuristic
                    pool_ids = cur + [label]
                    pd = _dists(
                        self.metric, self.vectors[np.asarray(pool_ids)],
                        self.vectors[nb],
                    )
                    pool = sorted(zip(pd.tolist(), pool_ids))
                    self._set_neighbors(nb, lc, self._select(pool, mm))
            ep = w
        if lvl > self.max_level:
            self.max_level = lvl
            self.entry_point = label
        return label

    def _insert_wave0(self, block: np.ndarray, B: int) -> None:
        """Wave-batched insert for a run of LEVEL-0 labels (round 14 —
        the HNSW side of `VamanaGraph._insert_wave`): upper-layer
        descents run per row (ef=1, static upper layers — identical to
        sequential), the layer-0 beams run against the wave-start
        snapshot with kernels merged across the wave
        (`vamana_core.multi_slab_visited`), then select + connect +
        overflow re-select apply sequentially in label order. Only
        `build_hnsw` calls this, behind BULK_MIN_ROWS and WAVE_ROWS;
        the caller guarantees every label in the block has level 0
        (level-1+ rows flush the wave and insert sequentially — they
        mutate the upper layers the descents read)."""
        from .vamana_core import multi_slab_visited

        w0 = self.n
        W = block.shape[0]
        self._grow(w0 + W)
        self.vectors[w0:w0 + W] = block
        self.n = w0 + W
        self.levels[w0:w0 + W] = 0
        seeds = []
        for i in range(W):
            v = block[i]
            ep = [(_dist(self.metric, v, self.vectors[self.entry_point]),
                   self.entry_point)]
            for lc in range(self.max_level, 0, -1):
                ep = self._search_layer(v, ep, 1, lc)
            seeds.append((
                np.fromiter((e for _, e in ep), np.int64, count=len(ep)),
                np.asarray([d for d, _ in ep], dtype=np.float64),
            ))
        pools = multi_slab_visited(
            self.vectors, self.adjacency, self.metric, self.n,
            np.ascontiguousarray(block), seeds, self.ef_construction, B,
            np.float64,
        )
        ef = self.ef_construction
        for i in range(W):
            label = w0 + i
            ids, ds = pools[i]
            top = np.lexsort((ids, ds))[:ef]
            w = [(float(ds[t]), int(ids[t])) for t in top]
            mm = self.m0
            nbrs = self._select(w, mm)
            self._set_neighbors(label, 0, nbrs)
            cap_eff = mm + self._slack
            for nb in nbrs:
                cur = self._neighbors(nb, 0)
                if label in cur:
                    continue
                if len(cur) < cap_eff:
                    self._set_neighbors(nb, 0, cur + [label])
                else:
                    pool_ids = cur + [label]
                    pd = _dists(
                        self.metric, self.vectors[np.asarray(pool_ids)],
                        self.vectors[nb],
                    )
                    pool = sorted(zip(pd.tolist(), pool_ids))
                    self._set_neighbors(nb, 0, self._select(pool, mm))

    def _enable_slack(self, slack: int) -> None:
        """Widen layer-0 adjacency for build-time back-connection slack
        (bulk body only; `_finalize_slack` narrows before the graph
        escapes)."""
        if slack <= 0 or self._slack:
            return
        cap = self.adjacency.shape[0]
        pad = np.full((cap, slack), NO_EDGE, dtype=np.uint32)
        self.adjacency = np.hstack([self.adjacency, pad])
        self._slack = int(slack)

    def _finalize_slack(self) -> None:
        """End-of-build re-select of every layer-0 row still holding
        more than m0 back-connections, then narrow adjacency back to
        (n, m0) — the HNSW twin of `VamanaGraph._finalize_slack`:
        one Algorithm-4 re-select per overflowing node total instead of
        per overflow arrival, over the node's FULL accumulated pool."""
        if not self._slack:
            return
        m0 = self.m0
        counts = (self.adjacency[: self.n] != NO_EDGE).sum(axis=1)
        over = np.flatnonzero(counts > m0)
        self._slack = 0  # _set_neighbors must truncate to m0 again
        for j in over.tolist():
            adj = self.adjacency[j]
            cur = adj[adj != NO_EDGE].tolist()
            pd = _dists(
                self.metric, self.vectors[np.asarray(cur)], self.vectors[j]
            )
            pool = sorted(zip(pd.tolist(), cur))
            self._set_neighbors(j, 0, self._select(pool, m0))
        self.adjacency = np.ascontiguousarray(self.adjacency[:, :m0])

    # -- queries --------------------------------------------------------
    def search(self, query, k: int, search_complexity: int | None = None,
               return_visited: bool = False):
        """→ list[(label, distance)], ascending (dist, id) like every
        engine path; `search_complexity` plays efSearch."""
        if self.n == 0 or k == 0:
            return ([], []) if return_visited else []
        q = np.asarray(query, dtype=np.float32)
        k_eff = min(k, self.n)
        ef = max(k_eff, search_complexity or self.ef_construction)
        visited: set | None = set() if return_visited else None
        ep = [(_dist(self.metric, q, self.vectors[self.entry_point]),
               self.entry_point)]
        for lc in range(self.max_level, 0, -1):
            ep = self._search_layer(q, ep, 1, lc, visited_out=visited)
        res = self._search_layer(q, ep, ef, 0, visited_out=visited)
        # deterministic (dist, id) order for equal distances
        res = sorted((d, i) for d, i in res)[:k_eff]
        hits = [(i, d) for d, i in res]
        if return_visited:
            return hits, sorted(visited)
        return hits

    def search_batch(self, queries, k: int,
                     search_complexity: int | None = None):
        """Per-query loop (HNSW descent is inherently sequential per
        query); the engine's distributed path batches across partitions
        instead."""
        qm = np.asarray(queries, dtype=np.float32)
        return [self.search(qm[i], k, search_complexity)
                for i in range(qm.shape[0])]

    def search_batch_slab(self, queries, k: int,
                          search_complexity: int | None = None):
        """Frontier-slab search twin (round 14, the HNSW side of
        `VamanaGraph.search_batch_slab`): upper-layer descent unchanged
        (cheap, ef=1), layer 0 through the bulk build's
        `_search_layer0_slab` wave body instead of the per-hop
        heappop/bisect beam. Same opt-in contract: ONLY
        `target_recall=`-driven serving (measured-floor semantics) —
        default/oracle paths keep the sequential beam byte-for-byte."""
        from .vamana_core import _bulk_wave_width

        qm = np.asarray(queries, dtype=np.float32)
        nq = qm.shape[0]
        if self.n == 0 or k == 0 or nq == 0:
            return [[] for _ in range(nq)]
        k_eff = min(k, self.n)
        ef = max(k_eff, search_complexity or self.ef_construction)
        B = _bulk_wave_width(self.dim)
        out = []
        for qi in range(nq):
            q = qm[qi]
            ep = [(_dist(self.metric, q, self.vectors[self.entry_point]),
                   self.entry_point)]
            for lc in range(self.max_level, 0, -1):
                ep = self._search_layer(q, ep, 1, lc)
            res = self._search_layer0_slab(q, ep, ef, B)[:k_eff]
            out.append([(i, d) for d, i in res])
        return out


def build_hnsw(vectors: np.ndarray, m: int = 32, ef_construction: int = 64,
               metric: str = "l2") -> HnswGraph:
    """Sequential build by repeated insert — the reference shape
    (faiss `IndexHNSWFlat::add`, single graph).

    Builds at/above `vamana_core.BULK_MIN_ROWS` rows run the layer-0
    beam through the frontier-slab body (round 13; same gate discipline
    as the Vamana bulk build — small, byte-pinned builds keep the
    historical path bit-for-bit). Measured at 6000x16/m16 (the 10M-smoke
    HNSW cell shape): 2.0x build at recall parity (sweep in
    `_search_layer0_slab`'s commit).

    Bulk builds also run with layer-0 back-connection SLACK (round 15,
    vamana_core.BULK_SLACK): rows overflow to m0*(1+slack) before a
    re-select, finalized once at end. Interleaved min-of-3 immediate vs
    slack: 1500x16/m16 1.13->0.92s (1.23x, recall 0.997/0.996),
    6000x16/m16 6.99->6.93s (1.01x, 0.991/0.991), 4000x128/m32
    4.82->4.71s (1.02x, 0.943/0.946) — smaller than the vamana win
    because HNSW's per-arrival re-select was already one small kernel,
    not an occlusion rescan; kept because it is never negative and the
    small-cell regime (the degree-16 routed budget) gets 1.2x."""
    from .vamana_core import (
        BULK_MIN_ROWS, BULK_SLACK, WAVE_ROWS, _bulk_wave_width,
    )

    vectors = np.ascontiguousarray(vectors, dtype=np.float32)
    n = len(vectors)
    g = HnswGraph(vectors.shape[1] if vectors.size else 0, m, ef_construction,
                  metric, capacity=max(n, 16))
    slab_b = _bulk_wave_width(vectors.shape[1]) if n >= BULK_MIN_ROWS else 0
    if slab_b and BULK_SLACK > 0:
        # round 15: layer-0 back-connection slack (the vamana
        # BULK_SLACK discipline — see vamana_core for the measured
        # table; HNSW twin measured in build docstring below)
        g._enable_slack(max(1, int(g.m0 * BULK_SLACK)))
    if slab_b and WAVE_ROWS > 1 and vectors.shape[1] <= WAVE_MAX_DIM:
        # wave-batched level-0 runs (round 14; see _insert_wave0): level
        # assignment is label-deterministic (_level_for), so the wave
        # boundaries are known upfront — level-1+ labels (and label 0,
        # the entry seed) insert sequentially, runs of level-0 labels
        # between them wave. Same recall-parity gate as the rest of the
        # bulk body. Dim-gated (<= 64): measured min-of-3 vs per-row
        # slab at m16/ef40 — 6000x16 3.71->3.38s, 4000x32 4.53->3.98s,
        # 4000x64 5.38->5.24s, but 4000x128 4.24->4.87s (the wide
        # high-dim waves over-expand past ef and the select/connect
        # phase dominates there anyway); recall identical at every
        # shape.
        i = 0
        while i < n:
            if i == 0 or _level_for(i, g.ml) > 0:
                g.insert(vectors[i], _slab_B=slab_b)
                i += 1
                continue
            j = i
            while (j < n and j - i < WAVE_ROWS
                   and _level_for(j, g.ml) == 0):
                j += 1
            if j - i > 1:
                g._insert_wave0(vectors[i:j], slab_b)
            else:
                g.insert(vectors[i], _slab_B=slab_b)
            i = j
        g._finalize_slack()
        return g
    for v in vectors:
        g.insert(v, _slab_B=slab_b)
    g._finalize_slack()
    return g
