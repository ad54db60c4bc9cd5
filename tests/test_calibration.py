"""Per-index measured probe calibration (round 9, index/calibration.py).

The contract under test, per the verdict brief:
* CREATE INDEX measures recall-vs-nprobe on a held-out sample and the
  manifest carries the floor-clearing probe count;
* on CLUSTERED data the measured count sits far below the static
  uniform-worst-case rule, and nprobe=0 search still clears the 0.70
  floor;
* on ~uniform data the measurement lands near the static rule and the
  floor still holds;
* calibration_queries=0 disables (manifest None, static rule used);
* vacuum re-measures; a layout-changing rebuild clears stale values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from duckdb_ann_spark.index import (
    Catalog,
    create_index,
    drop_index,
    index_scan,
    vacuum_index,
)
from duckdb_ann_spark.index.calibration import (
    IVF_TARGET,
    ROUTED_TARGET,
    calibrated_nprobe,
)
from duckdb_ann_spark.index.ivf import auto_nprobe, auto_route_nprobe

DIM = 48
N = 9_000
N_CLUSTERS = 24


@pytest.fixture(scope="module")
def cat(tmp_path_factory):
    return Catalog(str(tmp_path_factory.mktemp("cal_idx")))


def _frames(spark):
    rng = np.random.default_rng(42)
    centers = rng.random((N_CLUSTERS, DIM), dtype=np.float32)
    cid = np.arange(N) % N_CLUSTERS
    cl = centers[cid] + rng.normal(0, 0.02, (N, DIM)).astype(np.float32)
    un = rng.random((N, DIM), dtype=np.float32)
    mk = lambda m: spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(N), "embedding": list(m)})
    )
    return mk(cl), cl, mk(un), un, centers, rng


@pytest.fixture(scope="module")
def data(spark):
    return _frames(spark)


def _recall(rows, mat, queries, k=10):
    got: dict[int, set] = {}
    for r in rows:
        got.setdefault(r["query_idx"], set()).add(r["vec_id"])
    hit = 0
    for i, q in enumerate(queries):
        d = ((mat - q) ** 2).sum(axis=1)
        truth = set(np.lexsort((np.arange(len(mat)), d))[:k].tolist())
        hit += len(got.get(i, set()) & truth)
    return hit / (len(queries) * k)


def test_ivf_clustered_measures_far_below_static_rule(spark, data, cat):
    cl_df, cl_mat, _, _, centers, rng = data
    m = create_index(
        cl_df, "vec_id", "embedding", "cal_ivf_cl", engine="faiss",
        type="IVFFlat", ivf_nlist=0, nprobe=0, catalog=cat,
    )
    cal = m["calibration"]
    assert cal is not None and cal["target"] == IVF_TARGET
    nlist = m["nlist_effective"]
    static = auto_nprobe(nlist, DIM)
    # "well below the uniform rule" — on 24 clean gaussian clusters the
    # cell ranking finds neighbors within a handful of probes
    assert cal["nprobe"] <= static // 3, (cal["nprobe"], static)
    assert cal["recall_at_nprobe"] >= IVF_TARGET
    # curve is monotone and ends at 1.0
    assert cal["recall"] == sorted(cal["recall"])
    assert cal["recall"][-1] == 1.0
    # nprobe=0 search rides the measurement and clears the floor
    queries = centers[np.arange(40) % N_CLUSTERS] + rng.normal(
        0, 0.02, (40, DIM)
    ).astype(np.float32)
    rows = index_scan(spark, "cal_ivf_cl", queries, 10, catalog=cat).collect()
    assert _recall(rows, cl_mat, queries) >= 0.70
    drop_index("cal_ivf_cl", cat)


def test_ivf_uniform_measures_near_static_rule_and_floor_holds(
    spark, data, cat
):
    _, _, un_df, un_mat, _, rng = data
    m = create_index(
        un_df, "vec_id", "embedding", "cal_ivf_un", engine="faiss",
        type="IVFFlat", ivf_nlist=0, nprobe=0, catalog=cat,
    )
    cal = m["calibration"]
    nlist = m["nlist_effective"]
    static = auto_nprobe(nlist, DIM)
    # uniform IS the static rule's calibration regime: the measurement
    # may undercut its margin but not collapse (>= 1/3 of the rule)
    assert static // 3 <= cal["nprobe"] <= int(static * 1.5)
    queries = rng.random((40, DIM), dtype=np.float32)
    rows = index_scan(spark, "cal_ivf_un", queries, 10, catalog=cat).collect()
    assert _recall(rows, un_mat, queries) >= 0.70
    drop_index("cal_ivf_un", cat)


def test_calibration_disabled_records_none_and_uses_static_rule(
    spark, data, cat
):
    cl_df, _, _, _, _, _ = data
    m = create_index(
        cl_df, "vec_id", "embedding", "cal_off", engine="faiss",
        type="IVFFlat", ivf_nlist=32, nprobe=0, calibration_queries=0,
        catalog=cat,
    )
    assert m["calibration"] is None
    assert calibrated_nprobe(m) == 0  # callers fall back to the rule
    # search still works end-to-end through the static fallback
    q = [[0.5] * DIM]
    assert index_scan(spark, "cal_off", q, 5, catalog=cat).count() == 5
    drop_index("cal_off", cat)


def test_routed_vamana_clustered_measures_and_floor(spark, data, cat):
    cl_df, cl_mat, _, _, centers, rng = data
    m = create_index(
        cl_df, "vec_id", "embedding", "cal_vam", engine="diskann",
        max_degree=16, build_complexity=32, shards=N_CLUSTERS,
        shard_by="cells", catalog=cat,
    )
    rc = m["route_calibration"]
    assert rc is not None and rc["target"] == ROUTED_TARGET
    static = auto_route_nprobe(N_CLUSTERS, DIM)
    assert rc["nprobe"] <= max(2, static // 3), (rc["nprobe"], static)
    queries = centers[np.arange(30) % N_CLUSTERS] + rng.normal(
        0, 0.02, (30, DIM)
    ).astype(np.float32)
    rows = index_scan(spark, "cal_vam", queries, 10, catalog=cat).collect()
    assert _recall(rows, cl_mat, queries) >= 0.70
    drop_index("cal_vam", cat)


def test_hash_build_records_no_route_calibration(spark, data, cat):
    cl_df = data[0]
    m = create_index(
        cl_df, "vec_id", "embedding", "cal_hash", engine="diskann",
        max_degree=16, build_complexity=32, shards=4, shard_by="hash",
        catalog=cat,
    )
    assert m["route_calibration"] is None
    drop_index("cal_hash", cat)


def test_vacuum_remeasures(spark, data, cat):
    """Vacuum rebuilds through build(), so the manifest's measurement is
    refreshed against the surviving rows (the staleness contract)."""
    from duckdb_ann_spark.index import delete_from_index

    cl_df = data[0]
    m = create_index(
        cl_df, "vec_id", "embedding", "cal_vac", engine="faiss",
        type="IVFFlat", ivf_nlist=0, nprobe=0, catalog=cat,
    )
    before = m["calibration"]
    assert before is not None
    delete_from_index(spark, "cal_vac", list(range(0, N, 3)), catalog=cat)
    m2 = vacuum_index(spark, "cal_vac", catalog=cat)
    after = m2["calibration"]
    assert after is not None
    assert after["n_queries"] > 0 and after["recall_at_nprobe"] >= IVF_TARGET
    drop_index("cal_vac", cat)


def test_measure_handles_degenerate_inputs(spark):
    """<=1 cell / <2 rows / zero queries → None (auto rule fallback)."""
    from duckdb_ann_spark.index.calibration import measure_probe_calibration

    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0, 1], "embedding": [[0.0, 0.0], [1.0, 1.0]]})
    )
    one_cell = np.zeros((1, 2), dtype=np.float32)
    assert measure_probe_calibration(
        df, "vec_id", "embedding", one_cell, "l2", 2, 0.78
    ) is None
    cells = np.array([[0.0, 0.0], [1.0, 1.0]], dtype=np.float32)
    assert measure_probe_calibration(
        df, "vec_id", "embedding", cells, "l2", 1, 0.78
    ) is None
    assert measure_probe_calibration(
        df, "vec_id", "embedding", cells, "l2", 2, 0.78, n_queries=0
    ) is None
    # 2 rows / 2 cells is measurable: k clamps to 1, nprobe in range
    out = measure_probe_calibration(
        df, "vec_id", "embedding", cells, "l2", 2, 0.78
    )
    assert out is not None and 1 <= out["nprobe"] <= 2 and out["k"] == 1


def test_target_recall_resolves_from_stored_curve(spark, data, cat):
    """index_scan(target_recall=) rides the manifest's measured curve:
    a higher target probes at least as many cells as the build default,
    a tiny target probes fewer, and the floor still holds at the
    build's own target."""
    cl_df, cl_mat, _, _, centers, rng = data
    m = create_index(
        cl_df, "vec_id", "embedding", "tr_ivf", engine="faiss",
        type="IVFFlat", ivf_nlist=0, nprobe=0, catalog=cat,
    )
    from duckdb_ann_spark.index.calibration import nprobe_for_target

    default_np = m["calibration"]["nprobe"]
    assert nprobe_for_target(m, 0.99) >= default_np
    assert 0 < nprobe_for_target(m, 0.2) <= default_np
    # target 1.0 resolves to the smallest stored point whose measured
    # recall is 1.0 (on clean clusters that's far below nlist)
    p_full = nprobe_for_target(m, 1.0)
    i_full = m["calibration"]["probes"].index(p_full)
    assert m["calibration"]["recall"][i_full] == 1.0
    assert i_full == 0 or m["calibration"]["recall"][i_full - 1] < 1.0

    queries = centers[np.arange(40) % N_CLUSTERS] + rng.normal(
        0, 0.02, (40, DIM)
    ).astype(np.float32)
    rows = index_scan(
        spark, "tr_ivf", queries, 10, catalog=cat, target_recall=0.95
    ).collect()
    assert len(rows) == 40 * 10
    got: dict[int, set] = {}
    for r in rows:
        got.setdefault(r["query_idx"], set()).add(r["vec_id"])
    hit = 0
    for i, q in enumerate(queries):
        d = ((cl_mat - q) ** 2).sum(axis=1)
        truth = set(np.lexsort((np.arange(N), d))[:10].tolist())
        hit += len(got[i] & truth)
    assert hit / 400 >= 0.80  # 0.95 cell-coverage target, sampled curve
    # low target still returns k rows per query (fewer cells scanned)
    assert index_scan(
        spark, "tr_ivf", queries[:4], 10, catalog=cat, target_recall=0.2
    ).count() == 40
    drop_index("tr_ivf", cat)


def test_l_calibration_recorded_and_resolved(spark, data, cat):
    """A routed (cells) build measures the in-shard recall-vs-L curve
    (round 10): manifest carries `l_calibration` with the grid anchored
    at the engine's static default; search_complexity=None resolves
    through it; the default search clears the floor on clustered data."""
    from duckdb_ann_spark.index.calibration import L_TARGET, calibrated_l
    from duckdb_ann_spark.index.vamana import _resolve_search_complexity

    cl_df, cl_mat, _, _, centers, rng = data
    m = create_index(
        cl_df, "vec_id", "embedding", "lcal_vam", engine="diskann",
        max_degree=16, build_complexity=32, shards=N_CLUSTERS,
        shard_by="cells", catalog=cat,
    )
    lc = m["l_calibration"]
    assert lc is not None and lc["target"] == L_TARGET
    assert lc["base"] == 32  # build_complexity is the static default L
    assert lc["ls"][0] == 32 and lc["search_complexity"] in lc["ls"]
    assert lc["search_complexity"] >= 32
    assert lc["rows_at_measurement"] == N
    # more beam width never hurts in-shard recall
    assert lc["recall"][-1] >= lc["recall"][0]
    assert lc["recall_at_l"] == lc["recall"][lc["ls"].index(
        lc["search_complexity"])]
    # resolution order: explicit > measured > None
    assert _resolve_search_complexity(m, 99) == 99
    assert _resolve_search_complexity(m, None) == lc["search_complexity"]
    assert calibrated_l({"l_calibration": None}) == 0
    assert _resolve_search_complexity({"params": {}}, None) is None
    # end-to-end: default search (None L) rides the measurement and
    # holds the floor on the clustered corpus
    queries = centers[np.arange(30) % N_CLUSTERS] + rng.normal(
        0, 0.02, (30, DIM)
    ).astype(np.float32)
    rows = index_scan(spark, "lcal_vam", queries, 10, catalog=cat).collect()
    assert _recall(rows, cl_mat, queries) >= 0.70
    drop_index("lcal_vam", cat)


def test_l_calibration_gates(spark, data, cat):
    """calibration_queries=0 and hash layouts record no L measurement;
    HNSW cells builds anchor the grid at ef_construction."""
    cl_df = data[0]
    m = create_index(
        cl_df, "vec_id", "embedding", "lcal_off", engine="diskann",
        max_degree=16, build_complexity=32, shards=N_CLUSTERS,
        shard_by="cells", calibration_queries=0, catalog=cat,
    )
    assert m["l_calibration"] is None
    drop_index("lcal_off", cat)
    m = create_index(
        cl_df, "vec_id", "embedding", "lcal_hash", engine="diskann",
        max_degree=16, build_complexity=32, shards=4, shard_by="hash",
        catalog=cat,
    )
    assert m["l_calibration"] is None
    drop_index("lcal_hash", cat)
    m = create_index(
        cl_df, "vec_id", "embedding", "lcal_hnsw", engine="faiss",
        type="HNSW", hnsw_m=16, shards=N_CLUSTERS, shard_by="cells",
        catalog=cat,
    )
    lc = m["l_calibration"]
    assert lc is not None and lc["base"] == 40  # max(2*16, 40)
    drop_index("lcal_hnsw", cat)


def test_target_recall_routed_graph_and_errors(spark, data, cat):
    """Round 11: target_recall on routed graphs is an END-recall
    contract — (route_nprobe, L) resolve jointly from the two measured
    curves, deflated by the index's own measured end/predicted ratio;
    targets beyond the composable maximum fail loud instead of
    silently under-delivering."""
    import pytest as _pytest

    cl_df, cl_mat, _, _, centers, rng = data
    m = create_index(
        cl_df, "vec_id", "embedding", "tr_vam", engine="diskann",
        max_degree=16, build_complexity=32, shards=N_CLUSTERS,
        shard_by="cells", catalog=cat,
    )
    # the build measured all three calibrations (fused pass)
    assert m["route_calibration"] is not None
    assert m["l_calibration"] is not None
    ec = m["end_calibration"]
    assert ec is not None and 0 < ec["recall"] <= 1.0
    assert ec["route_nprobe"] >= 1 and ec["search_complexity"] >= 1
    # round 12 (r11 verdict item 4): the anchor is a first-class
    # ann_index_info row, not a manifest-only fact
    from duckdb_ann_spark.index import ann_index_info

    info = ann_index_info(spark, cat).where("name = 'tr_vam'").head()
    assert info["end_recall"] == ec["recall"], info
    assert info["end_predicted"] == ec["predicted"], info
    assert info["end_route_nprobe"] == ec["route_nprobe"], info
    assert info["end_search_complexity"] == ec["search_complexity"], info
    queries = centers[:8] + rng.normal(0, 0.02, (8, DIM)).astype(np.float32)
    rows = index_scan(
        spark, "tr_vam", queries, 10, catalog=cat, target_recall=0.8
    ).collect()
    assert len(rows) == 80
    # the composed config must actually DELIVER the asked end recall on
    # in-distribution queries (cluster-core query set, the hard case)
    assert _recall(rows, cl_mat, queries, 10) >= 0.8
    # an impossible ask fails loud with the composable maximum
    with _pytest.raises(ValueError, match="not composable"):
        index_scan(spark, "tr_vam", queries, 10, catalog=cat,
                   target_recall=0.9999)
    # graphs: both-knobs is over-constrained (the resolution owns both)
    with _pytest.raises(ValueError, match="not both"):
        index_scan(spark, "tr_vam", queries, 10, catalog=cat,
                   search_complexity=64, target_recall=0.8)
    drop_index("tr_vam", cat)

    # unmeasured artifacts fail loud, in both families
    create_index(
        cl_df, "vec_id", "embedding", "tr_off", engine="faiss",
        type="IVFFlat", ivf_nlist=24, nprobe=0, calibration_queries=0,
        catalog=cat,
    )
    # an anchor-less artifact reports the deterministic sentinels
    info = ann_index_info(spark, cat).where("name = 'tr_off'").head()
    assert info["end_recall"] == -1.0 and info["end_predicted"] == -1.0
    assert info["end_route_nprobe"] == 0
    assert info["end_search_complexity"] == 0
    with _pytest.raises(ValueError, match="no measured recall curve"):
        index_scan(spark, "tr_off", [[0.5] * DIM], 5, catalog=cat,
                   target_recall=0.9)
    with _pytest.raises(ValueError, match="not both"):
        index_scan(spark, "tr_off", [[0.5] * DIM], 5, catalog=cat,
                   search_complexity=4, target_recall=0.9)
    with _pytest.raises(ValueError, match="in \\(0, 1\\]"):
        index_scan(spark, "tr_off", [[0.5] * DIM], 5, catalog=cat,
                   target_recall=1.5)
    drop_index("tr_off", cat)
    create_index(
        cl_df, "vec_id", "embedding", "tr_hash", engine="diskann",
        max_degree=16, build_complexity=32, shards=4, shard_by="hash",
        catalog=cat,
    )
    with _pytest.raises(ValueError, match="no measured routing curve"):
        index_scan(spark, "tr_hash", [[0.5] * DIM], 5, catalog=cat,
                   target_recall=0.9)
    drop_index("tr_hash", cat)


def test_resolve_end_recall_unit():
    """Pure-curve unit contract of the joint (route_nprobe, L)
    resolution (round 11): cheapest p*L pair whose composed product
    clears the target, deflated by the index's own measured
    end/predicted ratio; loud failures for missing curves and
    uncomposable targets."""
    from duckdb_ann_spark.index.calibration import resolve_end_recall

    mani = {
        "route_calibration": {
            "probes": [1, 2, 4, 24], "recall": [0.6, 0.9, 0.97, 1.0],
        },
        "l_calibration": {
            "ls": [32, 64, 128], "recall": [0.8, 0.9, 0.95],
        },
    }
    # no end anchor (pre-round-11 artifact): raw curve-product rule —
    # target .72 -> (2, 32) is the cheapest feasible pair
    # (0.9*0.8=0.72 at cost 64; (1, any) cannot)
    assert resolve_end_recall(mani, 0.72) == (2, 32)
    # higher target walks BOTH knobs up; (4,64): 0.97*0.9=0.873,
    # cost 256 beats (2,128): 0.9*0.95=0.855 infeasible at 0.86
    assert resolve_end_recall(mani, 0.86) == (4, 64)
    # uncomposable: max product 1.0*0.95 < 0.99
    with pytest.raises(ValueError, match="not composable"):
        resolve_end_recall(mani, 0.99)
    # WITH a measured end anchor at (2, 64): end 0.80 at predicted
    # 0.81 — targets at/under 0.80 return the anchor config itself
    # (the one point certified end-to-end; the 500-query measurement
    # showed cheaper extrapolation under-delivers)
    mani_a = {**mani, "end_calibration": {
        "route_nprobe": 2, "search_complexity": 64,
        "recall": 0.80, "predicted": 0.81,
    }}
    assert resolve_end_recall(mani_a, 0.72) == (2, 64)
    assert resolve_end_recall(mani_a, 0.80) == (2, 64)
    # above the anchor: monotone up-scaling (p>=2, L>=64) with the
    # predicted product grown by target/end: target 0.85 -> required
    # product 0.81*0.85/0.80 ~= 0.861 -> (4, 64) (0.873, cost 256)
    # over (2, 128) (0.855 infeasible)
    assert resolve_end_recall(mani_a, 0.85) == (4, 64)
    # the up-scaled claim is still bounded by the curve maxima
    with pytest.raises(ValueError, match="not composable"):
        resolve_end_recall(mani_a, 0.97)
    # missing curves fail loud with the actionable message
    with pytest.raises(ValueError, match="no measured routing curve"):
        resolve_end_recall({"l_calibration": mani["l_calibration"]}, 0.8)
    with pytest.raises(ValueError, match="no measured in-shard L curve"):
        resolve_end_recall(
            {"route_calibration": mani["route_calibration"]}, 0.8
        )


def test_calibration_stale_flag(spark, data, cat):
    """ann_index_info reports calibration_stale once appends drift past
    CALIBRATION_STALE_FRACTION of rows_at_measurement; vacuum
    re-measures and clears it (round 10)."""
    from pyspark.sql import functions as F

    from duckdb_ann_spark.index import ann_index_info, insert_into_index
    from duckdb_ann_spark.index.calibration import (
        CALIBRATION_STALE_FRACTION,
        calibration_stale,
    )

    cl_df = data[0]
    m = create_index(
        cl_df, "vec_id", "embedding", "stale_ivf", engine="faiss",
        type="IVFFlat", ivf_nlist=0, nprobe=0, catalog=cat,
    )
    assert m["calibration"]["rows_at_measurement"] == N

    def _flag():
        return ann_index_info(spark, cat).where(
            F.col("name") == "stale_ivf"
        ).head()["calibration_stale"]

    assert _flag() is False
    # a small append stays under the threshold
    small = cl_df.limit(10).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    insert_into_index(spark, "stale_ivf", small, catalog=cat)
    assert _flag() is False
    # drift past the fraction -> stale
    big_n = int(N * CALIBRATION_STALE_FRACTION) + 20
    big = cl_df.limit(big_n).select(
        (F.col("vec_id") + 20_000_000).alias("vec_id"), "embedding"
    )
    insert_into_index(spark, "stale_ivf", big, catalog=cat)
    assert _flag() is True
    # vacuum rebuilds + re-measures on the grown corpus -> fresh again
    m2 = vacuum_index(spark, "stale_ivf", cat)
    assert m2["calibration"]["rows_at_measurement"] == N + 10 + big_n
    assert _flag() is False
    drop_index("stale_ivf", cat)

    # pure-function contract: tombstones count toward drift; missing
    # rows_at_measurement (pre-round-10 artifacts) is undecidable-false
    base = {"num_vectors": 1000, "num_deleted": 0,
            "calibration": {"nprobe": 3, "rows_at_measurement": 1000}}
    assert calibration_stale(base) is False
    assert calibration_stale({**base, "num_deleted": 300}) is True
    assert calibration_stale({**base, "num_vectors": 1300}) is True
    assert calibration_stale(
        {"num_vectors": 9000, "calibration": {"nprobe": 3}}
    ) is False
    assert calibration_stale({"num_vectors": 9000}) is False


def test_recalibrate_index_clears_stale_without_rebuild(spark, data, cat):
    """Round 11: recalibrate_index re-runs ONLY the measurement passes
    against the live artifact — append past the stale threshold, flag
    flips, recalibrate clears it WITHOUT a rebuild (shard files
    untouched), and searches ride the fresh curves."""
    import os

    from pyspark.sql import functions as F

    from duckdb_ann_spark.index import (
        ann_index_info,
        delete_from_index,
        insert_into_index,
        recalibrate_index,
    )
    from duckdb_ann_spark.index.calibration import CALIBRATION_STALE_FRACTION

    cl_df, cl_mat, _, _, centers, rng = data
    m = create_index(
        cl_df, "vec_id", "embedding", "recal_vam", engine="diskann",
        max_degree=16, build_complexity=32, shards=N_CLUSTERS,
        shard_by="cells", catalog=cat,
    )
    assert m["route_calibration"] is not None
    d = cat.path("recal_vam")

    def _flag():
        return ann_index_info(spark, cat).where(
            F.col("name") == "recal_vam"
        ).head()["calibration_stale"]

    assert _flag() is False
    big_n = int(N * CALIBRATION_STALE_FRACTION) + 50
    big = cl_df.limit(big_n).select(
        (F.col("vec_id") + 30_000_000).alias("vec_id"), "embedding"
    )
    insert_into_index(spark, "recal_vam", big, catalog=cat)
    # a few tombstones too: the live-rows discipline must hold
    delete_from_index(spark, "recal_vam", list(range(20)), catalog=cat)
    assert _flag() is True
    # snapshot AFTER the appends (which may rewrite shards), right
    # before the recalibrate — measurement must not touch graph files
    shard_mtimes = {
        f: os.path.getmtime(os.path.join(d, "graph", f))
        for f in os.listdir(os.path.join(d, "graph"))
    }

    m2 = recalibrate_index(spark, "recal_vam", catalog=cat)
    assert _flag() is False
    # counters anchored at the CURRENT state, not a rebuild's
    assert m2["route_calibration"]["rows_at_measurement"] == N + big_n
    assert m2["route_calibration"]["deleted_at_measurement"] == 20
    assert m2["l_calibration"] is not None
    assert m2["end_calibration"] is not None
    assert 0.0 < m2["end_calibration"]["recall"] <= 1.0
    # NO rebuild happened: recalibrate left every shard file untouched
    after = {
        f: os.path.getmtime(os.path.join(d, "graph", f))
        for f in os.listdir(os.path.join(d, "graph"))
    }
    assert after == shard_mtimes
    # searches ride the fresh curves end-to-end (incl. target_recall)
    queries = centers[:4] + rng.normal(0, 0.02, (4, DIM)).astype(np.float32)
    rows = index_scan(
        spark, "recal_vam", queries, 10, catalog=cat, target_recall=0.75
    ).collect()
    assert len(rows) == 40
    drop_index("recal_vam", cat)

    # IVF path: fresh curve lands under 'calibration'
    create_index(
        cl_df, "vec_id", "embedding", "recal_ivf", engine="faiss",
        type="IVFFlat", ivf_nlist=0, nprobe=0, catalog=cat,
    )
    m3 = recalibrate_index(spark, "recal_ivf", catalog=cat)
    assert m3["calibration"]["rows_at_measurement"] == N
    assert m3["calibration"]["deleted_at_measurement"] == 0
    drop_index("recal_ivf", cat)

    # layered-HNSW routed: same VamanaEngine branch, own kernel/base-L
    create_index(
        cl_df, "vec_id", "embedding", "recal_hnsw", engine="faiss",
        type="HNSW", hnsw_m=16, shards=N_CLUSTERS, shard_by="cells",
        catalog=cat,
    )
    m4 = recalibrate_index(spark, "recal_hnsw", catalog=cat)
    assert m4["l_calibration"] is not None
    assert m4["end_calibration"] is not None
    drop_index("recal_hnsw", cat)

    # nothing-to-measure surfaces fail loud
    create_index(
        cl_df, "vec_id", "embedding", "recal_flat", engine="faiss",
        type="Flat", catalog=cat,
    )
    with pytest.raises(ValueError, match="no calibration"):
        recalibrate_index(spark, "recal_flat", catalog=cat)
    drop_index("recal_flat", cat)
    create_index(
        cl_df, "vec_id", "embedding", "recal_pin", engine="faiss",
        type="IVFFlat", ivf_nlist=24, nprobe=4, catalog=cat,
    )
    with pytest.raises(ValueError, match="pins nprobe"):
        recalibrate_index(spark, "recal_pin", catalog=cat)
    drop_index("recal_pin", cat)
    create_index(
        cl_df, "vec_id", "embedding", "recal_hash", engine="diskann",
        max_degree=16, build_complexity=32, shards=4, shard_by="hash",
        catalog=cat,
    )
    with pytest.raises(ValueError, match="not a routed"):
        recalibrate_index(spark, "recal_hash", catalog=cat)
    drop_index("recal_hash", cat)


def test_l_calibration_duplicates_and_ip(spark, cat):
    """Round-10 review scenario: self-exclusion is BY ID, so duplicate
    vectors (deduped-then-appended corpora) don't get miscounted as
    self, and IP metric — where the query's own row need not rank
    first — measures sanely."""
    rng = np.random.default_rng(11)
    n_cl, n, dim = 12, 3_000, 16
    centers = rng.random((n_cl, dim), dtype=np.float32)
    mat = (
        centers[np.arange(n) % n_cl]
        + rng.normal(0, 0.02, (n, dim)).astype(np.float32)
    )
    mat[1::2] = mat[::2]  # every vector duplicated under a second id
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n), "embedding": list(mat)})
    )
    for name, metric in (("lcal_dup", "l2"), ("lcal_ip", "ip")):
        m = create_index(
            df, "vec_id", "embedding", name, engine="diskann",
            max_degree=16, build_complexity=32, shards=n_cl,
            shard_by="cells", metric=metric, catalog=cat,
        )
        lc = m["l_calibration"]
        assert lc is not None, (name, m)
        assert 0.0 < lc["recall_at_l"] <= 1.0, lc
        assert all(0.0 <= r <= 1.0 for r in lc["recall"]), lc
        # duplicates make the true neighbor at distance 0 LEGITIMATE
        # (it is another id) — the curve must still be served: a search
        # at the measured L returns k rows
        rows = index_scan(
            spark, name, [list(mat[0])], 5, catalog=cat
        ).collect()
        assert len(rows) == 5
        drop_index(name, cat)
