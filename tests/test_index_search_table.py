"""index_search_table: DataFrame-queries search against every engine —
the unbounded-query-side scale path past ann_search_table's driver
collect. Exactness pinned against index_scan (same index, same queries)
per engine; routing, tombstones, dim-mismatch and the no-driver-collect
plan shape are covered."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_ann_spark.index import (
    Catalog,
    create_index,
    delete_from_index,
    drop_index,
    index_scan,
    index_search_table,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "indexes"))


def _scan_pairs(spark, name, emb, cat, k, n_q, **scan_kw):
    """Reference result via the driver-list API: {(qid, hit_id), ...}
    plus per-query hit lists for exact comparison."""
    qs = [
        [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id") < n_q).orderBy("vec_id").collect()
    ]
    rows = index_scan(spark, name, qs, k, catalog=cat, **scan_kw).collect()
    out = {}
    for r in rows:
        out.setdefault(r["query_idx"], set()).add(r["vec_id"])
    return out


def _table_pairs(spark, name, emb, cat, k, n_q, **kw):
    q = emb.where(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    rows = index_search_table(
        spark, name, q, "qid", "embedding", k, catalog=cat, **kw
    ).collect()
    out = {}
    for r in rows:
        out.setdefault(r["qid"], set()).add(r["vec_id"])
    return out


@pytest.mark.parametrize("engine,opts,scan_kw", [
    ("diskann", dict(max_degree=16, build_complexity=32, shards=4), {}),
    ("faiss", dict(type="HNSW", hnsw_m=8, shards=4), {}),
    ("faiss", dict(type="IVFFlat", ivf_nlist=8, nprobe=8), {}),
    ("faiss", dict(type="Flat"), {}),
])
def test_matches_index_scan_per_engine(spark, emb, cat, engine, opts, scan_kw):
    """The DataFrame-queries path returns the same id sets as the
    driver-list index_scan on the same index (deterministic engines,
    identical parameters)."""
    create_index(emb, "vec_id", "embedding", "ist", engine=engine,
                 catalog=cat, **opts)
    want = _scan_pairs(spark, "ist", emb, cat, k=5, n_q=12, **scan_kw)
    got = _table_pairs(spark, "ist", emb, cat, k=5, n_q=12)
    assert got == want
    drop_index("ist", cat)


def test_routed_graph_in_task_routing(spark, emb, cat):
    """shard_by='cells': routing decisions move into the executor task
    (broadcast centroids) and must match the driver-routed index_scan."""
    create_index(
        emb, "vec_id", "embedding", "istr", engine="diskann", max_degree=16,
        build_complexity=32, shards=16, shard_by="cells", catalog=cat,
    )
    want = _scan_pairs(spark, "istr", emb, cat, k=5, n_q=20)
    got = _table_pairs(spark, "istr", emb, cat, k=5, n_q=20)
    assert got == want


def test_tombstones_and_dim_mismatch(spark, emb, cat):
    create_index(emb, "vec_id", "embedding", "istt", engine="diskann",
                 max_degree=16, build_complexity=32, shards=2, catalog=cat)
    delete_from_index(spark, "istt", [0, 1], catalog=cat)
    q = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    # one ragged query row: dropped, others unaffected (per-row reading
    # of the reference's empty-on-mismatch contract)
    ragged = q.withColumn(
        "embedding",
        F.when(F.col("qid") == 5, F.slice("embedding", 1, 3)).otherwise(
            F.col("embedding")
        ),
    )
    out = index_search_table(
        spark, "istt", ragged, "qid", "embedding", 4, catalog=cat
    ).toPandas()
    assert set(out.qid) == {0, 1, 2, 3, 4}
    assert (out.groupby("qid").size() == 4).all()
    assert not set(out.vec_id) & {0, 1}


def test_ivfflat_dim_mismatch_dropped(spark, emb, cat):
    """Round-8 (r7 advice): the IVFFlat branch delegates to
    index_knn_join — a ragged query row must be DROPPED per-row like the
    other branches, not crash np.vstack inside the assignment kernel."""
    create_index(emb, "vec_id", "embedding", "istiv", engine="faiss",
                 type="IVFFlat", ivf_nlist=8, nprobe=8, catalog=cat)
    q = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    ragged = q.withColumn(
        "embedding",
        F.when(F.col("qid") == 5, F.slice("embedding", 1, 3)).otherwise(
            F.col("embedding")
        ),
    )
    out = index_search_table(
        spark, "istiv", ragged, "qid", "embedding", 4, catalog=cat
    ).toPandas()
    assert set(out.qid) == {0, 1, 2, 3, 4}
    assert (out.groupby("qid").size() == 4).all()


def test_non_integral_query_id_fails_fast(spark, emb, cat):
    """Round-8 (r7 advice + r8 review): a string query id would either
    silently NULL-collapse every query into one window group (graph
    path) or die mid-job in Arrow (IVF path) — index_search_table must
    raise up front, identically for every engine."""
    create_index(emb, "vec_id", "embedding", "istid", engine="diskann",
                 max_degree=16, build_complexity=32, shards=2, catalog=cat)
    create_index(emb, "vec_id", "embedding", "istid_ivf", engine="faiss",
                 type="IVFFlat", ivf_nlist=8, nprobe=8, catalog=cat)
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("string").alias("qid"), "embedding"
    )
    for name in ("istid", "istid_ivf"):
        with pytest.raises(ValueError, match="integral type"):
            index_search_table(spark, name, q, "qid", "embedding", 3,
                              catalog=cat)


def test_query_id_collision_renames(spark, emb, cat):
    """A query id column named like the index id column survives (same
    rename discipline as knn_join: output column `_q_<name>`)."""
    create_index(emb, "vec_id", "embedding", "istc", engine="faiss",
                 type="IVFFlat", ivf_nlist=8, nprobe=8, catalog=cat)
    q = emb.where(F.col("vec_id") < 5)
    out = index_search_table(
        spark, "istc", q, "vec_id", "embedding", 3, catalog=cat
    )
    assert set(out.columns) == {"_q_vec_id", "vec_id", "_distance"}
    assert out.count() == 5 * 3


def test_no_driver_collect_of_queries(spark, emb, cat):
    """The plan never CollectLimits or broadcasts the query side: the
    graph path is a mapInArrow over the query frame (round 13; was
    mapInPandas); result arrives without materializing queries on the
    driver (smoke: plan contains no BroadcastExchange on the query
    branch before the search)."""
    create_index(emb, "vec_id", "embedding", "istp", engine="diskann",
                 max_degree=16, build_complexity=32, shards=2, catalog=cat)
    q = emb.select(F.col("vec_id").alias("qid"), "embedding")
    out = index_search_table(spark, "istp", q, "qid", "embedding", 3,
                             catalog=cat)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan
    n = out.count()
    assert n == emb.count() * 3


def test_target_recall_on_table_surface(spark, emb, cat):
    """index_search_table(target_recall=) speaks the index_scan
    contract (round 10): same engine dispatch, same resolved probes —
    so the id sets match index_scan at the same target; unmeasured
    artifacts fail loud."""
    # IVF with a measured curve (auto build)
    create_index(emb, "vec_id", "embedding", "tr_ivf_t", engine="faiss",
                 type="IVFFlat", ivf_nlist=0, nprobe=0, catalog=cat)
    want = _scan_pairs(spark, "tr_ivf_t", emb, cat, k=5, n_q=12,
                       target_recall=0.95)
    got = _table_pairs(spark, "tr_ivf_t", emb, cat, k=5, n_q=12,
                       target_recall=0.95)
    assert got == want
    drop_index("tr_ivf_t", cat)

    # routed graph with a measured routing curve
    create_index(
        emb, "vec_id", "embedding", "tr_vam_t", engine="diskann",
        max_degree=16, build_complexity=32, shards=16, shard_by="cells",
        catalog=cat,
    )
    want = _scan_pairs(spark, "tr_vam_t", emb, cat, k=5, n_q=12,
                       target_recall=0.97)
    got = _table_pairs(spark, "tr_vam_t", emb, cat, k=5, n_q=12,
                       target_recall=0.97)
    assert got == want
    drop_index("tr_vam_t", cat)

    # unmeasured (hash layout) fails loud on the table surface too
    create_index(emb, "vec_id", "embedding", "tr_hash_t", engine="diskann",
                 max_degree=16, build_complexity=32, shards=4,
                 shard_by="hash", catalog=cat)
    q = emb.limit(3).select(F.col("vec_id").alias("qid"), "embedding")
    with pytest.raises(ValueError, match="no measured routing curve"):
        index_search_table(spark, "tr_hash_t", q, "qid", "embedding", 3,
                           catalog=cat, target_recall=0.9)
    drop_index("tr_hash_t", cat)

    # Flat satisfies any target by construction
    create_index(emb, "vec_id", "embedding", "tr_flat_t", engine="faiss",
                 type="Flat", catalog=cat)
    out = index_search_table(spark, "tr_flat_t", q, "qid", "embedding", 3,
                             catalog=cat, target_recall=1.0)
    assert out.count() == 9
    drop_index("tr_flat_t", cat)
