"""Planner gates (ann_optimizer.cpp ports), insert/append, streaming build."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_ann_spark.index import (
    Catalog,
    create_index,
    diskann_streaming_build,
    faiss_gpu_info,
    index_scan,
    insert_into_index,
)
from duckdb_ann_spark.index.streaming_build import read_raw_vectors, write_raw_vectors
from duckdb_ann_spark.index.file_format import read_diskann
from duckdb_ann_spark.operators.topk import topk
from duckdb_ann_spark.plans import topk_auto


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "indexes"))


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(x) for x in
            emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]


def _flat(emb, cat, name="p"):
    create_index(emb, "vec_id", "embedding", name, engine="faiss",
                 table_name="embeddings", catalog=cat)


# ---- planner gates ---------------------------------------------------

def test_routes_to_index(spark, emb, qvec, cat):
    _flat(emb, cat)
    res, dec = topk_auto(emb, "embedding", qvec, 5, table_name="embeddings",
                         catalog=cat, explain=True)
    assert dec.strategy == "index_scan" and dec.engine == "FAISS"
    assert "ANN_INDEX_SCAN" in dec.describe()
    want = topk(emb, "embedding", qvec, 5, "l2", id_col="vec_id").collect()
    assert [(r.vec_id, r._distance) for r in res.collect()] == [
        (r.vec_id, r._distance) for r in want
    ]


def test_cosine_never_matches(spark, emb, qvec, cat):
    """faiss_optimizer.test:99-118: cosine queries never rewrite."""
    _flat(emb, cat)
    _, dec = topk_auto(emb, "embedding", qvec, 5, metric="cosine",
                       table_name="embeddings", catalog=cat, explain=True)
    assert dec.strategy == "brute_force"
    assert "cosine" in dec.gates[0]


def test_cross_metric_no_match(spark, emb, qvec, cat):
    _flat(emb, cat)  # l2 index
    _, dec = topk_auto(emb, "embedding", qvec, 5, metric="ip",
                       table_name="embeddings", catalog=cat, explain=True)
    assert dec.strategy == "brute_force"
    assert "no metric-compatible index" in dec.reason


def test_small_table_gate(spark, emb, qvec, cat):
    small = emb.where(F.col("vec_id") < 30)
    create_index(small, "vec_id", "embedding", "s", engine="faiss",
                 table_name="small", catalog=cat)
    _, dec = topk_auto(small, "embedding", qvec, 5, table_name="small",
                       catalog=cat, explain=True)
    assert dec.strategy == "brute_force" and "cheap" in dec.reason


def test_selectivity_gate(spark, emb, qvec, cat):
    _flat(emb, cat)
    n = emb.count()
    _, dec = topk_auto(emb, "embedding", qvec, int(n * 0.2),
                       table_name="embeddings", catalog=cat, explain=True)
    assert dec.strategy == "brute_force" and "relative" in dec.reason
    # graph index tolerates up to 30%
    create_index(emb, "vec_id", "embedding", "g", engine="diskann",
                 table_name="embeddings", max_degree=16, build_complexity=32,
                 catalog=cat)
    _, dec2 = topk_auto(emb, "embedding", qvec, int(n * 0.2),
                        table_name="embeddings", catalog=cat, explain=True)
    assert dec2.strategy == "index_scan"


def test_filtered_overfetch(spark, emb, qvec, cat):
    _flat(emb, cat)
    res, dec = topk_auto(
        emb, "embedding", qvec, 5, table_name="embeddings", catalog=cat,
        filter=F.col("label") >= 0, explain=True,  # selective-ish filter
    )
    rows = res.collect()
    assert len(rows) == 5
    want = topk(emb.where(F.col("label") >= 0), "embedding", qvec, 5, "l2",
                id_col="vec_id").collect()
    assert [(r.vec_id, r._distance) for r in rows] == [
        (r.vec_id, r._distance) for r in want
    ]


# ---- insert/append ---------------------------------------------------

@pytest.mark.parametrize("engine,opts", [
    ("faiss", {}),
    ("faiss", {"type": "IVFFlat", "ivf_nlist": 8, "nprobe": 8}),
    ("diskann", {"max_degree": 16, "build_complexity": 32}),
])
def test_insert_visible_in_search(spark, emb, qvec, cat, engine, opts):
    """diskann_basic.test:45-55: rows inserted after CREATE INDEX are
    found by subsequent searches."""
    old = emb.where(F.col("vec_id") != 0)
    name = f"ins_{engine}_{len(opts)}"
    create_index(old, "vec_id", "embedding", name, engine=engine,
                 table_name="embeddings", catalog=cat, **opts)
    m = insert_into_index(spark, name, emb.where(F.col("vec_id") == 0), cat)
    assert m["num_vectors"] == emb.count()
    hits = [r.vec_id for r in index_scan(spark, name, [qvec], 3, catalog=cat).collect()]
    assert hits[0] == 0  # the newly inserted exact match is found first


def test_insert_duplicate_id_rejected(spark, emb, cat):
    _flat(emb, cat)
    with pytest.raises(ValueError, match="already exist"):
        insert_into_index(spark, "p", emb.limit(3), cat)


def test_insert_dim_mismatch_rejected(spark, emb, cat):
    _flat(emb, cat)
    bad = spark.createDataFrame([(9999, [1.0, 2.0])],
                                "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match=r"FLOAT\[N\]"):
        insert_into_index(spark, "p", bad, cat)


# ---- streaming build + gpu info -------------------------------------

def test_streaming_build_raw_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    vecs = rng.random((300, 8), dtype=np.float32)
    raw = str(tmp_path / "v.bin")
    write_raw_vectors(raw, vecs)
    assert np.array_equal(read_raw_vectors(raw), vecs)
    out = str(tmp_path / "v.diskann")
    n, dim, used = diskann_streaming_build(raw, out, max_degree=16,
                                           build_complexity=32, sample_size=50)
    assert (n, dim, used) == (300, 8, 50)
    g = read_diskann(out)
    got = [i for i, _ in g.search(vecs[5], k=5)]
    assert 5 in got[:2]


def test_streaming_build_missing_input(tmp_path):
    with pytest.raises(FileNotFoundError, match="does not exist"):
        diskann_streaming_build(str(tmp_path / "nope.bin"), str(tmp_path / "o"))


def test_streaming_build_from_parquet(spark, sf_dir, tmp_path):
    out = str(tmp_path / "emb.diskann")
    n, dim, used = diskann_streaming_build(
        f"{sf_dir}/embeddings.parquet", out, max_degree=16, build_complexity=32,
        spark=spark,
    )
    assert dim == 64 and n > 0 and used <= n
    assert read_diskann(out).n == n


def test_streaming_build_fallback_row_cap(spark, sf_dir, tmp_path,
                                          monkeypatch):
    """The Spark fallback (input unreadable by pyarrow) must refuse huge
    inputs with a clear error instead of collecting them to the driver."""
    import duckdb_ann_spark.index.streaming_build as sb

    def boom(path):
        raise OSError("simulated: pyarrow cannot open this path scheme")

    monkeypatch.setattr(sb, "_parquet_count", boom)
    monkeypatch.setattr(sb, "MAX_FALLBACK_ROWS", 100)
    with pytest.raises(ValueError, match="exceeds 100 rows"):
        diskann_streaming_build(
            f"{sf_dir}/embeddings.parquet", str(tmp_path / "cap.diskann"),
            max_degree=16, build_complexity=32, spark=spark,
        )


def test_faiss_gpu_info(spark):
    rows = faiss_gpu_info(spark).collect()
    assert len(rows) == 1
    assert rows[0].available is False and "cpu" in rows[0].device


def test_streaming_build_multi_rowgroup_outofcore(tmp_path):
    """Parquet input streams row-group batches (never one full-table
    materialization): the chunk iterator must yield multiple bounded
    chunks for a multi-row-group file, and the built graph must match the
    all-at-once two-pass build exactly (same insert order)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_ann_spark.index.streaming_build import _iter_parquet_chunks
    from duckdb_ann_spark.index.vamana_core import two_pass_build

    rng = np.random.default_rng(7)
    vecs = rng.random((500, 8), dtype=np.float32)
    path = str(tmp_path / "vecs.parquet")
    pq.write_table(
        pa.table({"embedding": [list(map(float, v)) for v in vecs]}),
        path, row_group_size=100,
    )
    chunks = list(_iter_parquet_chunks(path, "embedding"))
    assert len(chunks) >= 5  # row-group granularity, bounded memory
    assert max(len(c) for c in chunks) <= 100

    out = str(tmp_path / "s.diskann")
    n, dim, used = diskann_streaming_build(
        path, out, max_degree=16, build_complexity=32, sample_size=50
    )
    assert (n, dim, used) == (500, 8, 50)
    g = read_diskann(out)
    ref = two_pass_build(vecs, sample_size=50, max_degree=16,
                         build_complexity=32)
    assert g.n == ref.n
    assert np.array_equal(np.asarray(g.vectors[: g.n]), ref.vectors[: ref.n])
    assert np.array_equal(np.asarray(g.adjacency[: g.n]), ref.adjacency[: ref.n])


def test_default_k_bare_order_by(spark, emb, cat):
    """k=None models a LIMIT-less ORDER BY: the reference rewrites it with
    k=100 (src/ann_optimizer.cpp:475,554-557)."""
    from duckdb_ann_spark.plans import topk_auto

    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    res, dec = topk_auto(
        emb, "embedding", qvec, k=None, id_col="vec_id",
        table_name="embeddings", catalog=cat, explain=True,
    )
    assert res.count() == 100


def test_filtered_path_runs_join_once(spark, emb, cat):
    """The filtered index route materializes the joined+filtered result
    ONCE (localCheckpoint): the returned plan must read the checkpointed
    RDD, not contain the index-hits join — re-executing the join for the
    sufficiency count was the round-2 double-execution finding."""
    _flat(emb, cat)
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    res, dec = topk_auto(
        emb, "embedding", qvec, 5, table_name="embeddings", catalog=cat,
        filter=F.col("label") >= 0, explain=True,
    )
    assert dec.strategy == "index_scan", dec
    plan = res._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan, plan
    assert "ExistingRDD" in plan or "LogicalRDD" in plan, plan
