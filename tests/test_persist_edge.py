"""Ports of diskann_persist.test / faiss_persist.test / edge_cases.test:
restart semantics (fresh catalog handle over the same root) and edge
inputs. Plus the HNSW-surface engine."""

import pytest
from pyspark.sql import functions as F

from duckdb_ann_spark.index import (
    Catalog,
    ann_index_info,
    create_index,
    delete_from_index,
    index_scan,
    insert_into_index,
)
from duckdb_ann_spark.operators.topk import topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(x) for x in
            emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]


@pytest.mark.parametrize("engine,opts", [
    ("faiss", {}),
    ("faiss", {"type": "IVFFlat", "ivf_nlist": 8, "nprobe": 8}),
    ("diskann", {"max_degree": 16, "build_complexity": 32}),
    ("faiss", {"type": "HNSW", "hnsw_m": 16}),
])
def test_search_survives_restart(spark, emb, qvec, tmp_path, engine, opts):
    """diskann_persist.test: identical results after 'reopen' (a fresh
    Catalog over the same root — all state lives in the artifact)."""
    root = str(tmp_path / "idx")
    create_index(emb, "vec_id", "embedding", "p", engine=engine,
                 catalog=Catalog(root), **opts)
    before = index_scan(spark, "p", [qvec], 5, catalog=Catalog(root)).collect()
    reopened = Catalog(root)  # fresh handle = restart
    after = index_scan(spark, "p", [qvec], 5, catalog=reopened).collect()
    assert [(r.vec_id, r._distance) for r in before] == [
        (r.vec_id, r._distance) for r in after
    ]
    assert len(after) == 5


def test_delete_persists_across_restart(spark, emb, qvec, tmp_path):
    """diskann_delete.test:115-161: tombstones survive reopen."""
    root = str(tmp_path / "idx")
    create_index(emb, "vec_id", "embedding", "d", catalog=Catalog(root))
    delete_from_index(spark, "d", [0], catalog=Catalog(root))
    hits = [r.vec_id for r in
            index_scan(spark, "d", [qvec], 5, catalog=Catalog(root)).collect()]
    assert 0 not in hits


def test_insert_after_restart(spark, emb, qvec, tmp_path):
    """faiss_bind_after_restart.test: appends work on a reopened index."""
    root = str(tmp_path / "idx")
    create_index(emb.where(F.col("vec_id") > 0), "vec_id", "embedding", "r",
                 catalog=Catalog(root))
    insert_into_index(spark, "r", emb.where(F.col("vec_id") == 0), Catalog(root))
    hits = [r.vec_id for r in
            index_scan(spark, "r", [qvec], 3, catalog=Catalog(root)).collect()]
    assert hits[0] == 0


def test_hnsw_params_and_recall(spark, emb, qvec, tmp_path):
    cat = Catalog(str(tmp_path / "idx"))
    m = create_index(emb, "vec_id", "embedding", "h", engine="faiss",
                     type="HNSW", hnsw_m=16, catalog=cat)
    assert m["subtype"] == "hnsw" and m["params"]["hnsw_m"] == 16
    assert m["layout"] == "hnsw-layered"
    got = {r.vec_id for r in index_scan(spark, "h", [qvec], 10, catalog=cat).collect()}
    want = {r.vec_id for r in
            topk(emb, "embedding", qvec, 10, "l2", id_col="vec_id").collect()}
    assert len(got & want) >= 7


# ---- edge_cases.test ports ------------------------------------------

def test_dim1_vectors(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, [float(i)]) for i in range(60)], "id long, v array<float>"
    )
    cat = Catalog(str(tmp_path / "idx"))
    create_index(df, "id", "v", "one", catalog=cat)
    hits = index_scan(spark, "one", [[7.2]], 3, catalog=cat).collect()
    assert [r.id for r in hits] == [7, 8, 6]


def test_duplicate_vectors_tie_on_id(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(5)] + [(9, [9.0, 9.0])],
        "id long, v array<float>",
    )
    cat = Catalog(str(tmp_path / "idx"))
    create_index(df, "id", "v", "dup", catalog=cat)
    hits = index_scan(spark, "dup", [[1.0, 2.0]], 3, catalog=cat).collect()
    assert [r.id for r in hits] == [0, 1, 2]
    assert all(r._distance == 0.0 for r in hits)


def test_zero_vector_cosine_sorts_last(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "id long, v array<float>",
    )
    res = topk(df, "v", [1.0, 0.0], 3, "cosine", id_col="id").collect()
    assert [r.id for r in res] == [1, 2, 0]
    assert res[2]._distance is None  # zero vector → NULL, never nearest


def test_two_indexes_on_one_column(spark, emb, tmp_path):
    """edge_cases.test: multiple indexes on the same column coexist."""
    cat = Catalog(str(tmp_path / "idx"))
    create_index(emb, "vec_id", "embedding", "a1", catalog=cat)
    create_index(emb, "vec_id", "embedding", "a2", engine="diskann",
                 max_degree=16, build_complexity=32, catalog=cat)
    info = ann_index_info(spark, cat).collect()
    assert {r.name for r in info} == {"a1", "a2"}


def test_empty_index(spark, emb, qvec, tmp_path):
    cat = Catalog(str(tmp_path / "idx"))
    m = create_index(emb.where(F.lit(False)), "vec_id", "embedding", "e",
                     catalog=cat)
    assert m["num_vectors"] == 0 and m["dim"] == 0


def test_merge_src_tombstones_different_id_col(spark, emb, qvec, tmp_path):
    """Merging a source index whose id column name differs from the
    destination's, with tombstones on the source, must anti-join the
    deleted ids BEFORE the column rename (round-2 advisory: the join
    column no longer existed after toDF)."""
    from duckdb_ann_spark.index import delete_from_index, merge_indexes

    cat = Catalog(str(tmp_path / "idx"))
    lo = emb.where(F.col("vec_id") < 250)
    hi = (
        emb.where(F.col("vec_id") >= 250)
        .withColumnRenamed("vec_id", "other_id")
        .withColumnRenamed("embedding", "other_vec")
    )
    create_index(lo, "vec_id", "embedding", "dst", engine="faiss", catalog=cat)
    create_index(hi, "other_id", "other_vec", "src", engine="faiss", catalog=cat)
    delete_from_index(spark, "src", [300, 301], catalog=cat)
    m = merge_indexes(spark, "dst", "src", catalog=cat)
    assert m["num_vectors"] == emb.count() - 2
    got = [
        r.vec_id
        for r in index_scan(spark, "dst", [qvec], 10, catalog=cat).collect()
    ]
    want = [
        r.vec_id
        for r in topk(
            emb.where(~F.col("vec_id").isin(300, 301)), "embedding", qvec,
            10, "l2", id_col="vec_id",
        ).collect()
    ]
    assert got == want
