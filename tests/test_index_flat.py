"""Index lifecycle + Flat engine — ports of the reference's sqllogictest
scenarios (`test/sql/diskann_basic.test`, `diskann_delete.test`,
`edge_cases.test`, `ann_list.test`)."""

import pytest
from pyspark.sql import functions as F

from duckdb_ann_spark.index import (
    Catalog,
    ann_index_info,
    ann_list,
    ann_search,
    ann_search_batch_indexed,
    create_index,
    delete_from_index,
    drop_index,
    index_scan,
    merge_indexes,
    vacuum_index,
)
from duckdb_ann_spark.operators.topk import topk


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "indexes"))


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    row = emb.where(F.col("vec_id") == 0).select("embedding").head()
    return [float(x) for x in row[0]]


def _mk(emb, cat, name="idx", **opts):
    return create_index(
        emb, "vec_id", "embedding", name, engine="faiss", table_name="embeddings",
        catalog=cat, **opts
    )


def test_create_and_search_matches_bruteforce(spark, emb, qvec, cat):
    m = _mk(emb, cat)
    assert m["engine"] == "FAISS" and m["subtype"] == "flat"
    assert m["dim"] == 64 and m["num_vectors"] == emb.count()

    got = ann_search(emb, "idx", qvec, k=5, catalog=cat).collect()
    want = topk(emb, "embedding", qvec, k=5, metric="l2", id_col="vec_id").collect()
    assert [(r.vec_id, r._distance) for r in got] == [
        (r.vec_id, r._distance) for r in want
    ]
    # nearest neighbor of a stored vector is itself at distance 0
    assert got[0].vec_id == 0 and got[0]._distance == 0.0


def test_index_scan_shape(spark, emb, qvec, cat):
    _mk(emb, cat)
    res = index_scan(spark, "idx", [qvec, qvec], k=3, catalog=cat)
    assert res.columns == ["query_idx", "vec_id", "_distance"]
    assert res.count() == 6


def test_batch_indexed(spark, emb, qvec, cat):
    _mk(emb, cat)
    res = ann_search_batch_indexed(emb, "idx", [qvec], k=4, catalog=cat)
    assert res.columns == ["query_idx", "vec_id", "embedding", "label", "_distance"]
    assert res.count() == 4


def test_duplicate_name_and_if_not_exists(emb, cat):
    _mk(emb, cat)
    with pytest.raises(ValueError, match='Index with name "idx" already exists!'):
        _mk(emb, cat)
    m = create_index(
        emb, "vec_id", "embedding", "idx", engine="faiss", catalog=cat,
        if_not_exists=True,
    )
    assert m["name"] == "idx"


def test_not_found_error(spark, emb, qvec, cat):
    with pytest.raises(ValueError, match="ANN index 'nope' not found on table"):
        ann_search(emb, "nope", qvec, k=3, catalog=cat, table_name="embeddings")


def test_bad_column_type(spark, emb, cat):
    bad = emb.withColumn("txt", F.lit("x"))
    with pytest.raises(ValueError, match=r"must be FLOAT\[N\]"):
        create_index(bad, "vec_id", "txt", "bad", engine="faiss", catalog=cat)


def test_bad_metric(emb, cat):
    # cosine is recognized by the optimizer but no engine supports it
    # (test/sql/faiss_optimizer.test:99-118)
    with pytest.raises(ValueError, match="Unknown metric 'cosine'. Supported: L2, IP"):
        _mk(emb, cat, metric="cosine")


def test_dim_mismatch_query_returns_empty(spark, emb, cat):
    _mk(emb, cat)
    assert index_scan(spark, "idx", [[1.0, 2.0]], k=3, catalog=cat).count() == 0


def test_k_greater_than_n_returns_all(spark, emb, qvec, cat):
    small = emb.where(F.col("vec_id") < 7)
    create_index(small, "vec_id", "embedding", "small", engine="faiss", catalog=cat)
    assert index_scan(spark, "small", [qvec], k=100, catalog=cat).count() == 7


def test_ann_list_and_info(spark, emb, cat):
    _mk(emb, cat)
    lst = ann_list(spark, cat).collect()
    assert [(r.name, r.engine, r.table_name) for r in lst] == [
        ("idx", "FAISS", "embeddings")
    ]
    info = ann_index_info(spark, cat).collect()[0]
    assert info.num_vectors == emb.count()
    assert info.num_deleted == 0
    assert info.quantized is False
    assert info.memory_bytes > 0


def test_delete_excludes_from_topk(spark, emb, qvec, cat):
    """diskann_delete.test:34-55: deleted rows must not appear."""
    _mk(emb, cat)
    before = [r.vec_id for r in index_scan(spark, "idx", [qvec], 5, catalog=cat).collect()]
    delete_from_index(spark, "idx", before[:2], catalog=cat)
    after = [r.vec_id for r in index_scan(spark, "idx", [qvec], 5, catalog=cat).collect()]
    assert set(after).isdisjoint(before[:2])
    assert len(after) == 5
    assert after == [v for v in before if v not in before[:2]] + after[3:]
    info = ann_index_info(spark, cat).collect()[0]
    assert info.num_deleted == 2


def test_delete_all_then_vacuum(spark, emb, qvec, cat):
    small = emb.where(F.col("vec_id") < 5)
    create_index(small, "vec_id", "embedding", "s2", engine="faiss", catalog=cat)
    delete_from_index(spark, "s2", [0, 1, 2, 3, 4], catalog=cat)
    assert index_scan(spark, "s2", [qvec], 5, catalog=cat).count() == 0
    m = vacuum_index(spark, "s2", catalog=cat)
    assert m["num_vectors"] == 0 and m["num_deleted"] == 0


def test_vacuum_preserves_results(spark, emb, qvec, cat):
    _mk(emb, cat)
    delete_from_index(spark, "idx", [0, 1], catalog=cat)
    before = [(r.vec_id, r._distance)
              for r in index_scan(spark, "idx", [qvec], 5, catalog=cat).collect()]
    m = vacuum_index(spark, "idx", catalog=cat)
    assert m["num_vectors"] == emb.count() - 2
    after = [(r.vec_id, r._distance)
             for r in index_scan(spark, "idx", [qvec], 5, catalog=cat).collect()]
    assert before == after


def test_merge_indexes(spark, emb, qvec, cat):
    a = emb.where(F.col("vec_id") < 250)
    b = emb.where(F.col("vec_id") >= 250)
    create_index(a, "vec_id", "embedding", "left", engine="faiss", catalog=cat)
    create_index(b, "vec_id", "embedding", "right", engine="faiss", catalog=cat)
    m = merge_indexes(spark, "left", "right", catalog=cat)
    assert m["num_vectors"] == emb.count()
    merged = [r.vec_id for r in index_scan(spark, "left", [qvec], 5, catalog=cat).collect()]
    full = [r.vec_id for r in
            topk(emb, "embedding", qvec, 5, "l2", id_col="vec_id").collect()]
    assert merged == full


def test_drop_index(spark, emb, qvec, cat):
    _mk(emb, cat)
    drop_index("idx", cat)
    with pytest.raises(ValueError, match="not found"):
        index_scan(spark, "idx", [qvec], 3, catalog=cat)


def test_empty_query_list_returns_empty(spark, emb, qvec, cat):
    name = "flat_emptyq"
    drop_index(name, cat)
    create_index(emb, "vec_id", "embedding", name, engine="faiss", catalog=cat)
    res = index_scan(spark, name, [], k=5, catalog=cat)
    assert res.count() == 0
    assert res.columns == ["query_idx", "vec_id", "_distance"]
    drop_index(name, cat)
