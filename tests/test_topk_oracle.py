"""Brute-force top-k vs DuckDB oracle on the driver testdata (bitwise)."""

import pytest
from pyspark.sql import functions as F

from duckdb_ann_spark.operators.topk import topk, vector_distances
from duckdb_ann_spark.oracle import sql_index_distance

from conftest import assert_df_matches_oracle


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _query_vec(duck):
    return [float(x) for x in duck.execute(
        "SELECT embedding FROM embeddings WHERE vec_id = 0").fetchone()[0]]


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_topk_matches_oracle(spark, duck, emb, metric):
    q = _query_vec(duck)
    res = topk(emb, "embedding", q, k=10, metric=metric, id_col="vec_id").select(
        "vec_id", "_distance"
    )
    dist = sql_index_distance(metric, "e.embedding", "q.qv")
    oracle = f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, {dist} AS _distance
        FROM embeddings e CROSS JOIN q
        ORDER BY _distance, e.vec_id LIMIT 10
    """
    assert_df_matches_oracle(res, duck, oracle)


def test_vector_distances_matches_oracle(spark, duck, emb):
    q = _query_vec(duck)
    res = vector_distances(emb, "embedding", q, metric="l2").select(
        "vec_id", "label", "_distance"
    )
    dist = sql_index_distance("l2", "e.embedding", "q.qv")
    oracle = f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, e.label, {dist} AS _distance
        FROM embeddings e CROSS JOIN q
    """
    assert_df_matches_oracle(res, duck, oracle)


def test_topk_is_take_ordered(spark, emb):
    """The physical plan must be TakeOrderedAndProject (streaming top-k),
    not a global Sort + Limit — this is what keeps it viable at 100 TB."""
    q = [0.0] * 64
    plan = topk(emb, "embedding", q, k=10, id_col="vec_id")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
