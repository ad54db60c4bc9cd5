"""ann_search_batch / ann_search_table vs DuckDB LATERAL brute force."""

import pytest
from pyspark.sql import functions as F

from duckdb_ann_spark.operators.batch import (
    ann_search_batch,
    ann_search_table,
    search_batch_ids,
)
from duckdb_ann_spark.oracle import sql_index_distance

from conftest import assert_df_matches_oracle


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _queries(duck, n=3):
    rows = duck.execute(
        f"SELECT embedding FROM embeddings WHERE vec_id < {n} ORDER BY vec_id"
    ).fetchall()
    return [[float(x) for x in r[0]] for r in rows]


def _lateral_oracle(metric, n_q, k):
    # The LATERAL top-k-per-query workload (bench/metal_diskann_bench.sql:31-39)
    # expressed as cross join + window: DuckDB lambdas cannot capture
    # LATERAL-correlated columns.
    dist = sql_index_distance(metric, "e.embedding", "q.qv")
    return f"""
        WITH qs AS (
            SELECT vec_id AS query_idx, embedding AS qv
            FROM embeddings WHERE vec_id < {n_q}
        )
        SELECT query_idx, vec_id, _distance FROM (
            SELECT CAST(q.query_idx AS INT) AS query_idx, e.vec_id,
                   {dist} AS _distance,
                   row_number() OVER (
                       PARTITION BY q.query_idx
                       ORDER BY {dist}, e.vec_id
                   ) AS rn
            FROM qs q CROSS JOIN embeddings e
        ) WHERE rn <= {k}
    """


def test_batch_exact_matches_lateral_oracle(spark, duck, emb):
    qs = _queries(duck)
    res = search_batch_ids(emb, "vec_id", "embedding", qs, k=5, method="exact")
    assert_df_matches_oracle(res, duck, _lateral_oracle("l2", 3, 5))


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_blas_ids_match_exact_ids(spark, duck, emb, metric):
    """The float32 BLAS path must return the same ids as the exact path
    (distances may differ in low-order bits)."""
    qs = _queries(duck)
    a = search_batch_ids(emb, "vec_id", "embedding", qs, 10, metric, "blas")
    b = search_batch_ids(emb, "vec_id", "embedding", qs, 10, metric, "exact")
    ids_a = {(r.query_idx, r.vec_id) for r in a.collect()}
    ids_b = {(r.query_idx, r.vec_id) for r in b.collect()}
    # allow boundary swaps at rank k from f32 rounding: require >=9/10 overlap
    for qi in range(3):
        sa = {v for q, v in ids_a if q == qi}
        sb = {v for q, v in ids_b if q == qi}
        assert len(sa & sb) >= 9, (qi, sorted(sa), sorted(sb))


def test_ann_search_batch_row_fetch(spark, duck, emb):
    qs = _queries(duck)
    res = ann_search_batch(emb, "vec_id", "embedding", qs, k=4)
    assert res.columns == ["vec_id", "query_idx", "embedding", "label", "_distance"] or (
        set(res.columns)
        == {"query_idx", "vec_id", "embedding", "label", "_distance"}
    )
    pdf = res.toPandas()
    assert len(pdf) == 12
    assert pdf.groupby("query_idx").size().tolist() == [4, 4, 4]
    # self-match: query i's nearest neighbor is vec_id i at distance 0
    best = pdf.sort_values(["query_idx", "_distance"]).groupby("query_idx").head(1)
    assert best.vec_id.tolist() == [0, 1, 2]


def test_ann_search_table_passthrough_and_prefix(spark, emb):
    """Query-table columns pass through; colliding base columns get the
    table_ prefix (reference src/ann_search.cpp:516-528)."""
    qdf = (
        emb.where(F.col("vec_id") < 2)
        .select("vec_id", "embedding", F.lit("tag").alias("note"))
    )
    res = ann_search_table(qdf, "embedding", emb, "vec_id", "embedding", k=3)
    assert res.columns == [
        "vec_id", "embedding", "note", "query_idx",
        "table_vec_id", "table_embedding", "label", "_distance",
    ]
    pdf = res.toPandas()
    assert len(pdf) == 6
    assert set(pdf.note) == {"tag"}
    best = pdf.sort_values(["query_idx", "_distance"]).groupby("query_idx").head(1)
    assert best.table_vec_id.tolist() == [0, 1]
    assert best.vec_id.tolist() == [0, 1]


def test_table_search_autodetects_vector_col(spark, sf_dir):
    """query_vec_col=None finds the first numeric array column
    (src/ann_search.cpp:471-493)."""
    from duckdb_ann_spark.operators.batch import ann_search_table

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3).select("vec_id", "embedding")
    explicit = ann_search_table(
        queries, "embedding", emb, "vec_id", "embedding", k=2
    ).collect()
    auto = ann_search_table(
        queries, None, emb, "vec_id", "embedding", k=2
    ).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, explicit))
    import pytest
    from duckdb_ann_spark.operators.batch import _detect_vector_col
    with pytest.raises(ValueError, match="numeric child"):
        _detect_vector_col(queries.select("vec_id"))


def test_ann_search_table_row_cap(spark, emb, monkeypatch):
    """The query table is collected driver-side (reference shape); above
    MAX_QUERY_ROWS the operator must refuse and point at knn_join
    instead of OOM-ing the driver."""
    import duckdb_ann_spark.operators.batch as B

    monkeypatch.setattr(B, "MAX_QUERY_ROWS", 10)
    qdf = emb.limit(50).select("vec_id", "embedding")
    with pytest.raises(ValueError, match="knn_join"):
        B.ann_search_table(qdf, "embedding", emb, "vec_id", "embedding", k=3)
