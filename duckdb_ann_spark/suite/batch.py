"""Driver queries: `ann_search_batch` / `ann_search_table` (SURVEY §2.1).

Oracle = the reference bench's LATERAL top-k-per-query workload
(`bench/metal_diskann_bench.sql:31-39`) expressed as cross join + window
(DuckDB lambdas can't capture LATERAL-correlated columns). The exact
(JVM Column) method is used so values hash-match bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.batch import ann_search_table, search_batch_ids
from ..oracle import sql_index_distance
from . import register


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _queries(spark: SparkSession, sf_dir: str, n: int) -> list[list[float]]:
    rows = (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") < n)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return [[float(x) for x in r[0]] for r in rows]


def _batch_oracle(metric: str, n_q: int, k: int) -> str:
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
                       PARTITION BY q.query_idx ORDER BY {dist}, e.vec_id
                   ) AS rn
            FROM qs q CROSS JOIN embeddings e
        ) WHERE rn <= {k}
    """


@register(
    "ann_search_batch",
    "SELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        f"SELECT '{m}' AS metric, query_idx, vec_id, _distance FROM ({_batch_oracle(m, 5, 5)})"
        for m in ("l2", "ip")
    )
    + "\n) ORDER BY metric, query_idx, _distance, vec_id",
)
def q_ann_search_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-query batch search under l2 and ip in one union (consolidated
    round 3 — one registry slot, both metrics still hash-compared)."""
    qs = _queries(spark, sf_dir, 5)
    e = _emb(spark, sf_dir)
    branches = [
        search_batch_ids(
            e, "vec_id", "embedding", qs, k=5, metric=m, method="exact"
        ).select(F.lit(m).alias("metric"), "query_idx", "vec_id", "_distance")
        for m in ("l2", "ip")
    ]
    return branches[0].unionAll(branches[1]).orderBy(
        "metric", "query_idx", "_distance", "vec_id"
    )


@register(
    "ann_search_table",
    f"""
    WITH qs AS (
        SELECT CAST(vec_id AS INT) AS query_idx, vec_id AS q_vec_id, embedding AS qv
        FROM embeddings WHERE vec_id < 3
    ), lat AS (
        SELECT q_vec_id AS vec_id, query_idx, table_vec_id, label, _distance FROM (
            SELECT q.query_idx, q.q_vec_id, e.vec_id AS table_vec_id, e.label,
                   {sql_index_distance('l2', 'e.embedding', 'q.qv')} AS _distance,
                   row_number() OVER (
                       PARTITION BY q.query_idx
                       ORDER BY {sql_index_distance('l2', 'e.embedding', 'q.qv')}, e.vec_id
                   ) AS rn
            FROM qs q CROSS JOIN embeddings e
        ) WHERE rn <= 3
    )
    SELECT 'collect' AS src, vec_id, query_idx, table_vec_id, label, _distance FROM lat
    UNION ALL
    SELECT 'distributed' AS src, vec_id, query_idx, table_vec_id, label, _distance FROM lat
    """,
)
def q_ann_search_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE-input batch search, BOTH query-side shapes (consolidated
    entry, round 7): `src='collect'` is the reference-shaped
    `ann_search_table` (query table collected to one driver batch,
    MAX_QUERY_ROWS-guarded), `src='distributed'` is `index_search_table`
    — the query side stays an unbounded DataFrame, searched here through
    a Flat index at the exact method, so both legs hash-match the same
    LATERAL oracle.

    Uses the exact method so the driver hash matches; the blas path is
    covered by tests/test_batch_search.py id-overlap checks.
    """
    import os
    import tempfile

    from ..index import Catalog, create_index, drop_index, index_search_table

    emb = _emb(spark, sf_dir)
    qdf = emb.where(F.col("vec_id") < 3).orderBy("vec_id").select("vec_id", "embedding")
    base = emb.select("vec_id", "embedding", "label")
    res = ann_search_table(
        qdf, "embedding", base, "vec_id", "embedding", k=3, method="exact"
    ).select(
        F.lit("collect").alias("src"),
        "vec_id", "query_idx", "table_vec_id", "label", "_distance",
    )

    cat = Catalog(os.path.join(
        tempfile.gettempdir(), f"duckdb_ann_spark_suite_ist_{os.getpid()}"
    ))
    drop_index("suite_ist_flat", cat)
    create_index(
        emb, "vec_id", "embedding", "suite_ist_flat", engine="faiss",
        type="Flat", table_name="embeddings", catalog=cat,
    )
    dist = index_search_table(
        spark, "suite_ist_flat", qdf, "vec_id", "embedding", k=3,
        catalog=cat, method="exact",
    )
    # reshape to the entry's passthrough contract: query id (renamed
    # _q_vec_id by the collision discipline), hit id, label via base join
    dist = dist.join(
        base.select(F.col("vec_id").alias("table_vec_id"), "label"),
        F.col("vec_id") == F.col("table_vec_id"),
    ).select(
        F.lit("distributed").alias("src"),
        F.col("_q_vec_id").alias("vec_id"),
        F.col("_q_vec_id").cast("int").alias("query_idx"),
        "table_vec_id", "label", "_distance",
    )
    return res.unionByName(dist)
