"""Driver queries: vector distance functions + exact top-k search.

Covers SURVEY.md §2.1 `vector_distances`, §2.3 exact (Flat) search, and
all six §2.4 scalar distance functions. Oracles use the self-contained
CTE pattern (query vector = embeddings.vec_id 0) so the SQL needs no
inlined literals and both engines read the identical float32 parquet
values.

Entries are consolidated (round 3): the driver harness records at most
~50 rows, so the three per-metric top-k entries fold into one
multi-metric union, the three `vector_distances` entries into one
three-column row, and the six scalar functions into two three-column
rows (array_* / list_*). Every §2.4 function and every metric is still
exercised and hash-compared — just fewer registry slots.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import distance as D
from ..operators.topk import topk, vector_distances
from ..oracle import (
    sql_cosine_sim,
    sql_index_distance,
    sql_inner_product,
    sql_l2sq,
)
from . import register

_Q_CTE = "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)"


def query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    """The shared test query vector: embedding of vec_id 0."""
    row = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where(F.col("vec_id") == 0)
        .select("embedding")
        .head()
    )
    return [float(x) for x in row[0]]


def emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _topk_branch_sql(metric: str, k: int = 10) -> str:
    dist = sql_index_distance(metric, "e.embedding", "q.qv")
    return f"""
        SELECT '{metric}' AS metric, vec_id, _distance FROM (
            SELECT e.vec_id, {dist} AS _distance
            FROM embeddings e CROSS JOIN q
            ORDER BY _distance, e.vec_id LIMIT {k}
        )
    """


@register(
    "topk_multi_metric",
    _Q_CTE
    + "\n    SELECT * FROM (\n"
    + "\n    UNION ALL\n".join(_topk_branch_sql(m) for m in D.METRICS)
    + "\n    ) ORDER BY metric, _distance, vec_id",
)
def q_topk_multi_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 under every index metric (l2 / ip / cosine), one
    union with a `metric` tag column. `TakeOrderedAndProject` per branch:
    each task keeps a k-heap, the shuffle moves only k rows/partition."""
    q = query_vec(spark, sf_dir)
    e = emb(spark, sf_dir)
    branches = [
        topk(e, "embedding", q, k=10, metric=m, id_col="vec_id")
        .select(F.lit(m).alias("metric"), "vec_id", "_distance")
        for m in D.METRICS
    ]
    return reduce(DataFrame.unionAll, branches).orderBy(
        "metric", "_distance", "vec_id"
    )


@register(
    "vector_distances",
    f"""
    {_Q_CTE}
    SELECT e.vec_id, e.label,
           {sql_index_distance('l2', 'e.embedding', 'q.qv')} AS _distance_l2,
           {sql_index_distance('ip', 'e.embedding', 'q.qv')} AS _distance_ip,
           {sql_index_distance('cosine', 'e.embedding', 'q.qv')} AS _distance_cosine
    FROM embeddings e CROSS JOIN q
    """,
)
def q_vector_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`vector_distances` under all three metrics as one three-column
    projection (each column is the same JVM fold the per-metric operator
    emits, so all three hash-match bitwise)."""
    q = query_vec(spark, sf_dir)
    out = emb(spark, sf_dir)
    for m in D.METRICS:
        out = vector_distances(
            out, "embedding", q, metric=m, distance_col=f"_distance_{m}"
        )
    return out.select(
        "vec_id", "label", "_distance_l2", "_distance_ip", "_distance_cosine"
    )


# --- §2.4 scalar functions: array_*/list_* pairs share an implementation;
# both spellings are exercised, three functions per row. -----------------

_EUCLID = f"sqrt({sql_l2sq('e.embedding', 'q.qv')})"
_IP = sql_inner_product("e.embedding", "q.qv")
_COS = sql_cosine_sim("e.embedding", "q.qv")

_SCALAR_ORACLE = f"""
    {_Q_CTE}
    SELECT e.vec_id,
           {_EUCLID} AS distance,
           {_IP} AS inner_product,
           {_COS} AS cosine_similarity,
           {_EUCLID} AS list_distance,
           {_IP} AS list_inner_product,
           {_COS} AS list_cosine_similarity
    FROM embeddings e CROSS JOIN q
"""


@register("fn_scalar_distances", _SCALAR_ORACLE)
def q_fn_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six §2.4 scalar distance functions in ONE projection: the
    `array_*` (fixed-size-array) and `list_*` (variable-length-list)
    spellings are the same math over our array<float> columns, so one
    entry hash-checks all six against one oracle (consolidated to keep
    the registry at the driver's 50-entry recording cap)."""
    q = query_vec(spark, sf_dir)
    return emb(spark, sf_dir).select(
        "vec_id",
        D.array_distance("embedding", q).alias("distance"),
        D.array_inner_product("embedding", q).alias("inner_product"),
        D.array_cosine_similarity("embedding", q).alias("cosine_similarity"),
        D.list_distance("embedding", q).alias("list_distance"),
        D.list_inner_product("embedding", q).alias("list_inner_product"),
        D.list_cosine_similarity("embedding", q).alias("list_cosine_similarity"),
    )
