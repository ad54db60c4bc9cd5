"""Driver queries: vector distance functions + exact top-k search.

Covers SURVEY.md §2.1 `vector_distances`, §2.3 exact (Flat) search, and
all six §2.4 scalar distance functions. Oracles use the self-contained
CTE pattern (query vector = embeddings.vec_id 0) so the SQL needs no
inlined literals and both engines read the identical float32 parquet
values.
"""

from __future__ import annotations

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


def _topk_oracle(metric: str, k: int = 10) -> str:
    dist = sql_index_distance(metric, "e.embedding", "q.qv")
    return f"""
        {_Q_CTE}
        SELECT e.vec_id, {dist} AS _distance
        FROM embeddings e CROSS JOIN q
        ORDER BY _distance, e.vec_id LIMIT {k}
    """


def _make_topk(metric: str):
    @register(f"topk_{metric}", _topk_oracle(metric))
    def _q(spark: SparkSession, sf_dir: str, metric=metric) -> DataFrame:
        q = query_vec(spark, sf_dir)
        return topk(
            emb(spark, sf_dir), "embedding", q, k=10, metric=metric, id_col="vec_id"
        ).select("vec_id", "_distance")

    return _q


for _m in D.METRICS:
    _make_topk(_m)


@register(
    "vector_distances_l2",
    f"""
    {_Q_CTE}
    SELECT e.vec_id, e.label, {sql_index_distance('l2', 'e.embedding', 'q.qv')} AS _distance
    FROM embeddings e CROSS JOIN q
    """,
)
def q_vector_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = query_vec(spark, sf_dir)
    return vector_distances(emb(spark, sf_dir), "embedding", q, metric="l2").select(
        "vec_id", "label", "_distance"
    )


# --- §2.4 scalar functions, one driver row each (array_* / list_* pairs
# share an implementation; both spellings are exercised). ---------------

_EUCLID = f"sqrt({sql_l2sq('e.embedding', 'q.qv')})"
_IP = sql_inner_product("e.embedding", "q.qv")
_COS = sql_cosine_sim("e.embedding", "q.qv")


def _scalar_oracle(expr: str) -> str:
    return f"{_Q_CTE} SELECT e.vec_id, {expr} AS value FROM embeddings e CROSS JOIN q"


def _make_scalar(name: str, fn, expr: str):
    @register(f"fn_{name}", _scalar_oracle(expr))
    def _q(spark: SparkSession, sf_dir: str, fn=fn) -> DataFrame:
        q = query_vec(spark, sf_dir)
        return emb(spark, sf_dir).select(
            "vec_id", fn("embedding", q).alias("value")
        )

    return _q


for _name, _fn, _expr in [
    ("array_distance", D.array_distance, _EUCLID),
    ("list_distance", D.list_distance, _EUCLID),
    ("array_inner_product", D.array_inner_product, _IP),
    ("list_inner_product", D.list_inner_product, _IP),
    ("array_cosine_similarity", D.array_cosine_similarity, _COS),
    ("list_cosine_similarity", D.list_cosine_similarity, _COS),
]:
    _make_scalar(_name, _fn, _expr)


def _make_vector_distances(metric: str):
    @register(
        f"vector_distances_{metric}",
        f"""
        {_Q_CTE}
        SELECT e.vec_id, e.label,
               {sql_index_distance(metric, 'e.embedding', 'q.qv')} AS _distance
        FROM embeddings e CROSS JOIN q
        """,
    )
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        q = query_vec(spark, sf_dir)
        return vector_distances(
            emb(spark, sf_dir), "embedding", q, metric=metric
        ).select("vec_id", "label", "_distance")

    _q.__name__ = f"q_vector_distances_{metric}"
    return _q


for _m in ("ip", "cosine"):
    _make_vector_distances(_m)
