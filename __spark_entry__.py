"""Driver contract for the spark-graft builder (PySpark target).

Delegates to ``duckdb_ann_spark.suite``, where every implemented operator
from SURVEY.md §2 registers a Spark query and (when SQL-expressible) a
DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_ann_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact ANN search over sf0.001 embeddings with row fetch.

    The brute-force `ann_search` shape (`/root/reference/src/ann_search.cpp:31-195`):
    top-k by index distance, then fetch full rows by id — here a broadcast
    join back to the documents table.
    """
    from pyspark.sql import functions as F

    from duckdb_ann_spark.operators.topk import topk
    from duckdb_ann_spark.suite.vector import query_vec

    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = query_vec(spark, sf_dir)
    hits = topk(emb, "embedding", q, k=10, metric="l2", id_col="vec_id")
    return (
        hits.join(F.broadcast(docs), hits.vec_id == docs.doc_id, "left")
        .select("vec_id", "label", "doc_id", "lang", "source", "n_chars", "_distance")
        .orderBy("_distance", "vec_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    return suite.oracle_sql()
