"""Multi-query batch vector search (`ann_search_batch` / `ann_search_table`).

Reference semantics: `ann_search_batch(table, index, queries, k)` returns
`query_idx` + table columns + `_distance`, and `ann_search_table(TABLE
queries, ...)` additionally passes the query table's columns through,
deduping collisions with a `table_` prefix on the base columns
(`/root/reference/src/ann_search.cpp:202-388,397-691,516-528`).

Spark-first execution (the reference's lock-step batch BFS,
`rust_lib/src/provider.rs:248-441`, aggregates distance work into one
batched kernel — the same idea expressed distributively):

* the query set is broadcast to executors as one numpy matrix;
* `mapInPandas` computes per-Arrow-batch distances with one BLAS matmul
  and keeps only the per-batch top-k per query (`k·q` rows per batch);
* a final window (`partitionBy query_idx`) merges partial top-ks — the
  shuffle moves `O(k · q · n_batches)` candidate rows, never the data.

At 100 TB nothing here materializes the base table: the scan streams,
the only wide exchange is over the tiny candidate set.

Two methods:
* ``blas`` (default): float32 numpy kernels — the fast path.
* ``exact``: JVM Column expressions (crossJoin with the query table +
  sequential-fold distances) — bit-exact vs the DuckDB oracle; use for
  correctness gates and small query sets.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.distance import (
    index_distance,
    np_index_distances,
    np_stack_vectors,
    np_topk_frame,
)
from ..local import local_df
from ..functions.text import quote_ident as _quote

__all__ = ["search_batch_ids", "ann_search_batch", "ann_search_table"]

DISTANCE_COL = "_distance"

# ann_search_table collects the query table driver-side (one in-memory
# batch per call, the reference's shape); above this many rows the
# operator refuses and points at knn_join, the both-sides-large path
MAX_QUERY_ROWS = 100_000


def _queries_matrix(queries: Sequence[Sequence[float]]) -> np.ndarray:
    q = np.asarray(queries, dtype=np.float32)
    if q.ndim != 2:
        raise ValueError("queries must be a list of equal-length float vectors")
    return q


def search_batch_ids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: Sequence[Sequence[float]],
    k: int,
    metric: str = "l2",
    method: str = "blas",
) -> DataFrame:
    """Low-level batch search → DataFrame(query_idx int, <id_col>, _distance).

    Exact brute force over `df` (the Flat-engine batch path). Ties broken
    on id ascending, like the single-query `topk`.
    """
    if len(queries) == 0:
        # no queries → empty result, like the index_scan path
        return df.sparkSession.createDataFrame(
            [], f"query_idx int, {_quote(id_col)} long, {DISTANCE_COL} double"
        )
    if method == "exact":
        return _search_batch_exact(df, id_col, vec_col, queries, k, metric)
    # Arrow-pass dtype normalization (round-13 advice): mapInArrow does
    # not coerce, so array<double> vectors / int32 ids must be cast
    # BEFORE the pass or the declared long/array<float> schema crashes
    # the JVM read. No-op for already-typed frames.
    from ..functions.distance import cast_id_vec

    df = cast_id_vec(df, id_col, vec_col)
    qmat = _queries_matrix(queries)
    spark = df.sparkSession
    bq = spark.sparkContext.broadcast(qmat)
    out_schema = f"query_idx int, {_quote(id_col)} long, {DISTANCE_COL} double"

    def part_topk(batches):
        # mapInArrow (round 12): the scan's cost was the pandas
        # object-Series conversion of the vector column, not the BLAS
        # matmul — the Arrow child buffer reshapes zero-copy (same fix
        # as the IVF build assignment; this path is every exact truth
        # scan, so calibration measurement passes ride it too)
        import pyarrow as pa

        from ..functions.distance import np_from_arrow_list

        qm = bq.value
        dim = qm.shape[1]
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            col = b.column(b.schema.get_field_index(vec_col))
            mat = np_from_arrow_list(col, dim)
            if mat is None:
                mat = np_stack_vectors(
                    b.select([vec_col]).to_pandas()[vec_col]
                )
            ids = b.column(b.schema.get_field_index(id_col)).to_numpy(
                zero_copy_only=False
            )
            dists = np_index_distances(metric, mat, qm)  # (q, n)
            kk = min(k, n)
            # tie-safe partial top-k + stack (shared helper): the cut
            # keeps boundary distance ties ordered by id so the global
            # merge never loses the lower-id row
            frame = np_topk_frame(
                dists, ids, range(qm.shape[0]), kk, id_col, DISTANCE_COL
            )
            yield pa.RecordBatch.from_pandas(frame, preserve_index=False)

    partial = df.select(id_col, vec_col).mapInArrow(part_topk, schema=out_schema)
    w = Window.partitionBy("query_idx").orderBy(
        F.col(DISTANCE_COL).asc_nulls_last(), F.col(id_col).asc()
    )
    merged = (
        partial.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
    return merged


def _search_batch_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: Sequence[Sequence[float]],
    k: int,
    metric: str,
) -> DataFrame:
    """Bit-exact batch path: broadcast query table + JVM distance columns."""
    spark = df.sparkSession
    qdf = local_df(
        spark,
        [(i, [float(x) for x in q]) for i, q in enumerate(queries)],
        "query_idx int, _qv array<double>",
    )
    joined = df.select(id_col, vec_col).crossJoin(F.broadcast(qdf))
    scored = joined.withColumn(DISTANCE_COL, index_distance(metric, vec_col, F.col("_qv")))
    w = Window.partitionBy("query_idx").orderBy(
        F.col(DISTANCE_COL).asc_nulls_last(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("query_idx", id_col, DISTANCE_COL)
    )


def ann_search_batch(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: Sequence[Sequence[float]],
    k: int,
    metric: str = "l2",
    method: str = "blas",
) -> DataFrame:
    """`ann_search_batch` shape: query_idx + all table columns + _distance,
    ordered within each query_idx by distance (ties on id)."""
    hits = search_batch_ids(df, id_col, vec_col, queries, k, metric, method)
    return hits.join(df, on=id_col, how="inner").select(
        "query_idx", *df.columns, DISTANCE_COL
    )


def _detect_vector_col(df: DataFrame) -> str:
    """The reference auto-detects "the first LIST or ARRAY column with a
    numeric child" in the query table (`src/ann_search.cpp:471-493`)."""
    from pyspark.sql import types as T

    numeric = (
        T.FloatType, T.DoubleType, T.DecimalType, T.IntegerType,
        T.LongType, T.ShortType, T.ByteType,
    )
    for f in df.schema.fields:
        if isinstance(f.dataType, T.ArrayType) and isinstance(
            f.dataType.elementType, numeric
        ):
            return f.name
    raise ValueError(
        "No LIST/ARRAY column with a numeric child found in the query table"
    )


def ann_search_table(
    queries_df: DataFrame,
    query_vec_col: Optional[str],
    base_df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    metric: str = "l2",
    query_id_col: Optional[str] = None,
    method: str = "blas",
) -> DataFrame:
    """`ann_search_table` shape: all query-table columns pass through, base
    columns follow (name collisions get a `table_` prefix —
    `src/ann_search.cpp:516-528`), then `_distance`. `query_vec_col=None`
    auto-detects the first numeric LIST/ARRAY column like the reference
    (`src/ann_search.cpp:471-493`).

    The query table is collected to the driver to form the broadcast
    matrix — the reference has the same shape (queries are one in-memory
    batch per call); for huge query sets, use `knn_join` instead. A hard
    row cap (`MAX_QUERY_ROWS`) guards the driver: exceeding it raises
    instead of OOM-ing the collect.
    """
    spark = queries_df.sparkSession
    if query_vec_col is None:
        query_vec_col = _detect_vector_col(queries_df)
    # cheap guard: count stops the driver collect before it OOMs
    n_q = queries_df.limit(MAX_QUERY_ROWS + 1).count()
    if n_q > MAX_QUERY_ROWS:
        raise ValueError(
            f"ann_search_table: query table exceeds {MAX_QUERY_ROWS} rows; "
            "it is collected to the driver as one batch (reference shape). "
            "For large query sets use duckdb_ann_spark.operators.knn_join "
            "(both-sides-distributed k-NN join) instead."
        )
    qrows = queries_df.collect()
    queries = [[float(x) for x in r[query_vec_col]] for r in qrows]
    hits = search_batch_ids(base_df, id_col, vec_col, queries, k, metric, method).select(
        "query_idx", F.col(id_col).alias("_hit_id"), DISTANCE_COL
    )
    # Re-create the (tiny, already-collected) query table with its index —
    # avoids any reliance on DataFrame ordering.
    from pyspark.sql import types as T

    qschema = T.StructType(
        [T.StructField("query_idx", T.IntegerType(), False),
         *queries_df.schema.fields]
    )
    qwith = local_df(spark, [(i, *r) for i, r in enumerate(qrows)], qschema)
    qcols = set(queries_df.columns)
    renamed = base_df
    base_cols = []
    for c in base_df.columns:
        out_name = f"table_{c}" if c in qcols else c
        if out_name != c:
            renamed = renamed.withColumnRenamed(c, out_name)
        base_cols.append(out_name)
    join_id = f"table_{id_col}" if id_col in qcols else id_col
    out = hits.join(F.broadcast(qwith), on="query_idx").join(
        renamed, hits["_hit_id"] == renamed[join_id], "inner"
    )
    return out.select(*queries_df.columns, "query_idx", *base_cols, DISTANCE_COL)
