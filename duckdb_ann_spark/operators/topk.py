"""Exact (brute-force) top-k vector search and `vector_distances`.

The exact path in the reference is `ORDER BY array_distance(col, q) LIMIT k`
(DuckDB plans a top-k sort) and the `vector_distances` table function
(`/root/reference/src/ann_search.cpp:741-892`). In Spark the same declarative
shape compiles to `TakeOrderedAndProject` — a streaming per-partition top-k
with a k-row merge on the driver, no global sort materialization — which is
exactly the physical plan we want at 100 TB: each task keeps a k-heap, the
shuffle moves only `k * num_partitions` rows.

These are simultaneously user surface and the recall oracle for the ANN
engines.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.distance import index_distance

__all__ = ["topk", "vector_distances"]

DISTANCE_COL = "_distance"


def topk(
    df: DataFrame,
    vec_col: Union[str, Column],
    query: Sequence[float],
    k: int,
    metric: str = "l2",
    id_col: Optional[str] = None,
    distance_col: str = DISTANCE_COL,
) -> DataFrame:
    """Exact top-k by index distance (squared L2 / negated IP / cosine dist).

    Ties are broken on `id_col` when given so results are deterministic
    (required for oracle hash-matching; the reference inherits DuckDB's
    stable top-k which we must not rely on).
    """
    out = df.withColumn(distance_col, index_distance(metric, vec_col, query))
    # asc_nulls_last: DuckDB sorts NULLs last by default, Spark sorts them
    # first — NULL distances (zero-vector cosine, dimension-mismatched rows)
    # must never rank as nearest in either engine.
    order = [F.col(distance_col).asc_nulls_last()]
    if id_col is not None:
        order.append(F.col(id_col).asc())
    return out.orderBy(*order).limit(k)


def vector_distances(
    df: DataFrame,
    vec_col: Union[str, Column],
    query: Sequence[float],
    metric: str = "l2",
    distance_col: str = DISTANCE_COL,
    strict: bool = True,
) -> DataFrame:
    """All input columns + `_distance` of `query` vs every row.

    Mirrors `vector_distances(TABLE, query, metric:=)` —
    `/root/reference/src/ann_search.cpp:741-892`. No index involved; the
    distance is a native column expression so it stays inside whole-stage
    codegen (the reference's GPU batch path maps to JVM codegen here).

    Dimension mismatches: with ``strict=True`` (default) `zip_with`
    padding propagates NULL into `_distance`, which sorts last (never
    nearest) — the safe choice when a mismatch means bad data. With
    ``strict=False`` every row is zero-padded / truncated to the query's
    dimension and gets a FINITE distance over that buffer, matching the
    reference's `VectorDistancesInOut` behavior
    (`src/ann_search.cpp:697-732`)."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    if not strict:
        qdim = len(list(query))
        v = vec.cast("array<double>")
        vec = F.transform(
            F.sequence(F.lit(1), F.lit(qdim)),
            lambda i: F.coalesce(F.try_element_at(v, i), F.lit(0.0)),
        )
    return df.withColumn(distance_col, index_distance(metric, vec, query))
