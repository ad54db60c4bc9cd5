"""Arrow-path construction of small driver-local DataFrames.

``spark.createDataFrame(list_of_tuples, ...)`` plans as a pickled Python
RDD: every job that touches the result spawns a Python worker task and
pays ~3-6 s of serialization overhead on local[32] — even for 64 rows.
Going through pandas instead takes the Arrow fast path (JVM-local
relation, no Python stage at execution time).

Used for every small driver-side table in hot paths: IVF centroids and
probe lists, query matrices, deleted-id sets. Falls back to the plain
list path for empty input or when pandas/Arrow conversion fails (exotic
nested types).
"""

from __future__ import annotations

import itertools
from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_WIDEN_IDS = itertools.count()


def schema_names(schema: str) -> list[str]:
    """Column names from a DDL string, respecting <> / () nesting
    (``"a int, b array<struct<x:int,y:int>>"`` → ``["a", "b"]``)."""
    names, depth, start = [], 0, 0
    for i, ch in enumerate(schema):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            names.append(schema[start:i].strip().split()[0])
            start = i + 1
    tail = schema[start:].strip()
    if tail:
        names.append(tail.split()[0])
    return names


def widen_if_narrow(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition UP when the upstream scan yields fewer partitions than
    the session's parallelism.

    A small single-file (single-row-group) parquet input plans as ONE
    scan task, which serializes every downstream per-row expression —
    tokenize, quality features, minhash — on one core no matter how many
    the session has. Parquet can't split below a row group, so the only
    lever is an explicit round-robin exchange. On a healthy input (many
    files / row groups — any real cluster read) this is a no-op, so the
    shuffle exists exactly where it buys full-width parallelism and
    nowhere at 100 TB.

    The probe compiles the physical plan once (`df.rdd`); callers that
    already widened should not re-probe (see prepare_corpus, which
    passes widen=False into the LSH stage). On runtimes without
    DataFrame.rdd (Spark Connect) the probe is skipped and the input
    passes through unchanged.

    ROUND 15 (optimization — guide §2.5/§7.2): the repartition alone
    did NOT deliver the parallelism it exists for when the consumer
    filters: Catalyst pushes deterministic filters through Repartition,
    so prepare_corpus' language/quality gate — the pipeline's single
    most expensive expression (full tokenize per row) — ran BELOW the
    added exchange, on the one scan task the widen was meant to escape
    (measured in the round-15 pipeline_sf plan: `Filter` under
    `Exchange RoundRobinPartitioning`). An `observe()` (CollectMetrics)
    node on the widened frame is a sanctioned optimizer barrier:
    predicate pushdown does not cross it (metrics would change), while
    column pruning does (verified: scan ReadSchema stays pruned), and
    its runtime cost is one count per task. The barrier only exists in
    the narrow-input case, so cluster-scale plans — where the scan is
    already parallel and filter-at-scan is exactly right — are
    untouched."""
    try:
        sc = df.sparkSession.sparkContext
        target = int(target or sc.defaultParallelism)
        n_part = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n_part < target:
        from pyspark.sql import functions as F

        return df.repartition(target).observe(
            f"_widen_{next(_WIDEN_IDS)}", F.count(F.lit(1)).alias("rows")
        )
    return df


def local_df(
    spark: SparkSession,
    rows: Iterable[Sequence] | pd.DataFrame,
    schema,
) -> DataFrame:
    """Create a DataFrame from driver-local rows via the Arrow path.

    ``schema`` is a DDL string or a ``StructType``.
    """
    names = (
        list(schema.fieldNames())
        if hasattr(schema, "fieldNames")
        else schema_names(schema)
    )
    if isinstance(rows, pd.DataFrame):
        # Arrow conversion maps pdf columns to schema fields by POSITION
        # and ignores names — reorder so a caller's column order can't
        # silently land values in the wrong fields
        pdf = rows[names]
    else:
        rows = list(rows)
        if not rows:
            return spark.createDataFrame([], schema)
        pdf = pd.DataFrame.from_records(rows, columns=names)
    try:
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:
        return spark.createDataFrame(
            [tuple(r) for r in pdf.itertuples(index=False)], schema
        )
