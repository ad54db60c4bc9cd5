"""Parquet source helpers for the driver testdata tables.

One quirk: `events.parquet` stores `ts` as TIMESTAMP(NANOS), which Spark's
parquet reader rejects by default (`PARQUET_TYPE_ILLEGAL`). We flip the
runtime conf `spark.sql.legacy.parquet.nanosAsLong` and rebuild a proper
microsecond timestamp column, which is exactly what DuckDB's reader does
(ns → µs truncation), so oracle comparisons on `ts` stay value-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-testdata table as a DataFrame."""
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # ns since epoch → µs timestamp (DuckDB semantics for the same
        # file). Integer `div`, NOT `/`: epoch-ns values (~1.7e18) exceed
        # float64's 53-bit exact-integer range, so double division is off
        # by up to a few hundred ns — visible at ms granularity.
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(path)
