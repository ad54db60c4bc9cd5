"""Parquet source helpers for the driver testdata tables.

One quirk: `events.parquet` has historically stored `ts` either as
TIMESTAMP(NANOS) (which Spark's parquet reader rejects by default with
`PARQUET_TYPE_ILLEGAL`) or as a plain microsecond timestamp, depending on
the generator. We flip `spark.sql.legacy.parquet.nanosAsLong` so a NANOS
file reads as LongType instead of erroring, then branch on the dtype the
reader actually produced:

* LongType  → epoch-ns, convert ns → µs timestamp (DuckDB's semantics for
  the same file), so oracle comparisons on `ts` stay value-exact.
* Timestamp / TimestampNTZ → the file already carries µs. NTZ is cast to
  TIMESTAMP (wall-clock-preserving: the cast interprets and the collect
  re-renders in the same session timezone) so downstream code — watermarks,
  epoch casts, streaming state — sees one stable dtype, and collected
  values equal DuckDB's naive read of the same file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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
        # Flip nanosAsLong only for the duration of the read (the schema
        # freezes into the plan at read time — verified: a NANOS file
        # still collects as LongType after the conf is restored), so this
        # helper leaves no session-level side effect behind.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        try:
            prev = spark.conf.get(key)
        except Exception:
            prev = None
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(path)
            ts_type = df.schema["ts"].dataType
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        if isinstance(ts_type, LongType):
            # ns since epoch → µs timestamp (DuckDB semantics for the same
            # file). Integer `div`, NOT `/`: epoch-ns values (~1.7e18) exceed
            # float64's 53-bit exact-integer range, so double division is off
            # by up to a few hundred ns — visible at ms granularity.
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        # Timestamp / TimestampNTZ: already microseconds, same as DuckDB.
        # Normalize NTZ -> TIMESTAMP so every consumer sees one dtype.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(path)
