"""Structured Streaming operators.

The reference has no streaming surface (SURVEY §2.6 — its "streaming"
is out-of-core index build and streaming table-function execution); this
module is the Spark-native extension a continuously-ingesting deployment
needs:

* :func:`read_event_stream` — file-source stream over an events
  directory (the parquet drop-folder pattern);
* :func:`windowed_event_counts` — event-time tumbling-window counts with
  a watermark bounding state for late data;
* :func:`stream_index_append` — `foreachBatch` maintenance of a live ANN
  index: each micro-batch of (id, vector) rows is appended through
  :func:`duckdb_ann_spark.index.insert_into_index`, the streaming analog
  of the reference's insert-after-DML consistency
  (`src/diskann_index.cpp:316-361`).

All three run with `Trigger.AvailableNow` for deterministic testing and
as continuous micro-batch jobs in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession, path: str, schema: str = EVENTS_SCHEMA
) -> DataFrame:
    """File-source stream: new parquet files under `path` become
    micro-batches. Schema must be provided (streams cannot infer)."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark.

    State is bounded: windows older than the watermark are finalized and
    dropped — the property that keeps this runnable forever at 100 TB/day.
    Output: (window_start_epoch bigint, event_type, n, value_cents)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
            "event_type",
            "n",
            "value_cents",
        )
    )


def stream_index_append(
    stream: DataFrame,
    index_name: str,
    catalog=None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Maintain a live ANN index from a vector stream via foreachBatch.

    Each micro-batch is one transactional append (validation + engine
    add + manifest bump). Returns the StreamingQuery; callers decide to
    awaitTermination (availableNow) or leave it running."""
    from ..index import insert_into_index

    def feed(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        insert_into_index(batch_df.sparkSession, index_name, batch_df, catalog)

    writer = stream.writeStream.foreachBatch(feed).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
