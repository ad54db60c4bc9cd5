"""Driver query: Structured Streaming windowed aggregation.

The stream runs with Trigger.AvailableNow over a staged copy of the
events table, so the result is deterministic and equals the batch
windowed aggregation — which is what the DuckDB oracle computes
(hour buckets as epoch seconds, counts, cents)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..sources import read_table
from ..streaming import read_event_stream, windowed_event_counts
from . import register


@register(
    "streaming_windowed_counts",
    """
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_epoch,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY 1, 2
    """,
)
def q_streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stage = os.path.join(
        tempfile.gettempdir(), f"suite_events_stream_{os.getpid()}"
    )
    if os.path.exists(stage):
        shutil.rmtree(stage)
    read_table(spark, sf_dir, "events").write.parquet(stage)
    name = f"suite_win_counts_{os.getpid()}"
    q = (
        windowed_event_counts(
            read_event_stream(spark, stage), window="1 hour", watermark="2 hours"
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)
