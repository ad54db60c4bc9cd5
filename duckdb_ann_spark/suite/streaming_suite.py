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


@register(
    "streaming_sessionize",
    """
    WITH e AS (
        SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS ms,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ), marks AS (
        SELECT *, CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
                            IS NULL
                       OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
                            > 1800000
                  THEN 1 ELSE 0 END AS brk
        FROM e
    ), sess AS (
        SELECT *, SUM(brk) OVER (
            PARTITION BY user_id ORDER BY ms ROWS UNBOUNDED PRECEDING
        ) AS sid
        FROM marks
    ), agg AS (
        SELECT user_id, sid,
               MIN(ms) AS session_start_ms, MAX(ms) AS session_end_ms,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(cents) AS BIGINT) AS value_cents
        FROM sess GROUP BY user_id, sid
    ), mx AS (SELECT MAX(CAST(epoch_ms(ts) AS BIGINT)) AS m FROM events)
    SELECT a.user_id, session_start_ms, session_end_ms, n_events, value_cents
    FROM agg a, mx
    -- emitted = exactly the sessions whose close-timeout (end + gap) the
    -- final watermark (max_ts - 1s) passed; later sessions stay pending
    WHERE session_end_ms + 1800000 < m - 1000
    """,
)
def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    gap-sessionization. A session is emitted only once the watermark
    passes its close-timeout (watermark-held emission, round-3 fix), so
    with a 1s watermark the emitted set is exactly the batch
    gaps-and-islands sessions whose `end + gap` precedes the final
    watermark."""
    from ..streaming import sessionize_events

    stage = os.path.join(
        tempfile.gettempdir(), f"suite_events_sess_{os.getpid()}"
    )
    if os.path.exists(stage):
        shutil.rmtree(stage)
    # one file -> one data micro-batch: sessions never split mid-stream
    read_table(spark, sf_dir, "events").coalesce(1).write.parquet(stage)
    name = f"suite_sessions_{os.getpid()}"
    q = (
        sessionize_events(
            read_event_stream(spark, stage),
            gap_ms=30 * 60 * 1000,
            watermark="1 second",
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)
