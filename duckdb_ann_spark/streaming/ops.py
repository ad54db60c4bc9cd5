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
  (`src/diskann_index.cpp:316-361`);
* :func:`sessionize_events` — a CUSTOM STATEFUL operator
  (`applyInPandasWithState`): per-user gap-based sessionization with
  event-time state timeout. The per-group state is one open session
  tuple; closed sessions are emitted as soon as the gap rule or the
  watermark closes them, so state stays O(active users) forever.

All run with `Trigger.AvailableNow` for deterministic testing and as
continuous micro-batch jobs in production.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


SESSION_SCHEMA = (
    "user_id long, session_start_ms long, session_end_ms long, "
    "n_events long, value_cents long"
)
_SESSION_STATE = "start long, end long, n long, cents long"


def sessionize_events(
    stream: DataFrame,
    gap_ms: int = 30 * 60 * 1000,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user sessionization as a custom stateful operator.

    Events for a user belong to one session while consecutive gaps are
    <= `gap_ms`; a larger gap closes the session. The open session is
    the per-group state; an event-time timeout at `end + gap_ms` closes
    it when the watermark passes (late data beyond the watermark is
    dropped by the engine, bounding state like the windowed agg).

    Segment detection inside the UDF is vectorized (np.diff for breaks,
    add.reduceat for per-segment sums) — the python loop is over
    sessions, not events.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            s, e, n, c = state.get
            state.remove()
            yield pd.DataFrame(
                [[key[0], s, e, n, c]],
                columns=[
                    "user_id", "session_start_ms", "session_end_ms",
                    "n_events", "value_cents",
                ],
            )
            return
        pdf = pd.concat(list(pdfs))
        ms = pdf[ts_col].to_numpy().astype("datetime64[ms]").astype("int64")
        # half-away-from-zero, matching SQL round() (np.rint would round
        # half-to-even and drift from the oracle by one cent)
        v100 = pdf["value"].to_numpy() * 100
        cents = (np.sign(v100) * np.floor(np.abs(v100) + 0.5)).astype("int64")
        order = np.argsort(ms, kind="stable")
        ms, cents = ms[order], cents[order]

        starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(ms) > gap_ms) + 1]
        )
        ends = np.concatenate([starts[1:], [len(ms)]])
        seg_sum = np.add.reduceat(cents, starts)
        sessions = [
            (int(ms[a]), int(ms[b - 1]), int(b - a), int(seg_sum[i]))
            for i, (a, b) in enumerate(zip(starts, ends))
        ]
        if state.exists:
            # fold the open-session interval in by start order: a late
            # batch can sort anywhere relative to the stored session, so
            # comparing only against the first new segment would merge
            # intervals separated by more than the gap
            sessions.append(tuple(state.get))
            sessions.sort(key=lambda s: s[0])
            merged = [sessions[0]]
            for seg in sessions[1:]:
                last = merged[-1]
                if seg[0] - last[1] <= gap_ms:
                    merged[-1] = (
                        min(last[0], seg[0]), max(last[1], seg[1]),
                        last[2] + seg[2], last[3] + seg[3],
                    )
                else:
                    merged.append(seg)
            sessions = merged
        closed, last = sessions[:-1], sessions[-1]
        state.update(last)
        state.setTimeoutTimestamp(last[1] + gap_ms)
        if closed:
            yield pd.DataFrame(
                [[key[0], *sess] for sess in closed],
                columns=[
                    "user_id", "session_start_ms", "session_end_ms",
                    "n_events", "value_cents",
                ],
            )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _SESSION_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
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
