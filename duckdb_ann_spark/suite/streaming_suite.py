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
from pyspark.sql import functions as F

from ..oracle import sql_index_distance
from ..sources import read_table
from ..streaming import read_event_stream, windowed_event_counts
from . import register


def _stage_dir(tag: str) -> str:
    d = os.path.join(tempfile.gettempdir(), f"suite_{tag}_{os.getpid()}")
    if os.path.exists(d):
        shutil.rmtree(d)
    return d


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
    "streaming_dedup_exact",
    """
    WITH aug AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000000, text FROM documents WHERE doc_id < 5
    )
    SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
    FROM aug GROUP BY sha256(lower(trim(text)))
    """,
)
def q_streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (`dropDuplicatesWithinWatermark` on the
    normalized-text digest): survivors of a duplicate-augmented document
    stream. Staged as ONE file sorted by doc_id — a single source
    partition, so per-key 'first seen' is file order and the survivor is
    the smallest doc_id, which is exactly what the batch oracle picks."""
    from ..streaming import stream_dedup_exact

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    aug = docs.unionByName(
        docs.where(F.col("doc_id") < 5).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        )
    ).withColumn(
        "ts",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")),
    )
    stage = _stage_dir("docs_dedup_stream")
    aug.orderBy("doc_id").coalesce(1).write.parquet(stage)
    name = f"suite_stream_dedup_{os.getpid()}"
    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(stage)
    q = (
        stream_dedup_exact(stream, "text", "ts", watermark="1 hour")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).select("doc_id")


@register(
    "streaming_index_append",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 450)
    SELECT e.vec_id, {sql_index_distance('l2', 'e.embedding', 'q.qv')}
               AS _distance
    FROM embeddings e CROSS JOIN q
    ORDER BY _distance, e.vec_id LIMIT 10
    """,
)
def q_streaming_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live index maintenance: a FAISS Flat index built on part of the
    embeddings table is kept current by `stream_index_append` micro-batches
    over the rest; the post-stream exact scan must equal brute force over
    the WHOLE table (streamed-in rows are immediately searchable — the
    insert-after-DML consistency the reference pins in
    `src/diskann_index.cpp:316-361`)."""
    from ..index import Catalog, create_index, drop_index, index_scan
    from ..streaming import stream_index_append

    cat = Catalog(os.path.join(
        tempfile.gettempdir(), f"suite_stream_idx_{os.getpid()}"
    ))
    drop_index("suite_live", cat)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    create_index(
        emb.where(F.col("vec_id") < 400), "vec_id", "embedding",
        "suite_live", engine="faiss", catalog=cat,
    )
    stage = _stage_dir("vec_stream")
    emb.where(F.col("vec_id") >= 400).write.parquet(stage)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>, label int"
    ).parquet(stage)
    q = stream_index_append(
        stream.select("vec_id", "embedding"), "suite_live", cat,
        checkpoint_dir=_stage_dir("vec_stream_ckpt"),
    )
    q.awaitTermination(300)
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 450).select("embedding").head()[0]]
    return index_scan(spark, "suite_live", [qv], 10, catalog=cat).drop(
        "query_idx"
    )


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
