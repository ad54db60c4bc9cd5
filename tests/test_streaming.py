"""Structured Streaming: windowed aggregation + live index maintenance."""

import shutil

import pytest
from pyspark.sql import functions as F

from duckdb_ann_spark.index import Catalog, create_index, index_scan
from duckdb_ann_spark.sources import read_table
from duckdb_ann_spark.streaming import (
    read_event_stream,
    stream_index_append,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Stage events as a stream-source directory (batch-written parquet,
    same rows as the events table)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    shutil.rmtree(d)
    read_table(spark, sf_dir, "events").write.parquet(d)
    return d


def test_windowed_counts_match_batch(spark, sf_dir, events_dir):
    stream = read_event_stream(spark, events_dir)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start_epoch, r.event_type): (r.n, r.value_cents)
        for r in spark.table("win_counts").collect()
    }
    # batch oracle: same buckets computed without streaming
    ev = read_table(spark, sf_dir, "events")
    want = {
        (r.w, r.event_type): (r.n, r.value_cents)
        for r in ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_index_append(spark, sf_dir, tmp_path):
    """Micro-batches keep the ANN index live (streaming insert-after-DML)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cat = Catalog(str(tmp_path / "idx"))
    create_index(
        emb.where(F.col("vec_id") < 400), "vec_id", "embedding", "live",
        engine="faiss", catalog=cat,
    )
    src_dir = str(tmp_path / "vec_stream")
    emb.where(F.col("vec_id") >= 400).write.parquet(src_dir)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>, label int"
    ).parquet(src_dir)
    q = stream_index_append(
        stream.select("vec_id", "embedding"), "live", cat,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    m = cat.load("live")
    assert m["num_vectors"] == emb.count()
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 450).select("embedding").head()[0]]
    hits = [r.vec_id for r in index_scan(spark, "live", [qv], 3, catalog=cat).collect()]
    assert hits[0] == 450  # streamed-in row is searchable


def test_sessionize_matches_batch_islands(spark, sf_dir, tmp_path):
    """The custom stateful operator (applyInPandasWithState) must emit
    exactly the sessions a batch gaps-and-islands computation closes:
    every session whose close-timeout the final watermark passed."""
    from pyspark.sql import Window
    from duckdb_ann_spark.streaming import sessionize_events

    gap_ms = 30 * 60 * 1000
    d = str(tmp_path / "sess_events")
    ev = read_table(spark, sf_dir, "events")
    ev.coalesce(1).write.parquet(d)  # one file -> one data micro-batch

    stream = read_event_stream(spark, d)
    q = (
        sessionize_events(stream, gap_ms=gap_ms, watermark="1 second")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start_ms, r.session_end_ms): (
            r.n_events, r.value_cents,
        )
        for r in spark.table("sessions").collect()
    }

    # batch oracle: gaps-and-islands sessions, keeping only those whose
    # timeout (end + gap) the final watermark (max_ts - 1s) passed
    ms = (F.col("ts").cast("double") * 1000).cast("long")
    w = Window.partitionBy("user_id").orderBy("ms")
    sess = (
        ev.select("user_id", ms.alias("ms"),
                  F.round(F.col("value") * 100).cast("long").alias("cents"))
        .withColumn("prev", F.lag("ms").over(w))
        .withColumn(
            "brk",
            (F.col("prev").isNull() | (F.col("ms") - F.col("prev") > gap_ms))
            .cast("int"),
        )
        .withColumn("sid", F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ms").alias("s"), F.max("ms").alias("e"),
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c"),
        )
    )
    max_ms = ev.agg(F.max(ms)).head()[0]
    closed = sess.where(F.col("e") + gap_ms < max_ms - 1000)
    want = {
        (r.user_id, r.s, r.e): (r.n, r.c) for r in closed.collect()
    }
    assert len(got) > 0
    assert got == want
