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

    # batch oracle: gaps-and-islands sessions, keeping exactly those whose
    # timeout (end + gap) the final watermark (max_ts - 1s) passed
    # (watermark-held emission: later sessions stay pending in state)
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


def test_sessionize_late_segment_not_merged(spark, tmp_path):
    """A late segment arriving in a later micro-batch, more than the gap
    BEFORE the stored open session, must become its own session — naive
    state merging would fuse intervals separated by hours."""
    import os
    import pandas as pd
    from duckdb_ann_spark.streaming import sessionize_events

    d = str(tmp_path / "late_events")
    os.makedirs(d)
    base = pd.Timestamp("2024-01-10 12:00:00")
    f1 = os.path.join(d, "b1.parquet")
    f2 = os.path.join(d, "b2.parquet")
    pd.DataFrame(
        {"event_id": [1], "ts": [base], "user_id": [1],
         "event_type": ["x"], "value": [1.0], "props": [""]}
    ).to_parquet(f1, coerce_timestamps="us", allow_truncated_timestamps=True)
    pd.DataFrame(
        {
            "event_id": [2, 3],
            # late: 105 min BEFORE the open session; plus a far-future
            # event to advance the watermark past both timeouts
            "ts": [base - pd.Timedelta(minutes=105),
                   base + pd.Timedelta(hours=8)],
            "user_id": [1, 2],
            "event_type": ["x", "x"], "value": [2.0, 3.0], "props": ["", ""],
        }
    ).to_parquet(f2, coerce_timestamps="us", allow_truncated_timestamps=True)
    os.utime(f1, (1000000000, 1000000000))
    os.utime(f2, (1000000100, 1000000100))  # discovered second

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        sessionize_events(stream, gap_ms=30 * 60 * 1000, watermark="4 hours")
        .writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r.user_id, r.session_start_ms, r.n_events)
        for r in spark.table("late_sessions").collect()
    )
    ms = lambda t: int(t.value // 1_000_000)
    # two SEPARATE single-event sessions for user 1; user 2 still open
    assert rows == [
        (1, ms(base - pd.Timedelta(minutes=105)), 1),
        (1, ms(base), 1),
    ], rows


def test_stream_dedup_exact_matches_batch(spark, sf_dir, tmp_path):
    """Streaming exact dedup keeps one row per normalized-text digest and
    matches the batch dedup_exact key-set on the same data."""
    from duckdb_ann_spark.operators.dedup import dedup_exact
    from duckdb_ann_spark.streaming import stream_dedup_exact

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 200)
        .select(
            "doc_id",
            "text",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")).alias("ts"),
        )
    )
    d = str(tmp_path / "docs_stream")
    docs.coalesce(1).write.parquet(d)

    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(d)
    q = (
        stream_dedup_exact(stream, "text", "ts", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_stream")

    # one survivor per digest, and the digest set matches batch dedup_exact
    want_keys = {
        r.cluster_id
        for r in dedup_exact(docs, "doc_id", "text").where(~F.col("is_duplicate")).collect()
    }  # cluster ids = one representative per distinct normalized text
    n_got = got.count()
    assert n_got == len(want_keys), (n_got, len(want_keys))
    got_digests = {
        r[0]
        for r in got.select(F.sha2(F.lower(F.trim(F.col("text"))), 256)).collect()
    }
    assert len(got_digests) == n_got  # no duplicate texts survive


def test_stream_dedup_minhash_matches_sequential_policy(spark, tmp_path):
    """Streaming near-dedup must reproduce the one-pass band-collision
    policy simulated sequentially over (batch, event-time, id) order:
    drop a doc iff any of its LSH band keys was seen by an earlier doc
    inside the retention horizon; expired keys readmit copies."""
    import os
    import shutil

    from duckdb_ann_spark.operators.dedup import (
        band_keys_from_signatures,
        minhash_signatures,
    )
    from duckdb_ann_spark.streaming import stream_dedup_minhash

    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "sleeps near the warm fire in the old stone house")
    texts = {
        1: base,
        2: base + " tonight",  # near-dup of 1 (mostly shared shingles)
        3: ("completely different content describing spark dataframes "
            "parquet files and adaptive query execution at scale"),
        4: base,               # exact copy arriving in batch 2
        5: ("another unrelated document mentioning streaming watermarks "
            "state stores and checkpoint recovery semantics"),
        6: base,               # batch 3: beyond retention, readmitted
        7: base,               # null event time: passes through untouched
    }
    t0 = 1_700_000_000
    RET_MS = 2 * 3600 * 1000
    ts = {1: t0, 2: t0 + 10, 3: t0 + 20,
          4: t0 + 3600, 5: t0 + 3610,
          6: t0 + 30_000, 7: None}
    batches = [[1, 2, 3], [4, 5, 7], [6]]

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for n, batch in enumerate(batches):
        staged = str(tmp_path / f"stage{n}")
        (
            spark.createDataFrame(
                [(i, texts[i], ts[i]) for i in batch],
                "doc_id long, text string, ts_epoch long",
            )
            .withColumn("ts", F.timestamp_seconds("ts_epoch"))
            .select("doc_id", "text", "ts")
            .coalesce(1)
            .write.parquet(staged)
        )
        part = next(p for p in os.listdir(staged) if p.endswith(".parquet"))
        dst = str(in_dir / f"batch_{n}.parquet")
        shutil.copy(os.path.join(staged, part), dst)
        # file source orders batches by modification time
        os.utime(dst, (t0 + n, t0 + n))

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    out_dir, state_dir = str(tmp_path / "out"), str(tmp_path / "state")
    q = stream_dedup_minhash(
        stream, out_dir, state_dir, retention_ms=RET_MS, compact_every=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    got = sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())

    # sequential oracle over the SAME band keys the batch machinery derives
    all_docs = spark.createDataFrame(
        [(i, texts[i]) for i in sorted(texts)], "doc_id long, text string"
    )
    bp = band_keys_from_signatures(
        minhash_signatures(all_docs, "doc_id", "text"), "doc_id"
    ).toPandas()
    keys = {
        i: {(int(b), k) for b, k in
            bp[bp.doc_id == i][["band", "bkey"]].itertuples(index=False)}
        for i in texts
    }
    state: list[tuple[int, tuple]] = []  # (ts_ms, key)
    keep = []
    running_max = None  # the operator's horizon is watermark-style monotone
    for batch in batches:
        timed = [i for i in batch if ts[i] is not None]
        keep.extend(i for i in batch if ts[i] is None)  # null ts: pass through
        cand = [ts[i] * 1000 for i in timed]
        if running_max is not None:
            cand.append(running_max)
        running_max = max(cand)
        horizon = running_max - RET_MS
        retained = {k for t, k in state if t >= horizon}
        batch_seen: set = set()
        for i in sorted(timed, key=lambda i: (ts[i], i)):
            if not keys[i] & (retained | batch_seen):
                keep.append(i)
            batch_seen |= keys[i]
        state.extend((ts[i] * 1000, k) for i in timed for k in keys[i])
    assert got == sorted(keep), (got, sorted(keep))
    # the constructed certainties: exact copy dropped, expired copy back,
    # null-ts row passed through
    assert 4 not in got and 6 in got and 1 in got and 7 in got

    # state carries keys only (no text bodies) in per-batch generations
    st = spark.read.parquet(os.path.join(state_dir, "bands", "*"))
    assert sorted(st.columns) == ["band", "bkey", "ts_ms"]
    # compaction at batch 1 (compact_every=2) folded earlier generations
    gens = sorted(os.listdir(os.path.join(state_dir, "bands")))
    assert "c1" in gens, gens


def test_stream_prepare_corpus_matches_batch_gates(spark, sf_dir, tmp_path):
    """The streaming corpus prep admits exactly one representative per
    batch-kept fingerprint: same gates, same fingerprint key, first-seen
    instead of min-id."""
    from duckdb_ann_spark.operators.text_ops import fingerprint
    from duckdb_ann_spark.pipeline import annotate_and_gate
    from duckdb_ann_spark.streaming import stream_prepare_corpus

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.where(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.upper("text").alias("text"),  # same fingerprint after normalize?
    )
    # NB: fingerprints tokenize lowercase, so the uppercased copy shares
    # its original's fingerprint — a planted exact-dup pair per doc < 5
    staged = docs.unionByName(dups).withColumn(
        "ts", F.lit("2026-01-01 00:00:00").cast("timestamp")
    )
    in_dir = str(tmp_path / "in")
    staged.write.parquet(in_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(in_dir)
    )
    out = stream_prepare_corpus(
        stream, "doc_id", "text", "ts", langs=("en",), min_quality=0.65,
        watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("spc")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("spc")

    kept = annotate_and_gate(
        staged.select("doc_id", "text"), "doc_id", "text",
        langs=("en",), min_quality=0.65,
    )
    want_fps = {r["_fp"] for r in kept.select("_fp").distinct().collect()}
    got_fps = {
        r["fingerprint"]
        for r in fingerprint(got, "doc_id", "text").collect()
    }
    assert got.count() == len(want_fps)
    assert got_fps == want_fps
    # schema parity with the batch pipeline output
    assert got.columns == ["doc_id", "text", "n_chars", "n_tokens",
                           "quality_score", "lang_pred"]


def test_stream_dedup_minhash_published_corpus(spark, tmp_path):
    """Round-8: `published_path` adds a static band-key pre-filter — the
    streaming face of dedup_incremental. Stream docs colliding with the
    PUBLISHED corpus drop (regardless of event time: the corpus never
    expires), in-stream policy is unchanged for the rest."""
    import os

    from duckdb_ann_spark.operators.dedup import publish_minhash_signatures
    from duckdb_ann_spark.streaming import stream_dedup_minhash

    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "sleeps near the warm fire in the old stone house")
    other = ("completely different content describing spark dataframes "
             "parquet files and adaptive query execution at scale")
    pub = str(tmp_path / "pub")
    publish_minhash_signatures(
        spark.createDataFrame([(100, base)], "doc_id long, text string"),
        "doc_id", "text", pub,
    )
    third = ("a third body of text about graph indexes shards and "
             "recall floors measured against exact brute force truth")
    t0 = 1_700_000_000
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (
        spark.createDataFrame(
            [(1, base, t0), (2, other, t0 + 10), (3, other + " x", t0 + 20),
             # null event time: bypasses the horizon machinery but must
             # STILL be checked against the static corpus (r8 review)
             (4, base, None), (5, third, None)],
            "doc_id long, text string, ts_epoch long",
        )
        .withColumn("ts", F.timestamp_seconds("ts_epoch"))
        .select("doc_id", "text", "ts")
        .coalesce(1)
        .write.parquet(str(in_dir / "b0.parquet"))
    )
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(str(in_dir / "b0.parquet"))
    )
    out_dir = str(tmp_path / "out")
    q = stream_dedup_minhash(
        stream, out_dir, str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"), published_path=pub,
    )
    q.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())
    # 1 collides with published doc 100 → dropped; 3 near-dups 2 inside
    # the batch → in-stream policy drops the later one; 4 (null ts)
    # collides with the corpus → dropped despite bypassing the horizon;
    # 2 and 5 survive
    assert got == [2, 5], got


def test_stream_dedup_minhash_state_version_guard(spark, tmp_path):
    """Round 15 (r14 advice): band keys changed md5-string -> xxhash64
    bigint (BAND_KEY_VERSION 2). A stream resumed over a v1 state_dir
    must fail LOUD at query construction — old string keys can never
    match new bigint ones, so continuing would silently readmit
    within-horizon duplicates (or crash mid-batch on a parquet type
    merge). Fresh state dirs get a key_version marker; mismatched
    markers and pre-marker string-bkey generations both refuse."""
    from duckdb_ann_spark.operators.dedup import BAND_KEY_VERSION
    from duckdb_ann_spark.streaming import stream_dedup_minhash

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (
        spark.createDataFrame(
            [(1, "some text body", 1_700_000_000)],
            "doc_id long, text string, ts_epoch long",
        )
        .withColumn("ts", F.timestamp_seconds("ts_epoch"))
        .select("doc_id", "text", "ts")
        .coalesce(1)
        .write.parquet(str(in_dir / "b0.parquet"))
    )

    def mk_stream():
        return (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .parquet(str(in_dir / "b0.parquet"))
        )

    # 1) pre-marker v1 state: a generation with STRING bkey -> refuse
    v1_state = str(tmp_path / "state_v1")
    spark.createDataFrame(
        [(0, "deadbeef" * 4, 1_700_000_000_000)],
        "band int, bkey string, ts_ms long",
    ).write.parquet(f"{v1_state}/bands/b0")
    with pytest.raises(ValueError, match="pre-v"):
        stream_dedup_minhash(
            mk_stream(), str(tmp_path / "out1"), v1_state,
            checkpoint_dir=str(tmp_path / "ckpt1"),
        )

    # 2) explicit marker with a stale version -> refuse
    v_old = str(tmp_path / "state_old_marker")
    spark.createDataFrame([(1,)], "key_version int").write.parquet(
        f"{v_old}/key_version"
    )
    with pytest.raises(ValueError, match="band-key version 1"):
        stream_dedup_minhash(
            mk_stream(), str(tmp_path / "out2"), v_old,
            checkpoint_dir=str(tmp_path / "ckpt2"),
        )

    # 3) fresh dir: marker written, stream runs, resume over own state OK
    fresh = str(tmp_path / "state_fresh")
    q = stream_dedup_minhash(
        mk_stream(), str(tmp_path / "out3"), fresh,
        checkpoint_dir=str(tmp_path / "ckpt3"),
    )
    q.awaitTermination(120)
    mv = spark.read.parquet(f"{fresh}/key_version").head()["key_version"]
    assert mv == BAND_KEY_VERSION
    # re-construction over the now-populated same-version state succeeds
    q2 = stream_dedup_minhash(
        mk_stream(), str(tmp_path / "out4"), fresh,
        checkpoint_dir=str(tmp_path / "ckpt4"),
    )
    q2.awaitTermination(120)

    # 4) unversioned-but-bigint generations (written by a v2 engine
    # before the marker existed): adopted, marker backfilled
    adopt = str(tmp_path / "state_adopt")
    spark.createDataFrame(
        [(0, 12345, 1_700_000_000_000)], "band int, bkey long, ts_ms long"
    ).write.parquet(f"{adopt}/bands/b0")
    q3 = stream_dedup_minhash(
        mk_stream(), str(tmp_path / "out5"), adopt,
        checkpoint_dir=str(tmp_path / "ckpt5"),
    )
    q3.awaitTermination(120)
    mv2 = spark.read.parquet(f"{adopt}/key_version").head()["key_version"]
    assert mv2 == BAND_KEY_VERSION
