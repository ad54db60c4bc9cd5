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
* :func:`stream_dedup_exact` — streaming exact deduplication of a
  document stream: the first row per normalized-text digest inside the
  watermark horizon passes, later copies are dropped, and digest state
  ages out with the watermark (the continuously-ingesting counterpart
  of `operators.dedup.dedup_exact`);
* :func:`stream_prepare_corpus` — streaming corpus prep: the batch
  pipeline's stateless gates (PII scrub, fused annotate, language/
  quality, repetition ceilings) + watermark-bounded exact dedup on the
  batch pipeline's fingerprint (the continuously-ingesting counterpart
  of `pipeline.prepare_corpus`);
* :func:`stream_dedup_minhash` — streaming MinHash-LSH NEAR-dedup via
  `foreachBatch` against a keys-only parquet state table with
  retention-horizon expiry and periodic compaction (the streaming
  counterpart of `minhash_candidate_pairs`, identical band-key
  derivation);
* :func:`sessionize_events` — a CUSTOM STATEFUL operator
  (`applyInPandasWithState`): per-user gap-based sessionization with
  event-time state timeout. The per-group state is the list of pending
  sessions; a session is emitted only when the watermark passes its
  close-timeout (so late-but-admissible events can never contradict an
  already-emitted row), keeping state O(active users x sessions per
  watermark horizon) forever.

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


def stream_dedup_exact(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    normalize: bool = True,
) -> DataFrame:
    """Streaming exact dedup: keep the first row per normalized-text
    digest seen inside the watermark horizon, drop later copies.

    The dedup key is the same 256-bit digest `dedup_exact` groups on, so
    state carries (digest, timestamp) — never document bodies — and
    `dropDuplicatesWithinWatermark` expires keys once the watermark
    passes them. That bound is what makes this runnable forever on a
    100 TB/day ingest: state ≈ distinct digests per watermark window,
    not per stream lifetime. (A plain `dropDuplicates` on a stream
    accumulates state without bound.)

    Exactly-once caveat shared with every watermarked dedup: a duplicate
    arriving later than the watermark horizon is admitted again — pair
    with a periodic batch `dedup_exact` compaction for full-history
    guarantees.
    """
    norm = F.lower(F.trim(F.col(text_col))) if normalize else F.col(text_col)
    keyed = stream.withColumn("_key", F.sha2(norm, 256))
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_key"])
        .drop("_key")
    )


def stream_prepare_corpus(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    *,
    langs=("en",),
    min_quality: float = 0.65,
    watermark: str = "2 hours",
    scrub_pii: bool = False,
    repetition_gates: dict[str, float] | None = None,
) -> DataFrame:
    """Streaming corpus prep: :func:`duckdb_ann_spark.pipeline
    .prepare_corpus`'s STATELESS per-document stages ([PII scrub] →
    fused annotate → language/quality filter [→ repetition gates]) plus
    watermark-bounded exact dedup keyed on the SAME normalized-token
    fingerprint the batch pipeline groups on — so a document admitted by
    the stream is exactly one the batch pipeline would keep some
    representative of.

    → (id, text, n_chars, n_tokens, quality_score, lang_pred), the batch
    output schema. Divergences by construction: the stream keeps the
    FIRST-SEEN row per fingerprint (batch keeps the min id — a stream
    can't see the future), a duplicate arriving after the watermark
    horizon is re-admitted (pair with a periodic batch compaction), and
    near-dedup / LM gating stay separate: near-dedup has its own
    keys-only state policy (:func:`stream_dedup_minhash`) and the LM
    gate trains on a full corpus a stream doesn't have.

    State = (fingerprint digest, event time) only, expired by the
    watermark; every gate is a row-local projection, so the operator
    runs forever on a continuous ingest."""
    from ..pipeline import annotate_and_gate

    kept = annotate_and_gate(
        stream, id_col, text_col, langs=langs, min_quality=min_quality,
        scrub_pii=scrub_pii, repetition_gates=repetition_gates,
        extra_cols=(ts_col,),
    )
    return (
        kept.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .select(id_col, text_col, "n_chars", "n_tokens", "quality_score",
                "lang_pred")
    )


SESSION_SCHEMA = (
    "user_id long, session_start_ms long, session_end_ms long, "
    "n_events long, value_cents long"
)
# pending sessions as parallel arrays, sorted by start (the last one is
# the open session; earlier ones are gap-closed but still merge-eligible
# until the watermark passes their end + gap)
_SESSION_STATE = (
    "starts array<long>, ends array<long>, ns array<long>, cents array<long>"
)
_SESSION_COLS = [
    "user_id", "session_start_ms", "session_end_ms", "n_events", "value_cents",
]


def sessionize_events(
    stream: DataFrame,
    gap_ms: int = 30 * 60 * 1000,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user sessionization as a custom stateful operator.

    Events for a user belong to one session while consecutive gaps are
    <= `gap_ms`; a larger gap closes the session. ALL pending sessions
    (open + gap-closed) stay in the per-group state, and a session is
    emitted only once the watermark passes `end + gap_ms` — at that point
    no admissible event (every future event has ts >= watermark) can
    merge into or near it, so the emission is final. Emitting gap-closed
    sessions immediately would let a late-but-admissible event produce an
    extra/contradicting session row (round-2 advisory finding).

    State stays bounded: the watermark both drops older events and
    continuously drains emitted sessions, so pending sessions per user
    ≈ sessions inside one watermark horizon.

    Segment detection inside the UDF is vectorized (np.diff for breaks,
    add.reduceat for per-segment sums) — the python loop is over
    sessions, not events.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _flush(key, sessions, state, wm):
        """Emit watermark-safe sessions, re-arm the timeout for the rest."""
        safe = [s for s in sessions if s[1] + gap_ms < wm]
        pend = [s for s in sessions if s[1] + gap_ms >= wm]
        if pend:
            state.update((
                [s[0] for s in pend], [s[1] for s in pend],
                [s[2] for s in pend], [s[3] for s in pend],
            ))
            # must be strictly beyond the current watermark to be accepted
            state.setTimeoutTimestamp(max(min(s[1] + gap_ms for s in pend),
                                          wm + 1))
        else:
            state.remove()
        if safe:
            yield pd.DataFrame(
                [[key[0], *s] for s in safe], columns=_SESSION_COLS
            )

    def fn(key, pdfs, state: GroupState):
        wm = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            starts, ends, ns, cs = state.get
            sessions = list(zip(starts, ends, ns, cs))
            yield from _flush(key, sessions, state, wm)
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
            # fold the stored intervals in by start order: a late batch
            # can sort anywhere relative to the stored sessions, so
            # comparing only against the first new segment would merge
            # intervals separated by more than the gap
            st, en, n_, c_ = state.get
            sessions.extend(zip(st, en, n_, c_))
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
        yield from _flush(key, sessions, state, wm)

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


def stream_dedup_minhash(
    stream: DataFrame,
    out_dir: str,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    retention_ms: int = 2 * 3600 * 1000,
    compact_every: int = 8,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    published_path: str | None = None,
):
    """Streaming MinHash-LSH near-deduplication via ``foreachBatch``.

    The streaming counterpart of `operators.dedup.minhash_candidate_pairs`
    + the pipeline's drop policy: a document is DROPPED when any of its
    LSH band keys (identical derivation to the batch path —
    `band_keys_from_signatures`) was already seen, either

    * by an earlier document in the same micro-batch (earlier =
      smaller (event-time, id), the same deterministic "first wins"
      batch policy), or
    * by any prior batch inside the retention horizon.

    State is a parquet table of (band, bkey, ts_ms) — 8-byte xxhash64
    keys ONLY (BAND_KEY_VERSION 2), never text bodies or signatures, so
    state size is O(docs-per-horizon x n_bands x ~20 B) however large
    the documents are. Every batch appends its keys (dropped docs' keys too, matching
    the batch policy where dropped docs still anchor future pairs) and
    every `compact_every`-th batch rewrites the table with expired keys
    removed, bounding both disk and the per-batch anti-join input.

    Divergence from the batch pipeline, documented: the batch path
    verifies LSH candidates with exact shingle Jaccard before dropping;
    the stream drops on band collision alone (one-pass latency — a
    verification would need text bodies in state). Band-collision false
    positives pass at the banded-LSH rate; pair with a periodic batch
    `prepare_corpus` compaction for exact-verified history, the same
    pairing `stream_dedup_exact` documents.

    Crash-safety (foreachBatch is at-least-once, so every write is
    fenced by batch id):

    * survivors land in `out_dir/batch_id=<id>/` with mode=overwrite —
      a re-executed batch replaces its own output instead of appending
      duplicates; `spark.read.parquet(out_dir)` consumers see an extra
      `batch_id` partition column;
    * state is a set of parquet GENERATIONS `state_dir/bands/b<id>` (one
      per batch, overwrite) plus compaction generations `c<id>`; the
      cross-batch check reads every generation EXCEPT the current
      batch's own, so a retry never collides with its first attempt;
    * compaction merges retained keys of all generations into `c<id>`
      and only then deletes the sources — a crash mid-delete leaves
      duplicate keys, which are harmless to the leftsemi collision
      check (state is a set); a retry that finds `c<id>` already
      present skips the merge.
    * the retention horizon is watermark-style MONOTONE: max event time
      ever seen (batch ∪ state) minus `retention_ms`, so an out-of-order
      batch cannot resurrect or out-run expired keys; like any
      watermarked dedup, data arriving later than the horizon is
      deduplicated best-effort only.

    Rows with a null `ts_col` cannot be placed on the event-time
    horizon: they bypass the horizon-based in-stream dedup (pass through
    un-deduplicated, never enter state) — but they ARE still checked
    against the published corpus below, which needs no event time.

    ``published_path`` (round 8) points at a
    `publish_minhash_signatures` artifact: every batch additionally
    drops documents whose band keys collide with the PUBLISHED corpus
    (a static leftsemi join per batch — the streaming face of
    `dedup_incremental`). The corpus band frame is validated
    (commit-marker manifest + LSH-parameter match) and persisted ONCE
    at query construction — it stays cached for the stream's lifetime
    rather than being re-scanned per trigger. Unlike streaming state,
    the published corpus is immutable reference data: it never expires
    with the retention horizon and is never rewritten by compaction.

    All filesystem maintenance goes through the Hadoop FileSystem API,
    so `state_dir`/`out_dir` may live on any Spark-readable scheme
    (local, HDFS, S3A, ...).

    State carries a `key_version` marker (round 15): resuming over a
    state_dir written under a different band-key derivation fails loud
    at query construction instead of silently never matching old keys
    (the published-corpus artifact has the same guard).

    Returns the StreamingQuery writing survivors to `out_dir`.
    """
    from ..operators.dedup import (
        BAND_KEY_VERSION,
        band_keys_from_signatures,
        minhash_signatures,
        published_band_keys,
    )

    # Round 15 (r14 advice): the band-key derivation changed md5-string
    # → xxhash64-bigint in v2; a stream resumed over a v1 state_dir
    # would read old string-bkey generations alongside new bigint ones
    # — a parquet type-merge failure at best, silent readmission of
    # within-horizon duplicates at worst. Mirror the published-artifact
    # guard: a `key_version` marker parquet lives beside `bands/`,
    # checked (and, for pre-marker state, inferred from the generations'
    # bkey column type) ONCE at query construction, driver-side.
    spark0 = stream.sparkSession
    state_root = state_dir.rstrip("/")
    marker_path = f"{state_root}/key_version"
    jvm0 = spark0._jvm
    hconf0 = spark0._jsc.hadoopConfiguration()
    mk_p = jvm0.org.apache.hadoop.fs.Path(marker_path)
    fs0 = mk_p.getFileSystem(hconf0)
    bands_p = jvm0.org.apache.hadoop.fs.Path(f"{state_root}/bands")
    if fs0.exists(mk_p):
        mv = spark0.read.parquet(marker_path).head()["key_version"]
        if mv != BAND_KEY_VERSION:
            raise ValueError(
                f"streaming dedup state at '{state_dir}' uses band-key "
                f"version {mv}, this engine derives version "
                f"{BAND_KEY_VERSION} — old keys would never match new "
                "ones, silently readmitting duplicates. Expire the "
                "state_dir (or re-seed it) before resuming"
            )
    else:
        if fs0.exists(bands_p):
            for s in fs0.listStatus(bands_p):
                gen = s.getPath().toString()
                bt = spark0.read.parquet(gen).schema["bkey"]
                if bt.dataType.simpleString() != "bigint":
                    raise ValueError(
                        f"streaming dedup state at '{state_dir}' holds "
                        f"pre-v{BAND_KEY_VERSION} generations (bkey is "
                        f"{bt.dataType.simpleString()}, engine derives "
                        "xxhash64 bigint) — expire the state_dir before "
                        "resuming"
                    )
        # fresh dir, or unversioned-but-bigint (adopted as current)
        spark0.createDataFrame(
            [(int(BAND_KEY_VERSION),)], "key_version int"
        ).coalesce(1).write.mode("overwrite").parquet(marker_path)

    # validate + build the published corpus band frame ONCE (round-8
    # review: per-batch spark.read re-scanned the immutable corpus every
    # trigger) and PERSIST it — intentionally pinned for the stream's
    # lifetime, it is the reference table every batch semi-joins. It is
    # registered with the caching module so `release_operator_caches()`
    # can free it after the query stops (the frame outlives every
    # caller reference otherwise).
    pub_bands = None
    if published_path:
        from ..caching import track_caches

        pub_bands = (
            published_band_keys(stream.sparkSession, published_path)
            .select("band", "bkey")
            .persist()
        )
        track_caches(pub_bands, pub_bands)

    def _fs(spark, path: str):
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm

    def feed(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        bands = None
        try:
            ts_ms = (F.col(ts_col).cast("double") * 1000).cast("long")
            timed = batch_df.where(F.col(ts_col).isNotNull())
            docs = timed.select(
                F.col(id_col), F.col(text_col), ts_ms.alias("_ts_ms")
            )
            # keys only, tiny — persist: consumed by the intra-batch agg
            # + join, the cross-batch leftsemi, and the state write (the
            # batch path persists its signature table for the same
            # multi-consumer reason)
            bands = band_keys_from_signatures(
                minhash_signatures(docs, id_col, text_col), id_col
            ).join(docs.select(id_col, "_ts_ms"), on=id_col).persist()

            # intra-batch: first (ts, id) per bucket wins
            first = bands.groupBy("band", "bkey").agg(
                F.min(F.struct("_ts_ms", id_col)).alias("_first")
            )
            intra_losers = (
                bands.join(first, on=["band", "bkey"])
                .where(
                    F.struct("_ts_ms", F.col(id_col)) != F.col("_first")
                )
                .select(id_col)
            )

            # cross-batch: any band key already in a retained generation
            root = state_dir.rstrip("/") + "/bands"
            fs, root_p, jvm = _fs(spark, root)
            gens = []
            if fs.exists(root_p):
                gens = [
                    s.getPath().toString()
                    for s in fs.listStatus(root_p)
                    if s.getPath().getName() != f"b{batch_id}"
                ]
            max_ts_row = timed.agg(F.max(ts_ms)).collect()[0][0]
            batch_max = int(max_ts_row) if max_ts_row is not None else None
            horizon = None
            cross_losers = None
            state = None
            if gens:
                state = spark.read.parquet(*gens)
                seen_max = state.agg(F.max("ts_ms")).collect()[0][0]
                cand = [t for t in (batch_max, seen_max) if t is not None]
                if cand:
                    horizon = max(cand) - int(retention_ms)
                    retained = state.where(F.col("ts_ms") >= F.lit(horizon))
                    cross_losers = (
                        bands.join(retained, on=["band", "bkey"],
                                   how="leftsemi")
                        .select(id_col)
                    )
            elif batch_max is not None:
                horizon = batch_max - int(retention_ms)

            losers = (
                intra_losers if cross_losers is None
                else intra_losers.unionByName(cross_losers)
            )
            if pub_bands is not None:
                # corpus collisions need NO event time, so null-ts rows
                # are filtered too (r8 review — they bypass the
                # horizon-based state machinery, not the static corpus);
                # their band keys are derived here, the only place that
                # needs them
                untimed = batch_df.where(F.col(ts_col).isNull()).select(
                    F.col(id_col), F.col(text_col)
                )
                all_bands = bands.select(id_col, "band", "bkey").unionByName(
                    band_keys_from_signatures(
                        minhash_signatures(untimed, id_col, text_col), id_col
                    )
                )
                pub_losers = all_bands.join(
                    pub_bands, on=["band", "bkey"], how="leftsemi"
                ).select(id_col)
                losers = losers.unionByName(pub_losers)
            losers = losers.distinct()
            batch_df.join(losers, on=id_col, how="anti").write.mode(
                "overwrite"
            ).parquet(f"{out_dir.rstrip('/')}/batch_id={batch_id}")

            bands.select(
                "band", "bkey", F.col("_ts_ms").alias("ts_ms")
            ).write.mode("overwrite").parquet(f"{root}/b{batch_id}")

            if horizon is not None and compact_every and (
                batch_id % compact_every == compact_every - 1
            ):
                cpath = f"{root}/c{batch_id}"
                _, cp, _ = _fs(spark, cpath)
                if not fs.exists(cp):  # retry: earlier merge already valid
                    # never fold the current batch's own generation: the
                    # cross-batch read of a RETRY excludes b<id> but not
                    # c<id>, so c<id> containing this batch's keys would
                    # make the retry collide with itself
                    sources = [
                        s.getPath() for s in fs.listStatus(root_p)
                        if s.getPath().getName()
                        not in (f"c{batch_id}", f"b{batch_id}")
                    ]
                    if sources:
                        (
                            spark.read.parquet(
                                *[p.toString() for p in sources]
                            )
                            .where(F.col("ts_ms") >= F.lit(horizon))
                            .repartition(1)
                            .write.parquet(cpath)
                        )
                        # delete AFTER the merge is durable; a crash
                        # mid-way leaves duplicate keys (harmless set
                        # semantics)
                        for p in sources:
                            fs.delete(p, True)
        finally:
            if bands is not None:
                bands.unpersist()
            batch_df.unpersist()

    writer = stream.writeStream.foreachBatch(feed).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
