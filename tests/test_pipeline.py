"""Composed corpus-prep pipeline: stage semantics + plan shape."""

import pytest
from pyspark.sql import functions as F

from duckdb_ann_spark.pipeline import prepare_corpus

# quality floor of 0 so the tiny fixtures aren't dropped for length;
# every doc below is "en" for the marker heuristic unless noted
BASE = "the quick brown fox jumps over the lazy dog again and again today"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),                       # exact dup of 0 → dropped
        # distinct text (shingle Jaccard with BASE ~0): BASE + a short
        # suffix would be a TRUE near-dup (J = 11/21 > 0.5) that a sharp
        # LSH is allowed to catch
        (2, "the ship sailed over a calm sea while the crew slept and dreamed"),
        (3, "el la los de y es en que un una perro gato casa sol mar"),  # es
        (4, "  " + BASE.upper() + "  "),  # dup of 0 after normalization
        (5, BASE + " x"),                # near dup of 0 → dropped
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prepare_corpus_stages(spark, corpus):
    out = prepare_corpus(
        corpus, "doc_id", "text", langs=("en",), min_quality=0.0,
        near_dup_threshold=0.5,
    ).collect()
    ids = sorted(r["doc_id"] for r in out)
    # 1 and 4 fall to exact dedup (same normalized fingerprint as 0),
    # 3 to the language filter, 5 to near-dedup (larger id of the pair)
    assert ids == [0, 2], ids
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["lang_pred"] == "en"
    assert by_id[0]["n_tokens"] == len(BASE.split())
    assert 0.0 <= by_id[0]["quality_score"] <= 1.0


def test_prepare_corpus_release_caches(spark, corpus):
    """Round-7 (round-6 advice follow-up): the pipeline's persisted
    intermediates (cleaned working set, LSH candidate/shingle slices,
    LM count table) ride on the returned frame; release_caches frees
    them ALL — no net-new persisted blocks survive a round-trip."""
    from duckdb_ann_spark.caching import release_caches

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    assert cm.isEmpty()
    out = prepare_corpus(
        corpus, "doc_id", "text", langs=("en",), min_quality=0.0,
        min_avg_logprob=-20.0,  # exercises the LM stage's count table
    )
    out.count()
    assert not cm.isEmpty()  # the plan really persisted intermediates
    assert release_caches(out) >= 3  # uniq + cands + shingles (+ counts)
    assert cm.isEmpty()
    assert release_caches(out) == 0  # idempotent


def test_release_operator_caches_catches_derived_frames(spark, corpus):
    """Round-8 (r7 advice): a transformation of the returned frame drops
    the tracked-frames attribute, so release_caches on the DERIVED frame
    frees nothing — the process-level release_operator_caches sweep is
    the fallback that still frees every operator-persisted block."""
    from duckdb_ann_spark.caching import (
        release_caches,
        release_operator_caches,
    )

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    release_operator_caches()  # drain anything from earlier tests
    out = prepare_corpus(
        corpus, "doc_id", "text", langs=("en",), min_quality=0.0,
    )
    derived = out.select("doc_id")  # attribute does NOT propagate
    derived.count()
    assert not cm.isEmpty()
    assert release_caches(derived) == 0  # the documented trap
    # the sweep must survive the caller dropping EVERY reference (the
    # long-lived-service scenario): Spark pins the blocks regardless of
    # python wrappers, so the registry holds strong refs (r8 review)
    import gc

    del out, derived
    gc.collect()
    assert release_operator_caches() >= 3  # the sweep still frees them
    assert cm.isEmpty()
    assert release_operator_caches() == 0  # idempotent


def test_prepare_corpus_quality_filter(spark, corpus):
    # an impossible floor empties the corpus (and nothing crashes
    # downstream: dedup over zero rows)
    out = prepare_corpus(corpus, "doc_id", "text", min_quality=2.0)
    assert out.count() == 0


def test_prepare_corpus_annotate_is_single_scan(spark, corpus):
    """Exact dedup must be a map-side-combinable hash aggregation
    (partial min_by before the fingerprint exchange), not a sort-based
    window — at scale the agg shuffles one running row per distinct
    digest where a window would sort and hold whole partitions."""
    out = prepare_corpus(corpus, "doc_id", "text", min_quality=0.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_min_by" in plan, plan
    assert "Window" not in plan, plan
    first_exchange = plan.find("Exchange")
    assert first_exchange != -1
    assert "EvalPython" not in plan  # pure JVM end to end


def test_prepare_corpus_pii_scrub(spark):
    rows = [
        (0, BASE + " write to bob@example.com about the offer today ok"),
        (1, BASE + " write to eve@example.org about the offer today ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_corpus(docs, "doc_id", "text", min_quality=0.0,
                         scrub_pii=True).collect()
    # scrubbing runs BEFORE annotation: the two docs become identical
    # (<EMAIL> placeholder) and exact dedup keeps only the smaller id
    assert [r["doc_id"] for r in out] == [0]
    assert "<EMAIL>" in out[0]["text"]
    assert "bob@example.com" not in out[0]["text"]


def test_prepare_corpus_repetition_gate(spark):
    # heavy 2-gram repetition plus enough distinct en filler that the doc
    # passes lang/quality and is NOT a near-dup of BASE (repeated shingles
    # collapse under the distinct-set Jaccard, so the filler must differ)
    repeated = (
        " ".join(["spam ham"] * 20)
        + " the sun and moon were out over a field"
    )
    rows = [(0, BASE), (1, repeated)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base_ids = {r["doc_id"] for r in
                prepare_corpus(docs, "doc_id", "text",
                               min_quality=0.0).collect()}
    assert base_ids == {0, 1}
    gated_ids = {r["doc_id"] for r in
                 prepare_corpus(docs, "doc_id", "text", min_quality=0.0,
                                repetition_gates={"dup_2gram_frac": 0.5},
                                ).collect()}
    assert gated_ids == {0}
    with pytest.raises(ValueError, match="unknown repetition_gates"):
        prepare_corpus(docs, "doc_id", "text",
                       repetition_gates={"nope": 1.0})


def test_prepare_corpus_decontaminate(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    rows = [
        (0, BASE),
        (1, BASE + " plus " + bench_text),  # shares 13-grams with bench
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(bench_text,)], "text string")
    out = {r["doc_id"] for r in
           prepare_corpus(docs, "doc_id", "text", min_quality=0.0,
                          benchmark=bench).collect()}
    assert out == {0}


def test_gate_predicate_matches_annotate_columns(spark, sf_dir):
    """The self-contained language/quality gate (evaluated BEFORE the
    annotate projection, to stop predicate pushdown inlining the whole
    tree) must keep exactly the rows whose annotate COLUMNS satisfy the
    same conditions — sql_lang_pred_case and lang_pred_from_hits may
    never drift."""
    from duckdb_ann_spark.pipeline import annotate_and_gate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    for langs, floor in ((("en",), 0.65), (("en", "es", "zh"), 0.5)):
        kept = annotate_and_gate(docs, "doc_id", "text", langs=langs,
                                 min_quality=floor)
        got = {r["doc_id"] for r in kept.select("doc_id").collect()}
        # reference: annotate EVERYTHING (all languages incl. 'und',
        # floor 0 = gate fully open), then re-filter on the COLUMNS
        allrows = annotate_and_gate(
            docs, "doc_id", "text",
            langs=("en", "es", "de", "fr", "zh", "und"),
            min_quality=0.0,
        )
        want = {
            r["doc_id"]
            for r in allrows.collect()
            if r["lang_pred"] in langs and r["quality_score"] is not None
            and r["quality_score"] >= floor
        }
        assert got == want, (langs, floor, len(got), len(want))
        # every surviving row's columns satisfy the gate it passed
        for r in kept.collect():
            assert r["lang_pred"] in langs
            assert r["quality_score"] >= floor


def test_prepare_corpus_lm_filter(spark, sf_dir):
    """min_avg_logprob adds the unigram-LM gate: output is a subset of
    the unfiltered run, and the dropped docs are exactly those whose
    corpus LM score is below the floor."""
    from duckdb_ann_spark.operators.text_ops import lm_unigram_scores
    from duckdb_ann_spark.pipeline import prepare_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    floor = -7.0
    gated = {r.doc_id for r in
             prepare_corpus(docs, "doc_id", "text", langs=("en",),
                            min_quality=0.65,
                            min_avg_logprob=floor).select("doc_id").collect()}
    # semantics-exact expectation: the LM trains on the RAW corpus and
    # gates rows BEFORE dedup, so the gated pipeline equals the plain
    # pipeline run over the LM-passing subset (every other filter is
    # row-local; dedup then sees exactly that subset). NOT gated<=base:
    # dropping the smaller id of a near-dup pair can let the larger id
    # survive a run where the ungated pipeline dropped it.
    ok = [r.doc_id for r in
          lm_unigram_scores(docs, "doc_id", "text")
          .where(F.col("avg_logprob") >= floor).collect()]
    want = {r.doc_id for r in
            prepare_corpus(docs.where(F.col("doc_id").isin(ok)),
                           "doc_id", "text", langs=("en",),
                           min_quality=0.65).select("doc_id").collect()}
    assert gated == want
    assert len(gated) > 0


def test_prepare_corpus_dedup_against_published(spark, corpus, tmp_path):
    """Round-8: dedup_against drops kept docs colliding with a published
    corpus artifact (incremental corpus prep); without it, output is
    unchanged from the default pipeline."""
    from duckdb_ann_spark.operators.dedup import publish_minhash_signatures

    base_ids = sorted(
        r.doc_id for r in prepare_corpus(
            corpus, "doc_id", "text", langs=("en",), min_quality=0.0
        ).select("doc_id").collect()
    )
    assert base_ids  # pipeline keeps something to test against
    # publish a corpus containing THE text of the first kept doc
    kept_doc = corpus.where(F.col("doc_id") == base_ids[0])
    pub = str(tmp_path / "pub")
    publish_minhash_signatures(
        kept_doc.select(
            (F.col("doc_id") + 50_000_000).alias("doc_id"), "text"
        ),
        "doc_id", "text", pub,
    )
    got = sorted(
        r.doc_id for r in prepare_corpus(
            corpus, "doc_id", "text", langs=("en",), min_quality=0.0,
            dedup_against=pub,
        ).select("doc_id").collect()
    )
    assert base_ids[0] not in got
    assert got == [i for i in base_ids if i != base_ids[0]]
