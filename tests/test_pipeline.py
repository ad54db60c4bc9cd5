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
        (2, BASE + " more words of the story keep going here and here"),
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
    ids = [r["doc_id"] for r in out]
    # 1 and 4 fall to exact dedup (same normalized fingerprint as 0),
    # 3 to the language filter, 5 to near-dedup (larger id of the pair)
    assert ids == [0, 2], ids
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["lang_pred"] == "en"
    assert by_id[0]["n_tokens"] == len(BASE.split())
    assert 0.0 <= by_id[0]["quality_score"] <= 1.0


def test_prepare_corpus_quality_filter(spark, corpus):
    # an impossible floor empties the corpus (and nothing crashes
    # downstream: dedup over zero rows)
    out = prepare_corpus(corpus, "doc_id", "text", min_quality=2.0)
    assert out.count() == 0


def test_prepare_corpus_annotate_is_single_scan(spark, corpus):
    """The annotate+filter prefix must not shuffle: tokenize runs once
    per row inside one projection; the first Exchange in the plan is the
    fingerprint-window hashpartitioning of exact dedup."""
    out = prepare_corpus(corpus, "doc_id", "text", min_quality=0.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("rn") >= 1
    # exactly one tokenize (filter(split(lower(text)))) evaluation per
    # side of the near-dup LSH reuse; the annotate stage contributes ONE
    first_exchange = plan.find("Exchange")
    assert first_exchange != -1
    assert "EvalPython" not in plan  # pure JVM end to end
