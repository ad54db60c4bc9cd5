"""hybrid_search: RRF semantics, degradation, and the suite oracle."""

import pytest
from pyspark.sql import functions as F

from duckdb_ann_spark.functions.text import py_tokenize, tokenize
from duckdb_ann_spark.operators.hybrid import bm25_ranks, hybrid_search


@pytest.fixture(scope="module")
def base(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "embedding"
    )


@pytest.fixture(scope="module")
def qvec(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return [float(x) for x in
            emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]


def test_tokenize_parity(spark):
    df = spark.createDataFrame([("Fast, FAST query-plan 42x!",)], "t string")
    got = df.select(tokenize("t").alias("toks")).head()["toks"]
    assert got == ["fast", "fast", "query", "plan", "42x"]
    assert py_tokenize("Fast, FAST query-plan 42x!") == got


def test_rrf_scores_and_ranks(base, qvec):
    res = hybrid_search(
        base, "doc_id", qvec, "spark join query data", vec_col="embedding", k=10
    ).collect()
    assert len(res) == 10
    # descending scores; both legs represented in the fused top-10
    scores = [r._rrf_score for r in res]
    assert scores == sorted(scores, reverse=True)
    assert any(r._bm25_rank > 0 for r in res)
    assert any(r._vector_rank > 0 for r in res)
    # RRF formula spot check: rank pair (b, v) -> .3/(60+b) + .7/(60+v)
    for r in res:
        want = (0.3 * (1.0 / (60.0 + r._bm25_rank)) if r._bm25_rank > 0 else 0.0) + (
            0.7 * (1.0 / (60.0 + r._vector_rank)) if r._vector_rank > 0 else 0.0
        )
        assert r._rrf_score == pytest.approx(want, rel=1e-12)


def test_vector_only_degradation(base, qvec):
    """Empty/no-token query text → vector-only (ann_search.cpp:1056)."""
    res = hybrid_search(
        base, "doc_id", qvec, "", vec_col="embedding", k=5
    ).collect()
    assert len(res) == 5
    assert all(r._bm25_rank == 0 for r in res)
    assert [r._vector_rank for r in res] == [1, 2, 3, 4, 5]
    assert res[0].doc_id == 0  # self-match leads


def test_weights_shift_ranking(base, qvec):
    text = "spark join query data"
    bm_only = hybrid_search(
        base, "doc_id", qvec, text, vec_col="embedding", k=5,
        bm25_weight=1.0, vector_weight=0.0,
    ).collect()
    # with vector weight 0, ordering follows bm25 ranks
    ranked = [r for r in bm_only if r._rrf_score > 0]
    assert [r._bm25_rank for r in ranked] == sorted(r._bm25_rank for r in ranked)


def test_bm25_ranks_match_text_hits(base):
    """Docs ranked by BM25 must actually contain a query term."""
    ranks = bm25_ranks(base, "doc_id", "text", "customer", candidates=10)
    hits = {r.doc_id for r in ranks.collect()}
    containing = {
        r.doc_id
        for r in base.where(F.col("text").contains("customer")).collect()
    }
    assert hits <= containing and hits


def test_indexed_vector_leg(base, qvec, tmp_path):
    from duckdb_ann_spark.index import Catalog, create_index

    cat = Catalog(str(tmp_path / "idx"))
    create_index(base, "doc_id", "embedding", "hy", engine="faiss", catalog=cat)
    res = hybrid_search(
        base, "doc_id", qvec, "spark join", index="hy", catalog=cat, k=5
    ).collect()
    assert len(res) == 5 and res[0]._rrf_score > 0


def test_text_index_scores_bit_identical(spark, base, tmp_path):
    """Round-8: bm25_scores_indexed over a published postings artifact
    returns BIT-IDENTICAL scores to the full-scan bm25_scores — same
    tf/dl/df/N values through the same JVM expression, corpus text never
    touched at query time."""
    from duckdb_ann_spark.operators.hybrid import (
        bm25_scores,
        bm25_scores_indexed,
        publish_text_index,
    )

    path = str(tmp_path / "ti")
    publish_text_index(base, "doc_id", "text", path)
    for q in ("spark join query data", "the distributed engine", "zzz"):
        scan = {r.doc_id: r._bm25_score
                for r in bm25_scores(base, "doc_id", "text", q).collect()}
        idx = {r.doc_id: r._bm25_score
               for r in bm25_scores_indexed(spark, path, q).collect()}
        assert idx == scan, q  # exact float equality, not approx


def test_hybrid_with_text_index_matches_scan(spark, base, qvec, tmp_path):
    """hybrid_search(text_index=...) returns exactly the scan-path
    result (ranks, scores, row order)."""
    from duckdb_ann_spark.operators.hybrid import publish_text_index

    path = str(tmp_path / "ti2")
    publish_text_index(base, "doc_id", "text", path)
    kw = dict(text_col="text", vec_col="embedding", k=8)
    a = hybrid_search(base, "doc_id", qvec, "spark join query data",
                      **kw).collect()
    b = hybrid_search(base, "doc_id", qvec, "spark join query data",
                      text_index=path, **kw).collect()
    assert a == b
    # empty-text degradation holds on the indexed path too
    v = hybrid_search(base, "doc_id", qvec, "", text_index=path,
                      **kw).collect()
    assert all(r._bm25_rank == 0 for r in v)


def test_hybrid_text_index_result_carries_caches(spark, base, qvec, tmp_path):
    """The persisted pruned-postings slice rides hybrid_search's OWN
    return value (round-9 advice): release_caches on what the caller
    holds must free it — not only the global sweep."""
    from duckdb_ann_spark.caching import release_caches
    from duckdb_ann_spark.operators.hybrid import publish_text_index

    path = str(tmp_path / "ti4")
    publish_text_index(base, "doc_id", "text", path)
    out = hybrid_search(
        base, "doc_id", qvec, "spark join query data", text_col="text",
        vec_col="embedding", k=5, text_index=path,
    )
    out.count()
    assert release_caches(out) >= 1
    assert release_caches(out) == 0  # idempotent


def test_text_index_manifest_validation(spark, base, tmp_path):
    import shutil

    from duckdb_ann_spark.operators.hybrid import (
        bm25_scores_indexed,
        publish_text_index,
    )

    path = str(tmp_path / "ti3")
    publish_text_index(base, "doc_id", "text", path)
    shutil.rmtree(f"{path}/manifest")
    with pytest.raises(ValueError, match="missing manifest"):
        bm25_scores_indexed(spark, path, "spark data").collect()
