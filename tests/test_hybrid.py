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
