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


def test_text_index_delta_bit_identical_to_full_republish(
    spark, base, tmp_path
):
    """publish_text_index_delta(base_half, delta_half) scores
    BIT-identically to a full republish over the union — per-posting
    values are corpus-independent, df counts union exactly, stats sums
    are exact integer-valued doubles."""
    from pyspark.sql import functions as F

    from duckdb_ann_spark.operators.hybrid import (
        bm25_scores_indexed,
        publish_text_index,
        publish_text_index_delta,
    )

    half_a = base.where(F.col("doc_id") % 2 == 0)
    half_b = base.where(F.col("doc_id") % 2 == 1)
    p_base = str(tmp_path / "tid_base")
    p_merged = str(tmp_path / "tid_merged")
    p_full = str(tmp_path / "tid_full")
    publish_text_index(half_a, "doc_id", "text", p_base)
    publish_text_index_delta(spark, p_base, half_b, "text", p_merged)
    publish_text_index(base, "doc_id", "text", p_full)
    for q in ("spark join query data", "the data", "spark"):
        merged = {r.doc_id: r._bm25_score
                  for r in bm25_scores_indexed(spark, p_merged, q).collect()}
        full = {r.doc_id: r._bm25_score
                for r in bm25_scores_indexed(spark, p_full, q).collect()}
        assert merged == full, q  # exact float equality

    # chaining: merged artifact is a valid base for the NEXT delta
    extra = base.limit(0)  # empty delta is legal and a no-op
    p_chain = str(tmp_path / "tid_chain")
    publish_text_index_delta(spark, p_merged, extra, "text", p_chain)
    q = "spark data"
    assert (
        {r.doc_id: r._bm25_score
         for r in bm25_scores_indexed(spark, p_chain, q).collect()}
        == {r.doc_id: r._bm25_score
            for r in bm25_scores_indexed(spark, p_full, q).collect()}
    )


def test_text_index_delta_validation(spark, base, tmp_path):
    import pytest as _pytest

    from duckdb_ann_spark.operators.hybrid import (
        publish_text_index,
        publish_text_index_delta,
    )

    p_base = str(tmp_path / "tv_base")
    publish_text_index(base.limit(50), "doc_id", "text", p_base)
    # overlapping ids fail loud
    with _pytest.raises(ValueError, match="overlap"):
        publish_text_index_delta(
            spark, p_base, base.limit(10), "text", str(tmp_path / "tv_out")
        )
    # in-place merge refused
    with _pytest.raises(ValueError, match="must differ"):
        publish_text_index_delta(spark, p_base, base.limit(0), "text", p_base)
    # missing id column
    with _pytest.raises(ValueError, match="id column"):
        publish_text_index_delta(
            spark, p_base, base.select("text"), "text",
            str(tmp_path / "tv_out2"),
        )
    # a SYMLINKED spelling of the base dir is still an in-place merge
    # (round-10 advice: abspath strings let symlinks evade the guard)
    link = str(tmp_path / "tv_link")
    import os as _os

    _os.symlink(p_base, link)
    with _pytest.raises(ValueError, match="must differ"):
        publish_text_index_delta(spark, p_base, base.limit(0), "text", link)


def test_blockmax_bit_identical_and_prunes(spark, tmp_path):
    """Round-11 deliverable (r10 verdict item 6): the block-max text
    leg is BIT-IDENTICAL to the full exact join on ranks <=
    bm25_candidates — scores, docs and order — while provably bounding
    the candidate intermediate on a stop-word workload. Covers both
    pruning regimes (short rare term dominates θ → head term fully
    pruned; single long term → impact-ordered prefix), plus the
    require/off switch contract."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from duckdb_ann_spark.operators.hybrid import (
        _blockmax_hits,
        hybrid_search_table,
        publish_text_index,
    )

    rng = np.random.default_rng(5)
    n = 12_000
    # "head" in ~90% of docs with varying tf (df ~10.8k >
    # BLOCK_SHORT_DF -> LONG); uniform tail terms (df ~30, short);
    # 40 rare markers r0..r39 (df 300, short)
    texts = []
    for i in range(n):
        toks = ["head"] * int(rng.integers(1, 5)) if rng.random() < 0.9 else []
        toks += [f"t{rng.integers(0, 3000)}" for _ in range(6 + int(rng.integers(0, 6)))]
        if i % 40 < 39:
            toks.append(f"r{i % 40}")
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(n),
        "text": texts,
        "embedding": list(rng.random((n, 8), dtype=np.float32)),
    })).persist()
    path = str(tmp_path / "bm_ti")
    publish_text_index(docs, "doc_id", "text", path)
    blocks = spark.read.parquet(f"{path}/blocks")
    assert blocks.count() > 0
    # 20 rare+head queries (rare df=300 >= C -> θ high, head pruned
    # outright) + 10 head-only queries (prefix pruning)
    qdf = spark.createDataFrame(pd.DataFrame({
        "qid": np.arange(30),
        "qv": list(rng.random((30, 8), dtype=np.float32)),
        "qtext": [
            f"head r{q % 20}" if q < 20 else "head" for q in range(30)
        ],
    }))
    kw = dict(
        text_index=path, docs=docs, doc_id_col="doc_id",
        vec_col="embedding", k=15, bm25_candidates=20,
        method="exact",
    )
    out_w = hybrid_search_table(
        qdf, "qid", "qv", "qtext", use_blockmax=True, **kw
    ).collect()
    out_e = hybrid_search_table(
        qdf, "qid", "qv", "qtext", use_blockmax=False, **kw
    ).collect()
    key = lambda rows: sorted(
        (r["qid"], r["doc_id"], round(r["_rrf_score"], 12),
         r["_bm25_rank"], r["_vector_rank"]) for r in rows
    )
    assert key(out_w) == key(out_e)
    assert len(out_w) == 30 * 15

    # the bounding is real: the candidate hit rows are a small
    # fraction of the exact per-(query, posting) intermediate
    from pyspark.sql import functions as F

    qterms = qdf.select(
        "qid", F.explode(F.split("qtext", " ")).alias("term")
    )
    post = spark.read.parquet(f"{path}/postings")
    hits_w = _blockmax_hits(
        spark, path, qterms, post, "qid", "doc_id", 20
    ).count()
    hits_e = (
        qterms.join(
            post.groupBy("term").agg(F.count(F.lit(1)).alias("_c")),
            on="term",
        ).agg(F.sum("_c")).head()[0]
    )
    assert hits_w < 0.1 * hits_e, (hits_w, hits_e)

    # round 12 (r11 verdict item 2): the SINGLE-query indexed path rides
    # the same candidate bounding — every returned score bit-identical
    # to the full path, identical top-n_candidates, and the head-term
    # pivot input measurably bounded
    from duckdb_ann_spark.caching import release_caches
    from duckdb_ann_spark.operators.hybrid import bm25_scores_indexed

    full_df = bm25_scores_indexed(spark, path, "head r3")
    pruned_df = bm25_scores_indexed(
        spark, path, "head r3", n_candidates=20, use_blockmax=True
    )
    full = {r["doc_id"]: r["_bm25_score"] for r in full_df.collect()}
    pruned = {r["doc_id"]: r["_bm25_score"] for r in pruned_df.collect()}
    assert pruned and all(full[d] == s for d, s in pruned.items())
    top = lambda m: sorted((-s, d) for d, s in m.items())[:20]
    assert top(pruned) == top(full)
    assert len(pruned) < 0.2 * len(full), (len(pruned), len(full))
    release_caches(full_df)
    release_caches(pruned_df)

    # require-switch fails loud on a pre-round-11 artifact (no blocks)
    import shutil

    shutil.rmtree(f"{path}/blocks")
    with _pytest.raises(ValueError, match="no block summaries"):
        hybrid_search_table(
            qdf, "qid", "qv", "qtext", use_blockmax=True, **kw
        ).collect()
    with _pytest.raises(ValueError, match="no block summaries"):
        bm25_scores_indexed(
            spark, path, "head", n_candidates=5, use_blockmax=True
        )
    # and auto mode silently falls back to the exact join
    out_f = hybrid_search_table(qdf, "qid", "qv", "qtext", **kw).collect()
    assert key(out_f) == key(out_e)
    docs.unpersist()


def test_text_index_census_catches_tokenless_id_collision(
    spark, base, tmp_path
):
    """Round-11 deliverable (r10 verdict item 7 / advice corner): a
    base document with ZERO tokens has no postings rows — the doc
    census (`docs/`) still records it, so a delta reusing its id fails
    loud instead of silently double-counting n_docs; and the census
    survives a delta chain (validation keeps working on the output)."""
    import pandas as pd
    import pytest as _pytest

    from duckdb_ann_spark.operators.hybrid import (
        publish_text_index,
        publish_text_index_delta,
    )

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta", "", "gamma delta alpha"],
    }))
    p_base = str(tmp_path / "cz_base")
    publish_text_index(docs, "doc_id", "text", p_base)
    # the census covers the token-less doc 2
    census = spark.read.parquet(f"{p_base}/docs").toPandas()
    assert sorted(census["doc_id"].tolist()) == [1, 2, 3]
    assert census.set_index("doc_id")["dl"][2] == 0.0
    # a delta colliding with ONLY the token-less id is caught
    bad = spark.createDataFrame(pd.DataFrame({
        "doc_id": [2], "text": ["epsilon"],
    }))
    with _pytest.raises(ValueError, match="overlap"):
        publish_text_index_delta(
            spark, p_base, bad, "text", str(tmp_path / "cz_out")
        )
    # a disjoint delta (with its own token-less doc) merges, and the
    # OUTPUT census covers base + delta including both empty docs
    ok = spark.createDataFrame(pd.DataFrame({
        "doc_id": [4, 5], "text": ["zeta", ""],
    }))
    p_out = str(tmp_path / "cz_out2")
    publish_text_index_delta(spark, p_base, ok, "text", p_out)
    c2 = spark.read.parquet(f"{p_out}/docs").toPandas()
    assert sorted(c2["doc_id"].tolist()) == [1, 2, 3, 4, 5]
    with _pytest.raises(ValueError, match="overlap"):
        publish_text_index_delta(
            spark, p_out,
            spark.createDataFrame(pd.DataFrame({
                "doc_id": [5], "text": ["eta"],
            })),
            "text", str(tmp_path / "cz_out3"),
        )


def test_text_index_three_delta_chain_bit_identical(spark, base, tmp_path):
    """Chaos item (round 10): THREE chained deltas produce postings,
    stats and scores bit-identical to one full publish over the union —
    the chain contract holds transitively, not just for one hop."""
    from pyspark.sql import functions as F

    from duckdb_ann_spark.operators.hybrid import (
        _load_text_index,
        bm25_scores_indexed,
        publish_text_index,
        publish_text_index_delta,
    )

    quarters = [base.where(F.col("doc_id") % 4 == i) for i in range(4)]
    paths = [str(tmp_path / f"chain_{i}") for i in range(4)]
    p_full = str(tmp_path / "chain_full")
    publish_text_index(quarters[0], "doc_id", "text", paths[0])
    for i in (1, 2, 3):
        publish_text_index_delta(
            spark, paths[i - 1], quarters[i], "text", paths[i]
        )
    publish_text_index(base, "doc_id", "text", p_full)
    # stats rows identical (exact integer-valued doubles)
    _, _, nd_c, tt_c = _load_text_index(spark, paths[3])
    _, _, nd_f, tt_f = _load_text_index(spark, p_full)
    assert (nd_c, tt_c) == (nd_f, tt_f)
    # postings content identical (term, id, tf, dl multisets)
    chain_p = spark.read.parquet(f"{paths[3]}/postings")
    full_p = spark.read.parquet(f"{p_full}/postings")
    assert chain_p.exceptAll(full_p).count() == 0
    assert full_p.exceptAll(chain_p).count() == 0
    # and scores, exactly
    for q in ("spark join query data", "the data", "spark"):
        got = {r.doc_id: r._bm25_score
               for r in bm25_scores_indexed(spark, paths[3], q).collect()}
        want = {r.doc_id: r._bm25_score
                for r in bm25_scores_indexed(spark, p_full, q).collect()}
        assert got == want, q


def test_text_index_torn_publish_fails_loud_base_readable(
    spark, base, tmp_path
):
    """Chaos item (round 10): an interrupted publish — the commit
    marker cleared but the final write never happened (exactly the
    intermediate state `_publish_postings` passes through) — is
    detected loudly by every reader AND by a chained delta, while the
    base artifact it was derived from stays fully readable."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from duckdb_ann_spark.local import local_df
    from duckdb_ann_spark.operators.hybrid import (
        bm25_scores_indexed,
        publish_text_index,
        publish_text_index_delta,
    )

    p_base = str(tmp_path / "torn_base")
    p_out = str(tmp_path / "torn_out")
    half_a = base.where(F.col("doc_id") % 2 == 0)
    half_b = base.where(F.col("doc_id") % 2 == 1)
    publish_text_index(half_a, "doc_id", "text", p_base)
    publish_text_index_delta(spark, p_base, half_b, "text", p_out)
    # simulate the torn state: marker cleared, nothing re-committed
    local_df(spark, [], "version int, id_col string").write.mode(
        "overwrite"
    ).parquet(f"{p_out}/manifest")
    with _pytest.raises(ValueError, match="uncommitted|not a committed"):
        bm25_scores_indexed(spark, p_out, "spark")
    with _pytest.raises(ValueError, match="uncommitted|not a committed"):
        publish_text_index_delta(
            spark, p_out, base.limit(0), "text", str(tmp_path / "torn_next")
        )
    # a path with no manifest at all is equally loud
    with _pytest.raises(ValueError, match="not a committed"):
        bm25_scores_indexed(spark, str(tmp_path / "never_published"), "spark")
    # the base is untouched and fully readable
    assert bm25_scores_indexed(spark, p_base, "spark").count() > 0
    # re-running the delta publish over the torn output REPAIRS it
    # (overwrite semantics — the commit marker is written last)
    publish_text_index_delta(spark, p_base, half_b, "text", p_out)
    assert bm25_scores_indexed(spark, p_out, "spark").count() > 0


def test_hybrid_search_table_max_term_df(spark, tmp_path):
    """max_term_df (round 10): stop-word-like query terms are excluded
    from the text leg BEFORE the postings join — docs matching only the
    capped term lose their bm25 rank, docs matching a surviving term
    keep theirs, and the default (None) stays exact."""
    import pandas as pd
    from pyspark.sql import functions as F

    from duckdb_ann_spark.operators.hybrid import (
        hybrid_search_table,
        publish_text_index,
    )

    n = 40
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(n),
        # every doc has 'common'; only doc_id < 4 have 'rare'
        "text": ["common rare" if i < 4 else "common filler"
                 for i in range(n)],
        "embedding": [[float(i), float(i)] for i in range(n)],
    }))
    ti = str(tmp_path / "cap_ti")
    publish_text_index(docs, "doc_id", "text", ti)
    qdf = spark.createDataFrame(pd.DataFrame({
        "qid": [0], "qv": [[0.0, 0.0]], "qtext": ["common rare"],
    }))
    kw = dict(text_index=ti, docs=docs, doc_id_col="doc_id",
              vec_col="embedding", k=n, vector_candidates=5,
              bm25_candidates=n, method="exact")
    exact = hybrid_search_table(qdf, "qid", "qv", "qtext", **kw).collect()
    capped = hybrid_search_table(
        qdf, "qid", "qv", "qtext", max_term_df=10, **kw
    ).collect()
    # exact: every doc matches 'common' -> all n docs bm25-ranked
    assert sum(1 for r in exact if r["_bm25_rank"] > 0) == n
    # capped (df('common')=40 > 10): only the 4 'rare' docs keep a text
    # rank, and their df/score reflect the TRUE corpus df of 'rare'
    got_text = {r["doc_id"] for r in capped if r["_bm25_rank"] > 0}
    assert got_text == {0, 1, 2, 3}, got_text
    # vector leg identical in both runs
    assert ({(r["doc_id"], r["_vector_rank"]) for r in exact
             if r["_vector_rank"] > 0}
            == {(r["doc_id"], r["_vector_rank"]) for r in capped
                if r["_vector_rank"] > 0})


def test_norm_index_path_uris():
    """URI-schemed paths normalize without abspath mangling; local
    paths resolve symlinks."""
    from duckdb_ann_spark.operators.hybrid import _norm_index_path

    assert _norm_index_path("s3://bucket/idx/") == "s3://bucket/idx"
    assert _norm_index_path("hdfs://nn:8020/a") == "hdfs://nn:8020/a"
    # the scheme's double slash survives (abspath would collapse it)
    assert "://" in _norm_index_path("s3://bucket/idx")
    # file:// IS a local path (round-10 review): a file:// spelling of
    # a plain path must compare equal, or it evades the in-place guard
    assert _norm_index_path("file:///data/ti") == _norm_index_path("/data/ti")
    assert _norm_index_path("FILE:///data/ti/") == _norm_index_path("/data/ti")


def test_hybrid_search_table_rejects_non_integral_qid(spark, base, tmp_path):
    """Both vector paths fail loud on a string query id (round-10
    advice: the brute-force path used to NULL-collapse silently)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from duckdb_ann_spark.operators.hybrid import (
        hybrid_search_table,
        publish_text_index,
    )

    ti = str(tmp_path / "qid_ti")
    publish_text_index(base.limit(50), "doc_id", "text", ti)
    qdf = base.limit(2).select(
        F.col("doc_id").cast("string").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("text").alias("qtext"),
    )
    with _pytest.raises(ValueError, match="integral"):
        hybrid_search_table(
            qdf, "qid", "qv", "qtext", text_index=ti, docs=base,
            doc_id_col="doc_id", vec_col="embedding", k=3,
        )


def test_hybrid_search_table_matches_per_query(spark, base, tmp_path):
    """The unbounded-queries path returns, per query, exactly the ranks
    and RRF scores the single-query hybrid_search computes (same
    _term_score arithmetic via the published artifact, same exact
    vector leg, same tie-breaks)."""
    from pyspark.sql import functions as F

    from duckdb_ann_spark.operators.hybrid import (
        hybrid_search_table,
        publish_text_index,
    )

    ti = str(tmp_path / "hst_ti")
    publish_text_index(base, "doc_id", "text", ti)
    texts = {3: "spark join query data", 7: "the data", 11: ""}
    qrows = base.where(F.col("doc_id").isin(list(texts))).select(
        F.col("doc_id").alias("qid"), F.col("embedding").alias("qv")
    )
    qdf = qrows.withColumn(
        "qtext",
        F.when(F.col("qid") == 3, texts[3])
        .when(F.col("qid") == 7, texts[7])
        .otherwise(""),
    )
    got = hybrid_search_table(
        qdf, "qid", "qv", "qtext", text_index=ti, docs=base,
        doc_id_col="doc_id", vec_col="embedding", k=8, method="exact",
    )
    by_q: dict[int, list] = {}
    for r in got.orderBy("qid", F.desc("_rrf_score"), "doc_id").collect():
        by_q.setdefault(r["qid"], []).append(
            (r["doc_id"], r["_rrf_score"], r["_bm25_rank"], r["_vector_rank"])
        )
    for qid, qtext in texts.items():
        qvec = [
            float(x)
            for x in base.where(F.col("doc_id") == qid).head()["embedding"]
        ]
        want = [
            (r["doc_id"], r["_rrf_score"], r["_bm25_rank"], r["_vector_rank"])
            for r in hybrid_search(
                base, "doc_id", qvec, qtext, text_col="text",
                vec_col="embedding", k=8, text_index=ti,
            ).collect()
        ]
        assert by_q[qid] == want, qid  # exact float equality per query
    # empty-text query degraded to vector-only
    assert all(t[2] == 0 for t in by_q[11])


def test_hybrid_search_table_through_index(spark, base, tmp_path):
    """Vector leg through a real index's DataFrame-queries path: every
    query's own document ranks first (self-match), k rows per query."""
    from pyspark.sql import functions as F

    from duckdb_ann_spark.index import Catalog, create_index
    from duckdb_ann_spark.operators.hybrid import (
        hybrid_search_table,
        publish_text_index,
    )

    ti = str(tmp_path / "hsti_ti")
    publish_text_index(base, "doc_id", "text", ti)
    cat = Catalog(str(tmp_path / "hsti_cat"))
    create_index(
        base, "doc_id", "embedding", "hsti", engine="faiss", type="Flat",
        catalog=cat,
    )
    qdf = base.where(F.col("doc_id") < 12).select(
        F.col("doc_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.lit("data").alias("qtext"),
    )
    out = hybrid_search_table(
        qdf, "qid", "qv", "qtext", text_index=ti, index="hsti", k=5,
        catalog=cat,
    ).collect()
    per_q: dict[int, int] = {}
    for r in out:
        per_q[r["qid"]] = per_q.get(r["qid"], 0) + 1
        if r["doc_id"] == r["qid"]:
            assert r["_vector_rank"] == 1, r  # self-match
    assert set(per_q) == set(range(12)) and all(
        v == 5 for v in per_q.values()
    )
    # round-11: target_recall forwards to the vector leg — Flat
    # satisfies any target by construction, identical output
    out_tr = hybrid_search_table(
        qdf, "qid", "qv", "qtext", text_index=ti, index="hsti", k=5,
        catalog=cat, target_recall=0.99,
    ).collect()
    key = lambda rows: sorted((r["qid"], r["doc_id"]) for r in rows)
    assert key(out_tr) == key(out)
    # the docs-based exact leg takes the same knob (range-validated)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="in \\(0, 1\\]"):
        hybrid_search_table(
            qdf, "qid", "qv", "qtext", text_index=ti, docs=base,
            doc_id_col="doc_id", vec_col="embedding", k=5,
            target_recall=1.5,
        )


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


def test_hybrid_search_table_id_collision_both_legs(spark, base, tmp_path):
    """Round-9 review regressions: (1) a vector INDEX whose id column is
    the query id name made index_search_table's _q_ rename pick swapped
    keys; (2) the text leg's post-join rename hit BOTH same-named
    columns and dropped the query id. Contract now: the doc side comes
    back as `_doc_<name>`, and results equal the collision-free run
    modulo column names."""
    from pyspark.sql import functions as F

    from duckdb_ann_spark.index import Catalog, create_index
    from duckdb_ann_spark.operators.hybrid import (
        hybrid_search_table,
        publish_text_index,
    )

    texts = {3: "spark join query data", 7: "the data"}
    qdf = base.where(F.col("doc_id").isin(list(texts))).select(
        F.col("doc_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.when(F.col("doc_id") == 3, texts[3]).otherwise(texts[7])
        .alias("qtext"),
    )
    # baseline: no collisions anywhere (artifact + docs keyed doc_id)
    ti = str(tmp_path / "col_ti")
    publish_text_index(base, "doc_id", "text", ti)
    want = {
        (r["qid"], r["doc_id"]): (r["_rrf_score"], r["_bm25_rank"],
                                  r["_vector_rank"])
        for r in hybrid_search_table(
            qdf, "qid", "qv", "qtext", text_index=ti, docs=base,
            doc_id_col="doc_id", vec_col="embedding", k=8, method="exact",
        ).collect()
    }

    # text artifact AND brute-force docs keyed 'qid' (collides with the
    # query id): doc side must come back as _doc_qid, values identical
    base_q = base.select(
        F.col("doc_id").alias("qid"), "text", "embedding"
    )
    ti_q = str(tmp_path / "col_ti_q")
    publish_text_index(base_q, "qid", "text", ti_q)
    got_df = hybrid_search_table(
        qdf, "qid", "qv", "qtext", text_index=ti_q, docs=base_q,
        doc_id_col="qid", vec_col="embedding", k=8, method="exact",
    )
    assert "_doc_qid" in got_df.columns
    got = {
        (r["qid"], r["_doc_qid"]): (r["_rrf_score"], r["_bm25_rank"],
                                    r["_vector_rank"])
        for r in got_df.collect()
    }
    assert got == want

    # vector leg through an INDEX whose id column is the query id name
    cat = Catalog(str(tmp_path / "col_cat"))
    create_index(
        base_q, "qid", "embedding", "col_idx", engine="faiss", type="Flat",
        catalog=cat,
    )
    out = hybrid_search_table(
        qdf, "qid", "qv", "qtext", text_index=ti_q, index="col_idx",
        k=8, catalog=cat,
    )
    assert "_doc_qid" in out.columns
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q[r["qid"]] = per_q.get(r["qid"], 0) + 1
        if r["_doc_qid"] == r["qid"]:
            # the query's own document must be its top vector hit —
            # swapped keys would scatter this
            assert r["_vector_rank"] == 1, dict(r.asDict())
    assert set(per_q) == set(texts) and all(v == 8 for v in per_q.values())


def test_blockmax_cost_gate(spark, base, tmp_path, monkeypatch):
    """Round 13 (r12 verdict item 1): with use_blockmax=None the
    single-query prune only engages when the query's posting mass
    clears max(64*n_candidates, BLOCKMAX_MIN_POSTINGS) — at sf-scale
    corpora the ~1.3s fixed plan overhead has nothing to prune
    (r12's hybrid_indexed_sf doubled). use_blockmax=True bypasses the
    gate; scores are bit-identical on every path."""
    import duckdb_ann_spark.operators.hybrid as hy

    path = str(tmp_path / "ti_gate")
    hy.publish_text_index(base, "doc_id", "text", path)

    calls = []
    orig = hy._blockmax_candidates

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(hy, "_blockmax_candidates", spy)
    q = "spark join query data"
    full = {r.doc_id: r._bm25_score
            for r in hy.bm25_scores_indexed(spark, path, q).collect()}

    # auto: the small corpus is far below the posting floor -> full path
    auto = {r.doc_id: r._bm25_score
            for r in hy.bm25_scores_indexed(
                spark, path, q, n_candidates=10).collect()}
    assert not calls
    assert auto == full

    # explicit True bypasses the gate
    pruned_df = hy.bm25_scores_indexed(
        spark, path, q, n_candidates=10, use_blockmax=True
    )
    pruned = {r.doc_id: r._bm25_score for r in pruned_df.collect()}
    assert calls
    top = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert all(pruned.get(d) == s for d, s in top)

    # the gate is ARITHMETIC, not a hardcoded off-switch: drop the
    # floor and the same auto call engages (sum(df) >= 64*1 here)
    calls.clear()
    monkeypatch.setattr(hy, "BLOCKMAX_MIN_POSTINGS", 1)
    gated_on = {r.doc_id: r._bm25_score
                for r in hy.bm25_scores_indexed(
                    spark, path, q, n_candidates=1).collect()}
    assert calls
    best = min(full.items(), key=lambda kv: (-kv[1], kv[0]))
    assert gated_on.get(best[0]) == best[1]
