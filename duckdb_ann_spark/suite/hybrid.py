"""Driver query: `hybrid_search` (BM25 + RRF, SURVEY §2.1).

The oracle re-implements the whole pipeline in DuckDB SQL with the exact
same expression shapes (tokenization regex, Okapi BM25 with per-doc
term-ordered sequential fold, rank-1-best with id tie-break, RRF with
K=60 and bm25-then-vector summation), so the result hash-matches
bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.text import sql_tokenize
from ..operators.hybrid import hybrid_search
from ..oracle import sql_index_distance
from . import register
from .vector import query_vec

QUERY_TEXT = "spark join query data"
_QTERMS = "['data', 'join', 'query', 'spark']"
_TOK = sql_tokenize("d.text")
_DIST = sql_index_distance("l2", "e.embedding", "q.qv")

_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
base AS (
    -- the spark entry's corpus is documents JOIN embeddings (the BM25
    -- constants N/avgdl/df must come from the same joined set; at
    -- sf0.1 embeddings has fewer rows than documents, so scoring the
    -- full documents table diverges)
    SELECT d.doc_id, d.text
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
toks AS (
    SELECT d.doc_id, unnest({_TOK}) AS term FROM base d
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
consts AS (
    SELECT (SELECT count(*) FROM base) AS n_docs,
           (SELECT count(*) FROM toks) AS total_tokens
),
qterms AS (SELECT unnest({_QTERMS}) AS term),
tf AS (
    SELECT t.doc_id, t.term, count(*) AS tf
    FROM toks t JOIN qterms USING (term)
    GROUP BY t.doc_id, t.term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scores AS (
    SELECT tf.doc_id, tf.term,
        ((floor(ln(1.0 + ((CAST(c.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5)
                   / (CAST(dfreq.df AS DOUBLE) + 0.5))) * 1e9) / 1e9)
         * (CAST(tf.tf AS DOUBLE) * 2.2))
        / (CAST(tf.tf AS DOUBLE)
           + 1.2 * (0.25 + (0.75 * CAST(dl.dl AS DOUBLE))
                           / (CAST(c.total_tokens AS DOUBLE)
                              / CAST(c.n_docs AS DOUBLE)))) AS s
    FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN consts c
),
bm AS (
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(s ORDER BY term)),
                       (acc, v) -> acc + v) AS _bm25_score
    FROM scores GROUP BY doc_id
),
bmr AS (
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY _bm25_score DESC, doc_id) AS INT)
               AS _bm25_rank
    FROM bm
    QUALIFY _bm25_rank <= 50
),
vr AS (
    -- vector ranks over the SAME joined corpus as the entry (mirror of
    -- the BM25 corpus fix: 'FROM embeddings' unjoined only agrees while
    -- every vec_id has a matching doc_id)
    SELECT vec_id AS doc_id,
           CAST(row_number() OVER (ORDER BY _d, vec_id) AS INT) AS _vector_rank
    FROM (
        SELECT e.vec_id, {_DIST} AS _d
        FROM embeddings e JOIN base bs ON e.vec_id = bs.doc_id CROSS JOIN q
    )
    QUALIFY _vector_rank <= 50
),
fused AS (
    SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
           COALESCE(b._bm25_rank, 0) AS _bm25_rank,
           COALESCE(v._vector_rank, 0) AS _vector_rank
    FROM bmr b FULL OUTER JOIN vr v ON b.doc_id = v.doc_id
)
SELECT doc_id, _rrf_score, _bm25_rank, _vector_rank FROM (
    SELECT doc_id, _bm25_rank, _vector_rank,
        (CASE WHEN _bm25_rank > 0
              THEN 0.3 * (1.0 / (60.0 + CAST(_bm25_rank AS DOUBLE)))
              ELSE 0.0 END)
      + (CASE WHEN _vector_rank > 0
              THEN 0.7 * (1.0 / (60.0 + CAST(_vector_rank AS DOUBLE)))
              ELSE 0.0 END) AS _rrf_score
    FROM fused
)
ORDER BY _rrf_score DESC, doc_id LIMIT 10
"""


def _hybrid_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "embedding"
    )


_ORACLE_VECTOR_ONLY = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
vr AS (
    -- rank over the documents-joined corpus like the entry (an unjoined
    -- 'FROM embeddings' only agrees while every vec_id has a matching
    -- doc_id — same corpus fix the fused oracle carries)
    SELECT vec_id AS doc_id,
           CAST(row_number() OVER (ORDER BY _d, vec_id) AS INT) AS _vector_rank
    FROM (
        SELECT e.vec_id, {_DIST} AS _d
        FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
        CROSS JOIN q
    )
    QUALIFY _vector_rank <= 50
)
SELECT doc_id,
       0.7 * (1.0 / (60.0 + CAST(_vector_rank AS DOUBLE))) AS _rrf_score,
       CAST(0 AS INT) AS _bm25_rank,
       _vector_rank
FROM vr
ORDER BY _rrf_score DESC, doc_id LIMIT 10
"""


# round-9 `table:<qid>` legs: hybrid_search_table — the unbounded-query
# DataFrame path (per-query BM25 through the published postings + exact
# vector ranks + per-query RRF) — re-expressed per query in SQL. The
# CASE mapping qid → text MUST stay in lockstep with the Spark entry's.
_TABLE_QIDS = "(0, 7, 13)"
_TABLE_CASE = (
    "CASE e.vec_id WHEN 0 THEN 'spark join query data' "
    "WHEN 7 THEN 'data' ELSE '' END"
)
_QTOK = sql_tokenize("q.qtext")

_ORACLE_TABLE = f"""
WITH queries AS (
    -- joined to documents so the query set matches the Spark entry's
    -- (which draws queries from the documents JOIN embeddings corpus)
    SELECT e.vec_id AS qid, e.embedding AS qv, {_TABLE_CASE} AS qtext
    FROM embeddings e JOIN documents dq ON e.vec_id = dq.doc_id
    WHERE e.vec_id IN {_TABLE_QIDS}
),
base AS (
    SELECT d.doc_id, d.text
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
toks AS (SELECT d.doc_id, unnest({_TOK}) AS term FROM base d),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
consts AS (
    SELECT (SELECT count(*) FROM base) AS n_docs,
           (SELECT count(*) FROM toks) AS total_tokens
),
qt AS (SELECT q.qid, unnest(list_distinct({_QTOK})) AS term FROM queries q),
tf AS (
    SELECT t.doc_id, t.term, count(*) AS tf
    FROM toks t JOIN (SELECT DISTINCT term FROM qt) s USING (term)
    GROUP BY t.doc_id, t.term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scores AS (
    SELECT q.qid, tf.doc_id, tf.term,
        ((floor(ln(1.0 + ((CAST(c.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5)
                   / (CAST(dfreq.df AS DOUBLE) + 0.5))) * 1e9) / 1e9)
         * (CAST(tf.tf AS DOUBLE) * 2.2))
        / (CAST(tf.tf AS DOUBLE)
           + 1.2 * (0.25 + (0.75 * CAST(dl.dl AS DOUBLE))
                           / (CAST(c.total_tokens AS DOUBLE)
                              / CAST(c.n_docs AS DOUBLE)))) AS s
    FROM qt q JOIN tf USING (term) JOIN dfreq USING (term)
    JOIN dl USING (doc_id) CROSS JOIN consts c
),
bm AS (
    SELECT qid, doc_id,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(s ORDER BY term)),
                       (acc, v) -> acc + v) AS _bm25_score
    FROM scores GROUP BY qid, doc_id
),
bmr AS (
    SELECT qid, doc_id,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY _bm25_score DESC, doc_id) AS INT)
               AS _bm25_rank
    FROM bm
    QUALIFY _bm25_rank <= 50
),
vr AS (
    SELECT qid, doc_id,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY _d, doc_id) AS INT) AS _vector_rank
    FROM (
        SELECT q.qid, e.vec_id AS doc_id, {_DIST} AS _d
        FROM embeddings e JOIN base bs ON e.vec_id = bs.doc_id
        CROSS JOIN queries q
    )
    QUALIFY _vector_rank <= 50
),
fused AS (
    SELECT COALESCE(b.qid, v.qid) AS qid,
           COALESCE(b.doc_id, v.doc_id) AS doc_id,
           COALESCE(b._bm25_rank, 0) AS _bm25_rank,
           COALESCE(v._vector_rank, 0) AS _vector_rank
    FROM bmr b FULL OUTER JOIN vr v
      ON b.qid = v.qid AND b.doc_id = v.doc_id
)
SELECT 'table:' || CAST(qid AS VARCHAR) AS mode,
       doc_id, _rrf_score, _bm25_rank, _vector_rank
FROM (
    SELECT qid, doc_id, _bm25_rank, _vector_rank,
        (CASE WHEN _bm25_rank > 0
              THEN 0.3 * (1.0 / (60.0 + CAST(_bm25_rank AS DOUBLE)))
              ELSE 0.0 END)
      + (CASE WHEN _vector_rank > 0
              THEN 0.7 * (1.0 / (60.0 + CAST(_vector_rank AS DOUBLE)))
              ELSE 0.0 END) AS _rrf_score
    FROM fused
)
QUALIFY row_number() OVER (
    PARTITION BY qid ORDER BY _rrf_score DESC, doc_id) <= 10
"""

_ORACLE_FUSED = (
    "SELECT * FROM (\n"
    "    SELECT 'fused' AS mode, doc_id, _rrf_score, _bm25_rank, _vector_rank\n"
    f"    FROM ({_ORACLE})\n"
    "    UNION ALL\n"
    # round-8: the published-text-index leg is bit-identical to the scan
    # leg by construction (same tf/dl/df/N through the same expression),
    # so its oracle IS the fused oracle re-tagged — the hash check pins
    # that identity
    "    SELECT 'indexed' AS mode, doc_id, _rrf_score, _bm25_rank, _vector_rank\n"
    f"    FROM ({_ORACLE})\n"
    "    UNION ALL\n"
    # round-9: the DELTA-merged artifact (publish even-id half, then
    # publish_text_index_delta the odd-id half) scores bit-identically
    # to a full publish over the union — so ITS oracle is the fused
    # oracle re-tagged too; the hash pins the merge identity
    "    SELECT 'indexed_delta' AS mode, doc_id, _rrf_score, _bm25_rank, _vector_rank\n"
    f"    FROM ({_ORACLE})\n"
    "    UNION ALL\n"
    "    SELECT 'vector_only' AS mode, doc_id, _rrf_score, _bm25_rank, _vector_rank\n"
    f"    FROM ({_ORACLE_VECTOR_ONLY})\n"
    "    UNION ALL\n"
    f"    SELECT * FROM ({_ORACLE_TABLE})\n"
    ") ORDER BY mode, _rrf_score DESC, doc_id"
)


@register("hybrid_search", _ORACLE_FUSED)
def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid BM25+vector RRF, both modes in one union (consolidated
    round 3): `fused` = normal fusion; `vector_only` = the FTS-empty
    degradation (`src/ann_search.cpp:1056`) where no query term matches
    any document and hybrid_search degrades to pure vector-rank RRF with
    _bm25_rank = 0."""
    from pyspark.sql import functions as F

    base = _hybrid_base(spark, sf_dir)
    qv = query_vec(spark, sf_dir)
    fused = hybrid_search(
        base, "doc_id", qv, QUERY_TEXT, text_col="text", vec_col="embedding",
        k=10,
    ).select(
        F.lit("fused").alias("mode"),
        "doc_id", "_rrf_score", "_bm25_rank", "_vector_rank",
    )
    # round-8 'indexed' leg: BM25 through a published inverted-postings
    # artifact (publish_text_index) instead of the per-query corpus scan
    # — must hash-match the scan leg's oracle bit-for-bit
    import os
    import shutil
    import tempfile

    from ..operators.hybrid import publish_text_index

    ti = os.path.join(
        tempfile.gettempdir(), f"duckdb_ann_spark_suite_ti_{os.getpid()}"
    )
    shutil.rmtree(ti, ignore_errors=True)
    publish_text_index(base, "doc_id", "text", ti)
    indexed = hybrid_search(
        base, "doc_id", qv, QUERY_TEXT, text_col="text", vec_col="embedding",
        k=10, text_index=ti,
    ).select(
        F.lit("indexed").alias("mode"),
        "doc_id", "_rrf_score", "_bm25_rank", "_vector_rank",
    )
    vec_only = hybrid_search(
        base, "doc_id", qv, "zzzzqqqxx notawordatall", text_col="text",
        vec_col="embedding", k=10,
    ).select(
        F.lit("vector_only").alias("mode"),
        "doc_id", "_rrf_score", "_bm25_rank", "_vector_rank",
    )
    # round-9 'indexed_delta' leg: publish the even-id half, DELTA-merge
    # the odd-id half (publish_text_index_delta), search through the
    # merged artifact — must hash-match the full-corpus fused oracle
    # bit-for-bit (the merge-identity pin)
    from ..operators.hybrid import publish_text_index_delta

    ti_base = os.path.join(
        tempfile.gettempdir(), f"duckdb_ann_spark_suite_tib_{os.getpid()}"
    )
    ti_merged = os.path.join(
        tempfile.gettempdir(), f"duckdb_ann_spark_suite_tim_{os.getpid()}"
    )
    shutil.rmtree(ti_base, ignore_errors=True)
    shutil.rmtree(ti_merged, ignore_errors=True)
    publish_text_index(
        base.where(F.col("doc_id") % 2 == 0), "doc_id", "text", ti_base
    )
    publish_text_index_delta(
        spark, ti_base, base.where(F.col("doc_id") % 2 == 1), "text",
        ti_merged,
    )
    indexed_delta = hybrid_search(
        base, "doc_id", qv, QUERY_TEXT, text_col="text", vec_col="embedding",
        k=10, text_index=ti_merged,
    ).select(
        F.lit("indexed_delta").alias("mode"),
        "doc_id", "_rrf_score", "_bm25_rank", "_vector_rank",
    )
    # round-9 'table:<qid>' legs: hybrid_search_table — the unbounded
    # query-DataFrame path (no driver collect of the query side), one
    # mode tag per query so the union keeps the entry's 5-column schema.
    # qid → text CASE must stay in lockstep with _TABLE_CASE above.
    from ..operators.hybrid import hybrid_search_table

    qdf = base.where(F.col("doc_id").isin([0, 7, 13])).select(
        F.col("doc_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.when(F.col("doc_id") == 0, QUERY_TEXT)
        .when(F.col("doc_id") == 7, "data")
        .otherwise("")
        .alias("qtext"),
    )
    table_legs = hybrid_search_table(
        qdf, "qid", "qv", "qtext", text_index=ti, docs=base,
        doc_id_col="doc_id", vec_col="embedding", k=10, method="exact",
    ).select(
        F.concat(F.lit("table:"), F.col("qid").cast("string")).alias("mode"),
        "doc_id", "_rrf_score", "_bm25_rank", "_vector_rank",
    )
    return (
        fused.unionAll(indexed).unionAll(indexed_delta)
        .unionAll(vec_only).unionAll(table_legs)
        .orderBy("mode", F.col("_rrf_score").desc(), "doc_id")
    )
