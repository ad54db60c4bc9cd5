"""Driver queries: deduplication family (LLM-pipeline north star).

The sf0.01 documents/embeddings tables contain no duplicates, so each
entry augments the input with deterministic duplicates/near-duplicates
*on both sides* (the Spark callable and the oracle SQL build the same
augmented table), making real dedup behavior — not just the empty case —
part of the gate.

MinHash components are 64-bit integer expressions over one md5-derived
32-bit hash per shingle (`(a_j*h + b_j) mod p`, exact in BIGINT on both
engines), so the LSH signatures and estimated Jaccards hash-match
bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import sql_tokenize
from ..operators.batch import search_batch_ids
from ..operators.dedup import (
    MINHASH_COEFFS,
    MINHASH_PRIME,
    dedup_exact,
    embedding_near_dup_pairs,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from ..oracle import sql_index_distance
from . import register

_TOK = sql_tokenize("text")

# -- shared augmented inputs ------------------------------------------
#
# Synthetic duplicate ids use +10M/+20M offsets so they can NEVER
# collide with a real doc_id/vec_id at any scale factor (round-5 fix:
# +1000 collided with real ids at sf0.1, creating duplicate-id rows
# whose downstream DISTINCT semantics differed between engines).

_DOCS_AUG_CTE = """
aug AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000000, text FROM documents WHERE doc_id < 5
    UNION ALL
    SELECT doc_id + 20000000, text || ' zzduplicate'
    FROM documents WHERE doc_id >= 5 AND doc_id < 10
)
"""

_EMB_AUG_CTE = """
eaug AS (
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 10000000, embedding FROM embeddings WHERE vec_id < 5
)
"""


def _docs_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    exact = d.where(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    near = d.where((F.col("doc_id") >= 5) & (F.col("doc_id") < 10)).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzduplicate")).alias("text"),
    )
    return d.unionByName(exact).unionByName(near)


def _emb_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dup = e.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    return e.unionByName(dup)


# -- shared SQL fragments for the MinHash pipeline ---------------------

# shingles: 3-word, whole text when shorter (mirrors operators.dedup.shingles),
# plus the per-shingle 32-bit hash (mirrors the hs binding in operators.dedup.signature_sql)
_SH_CTE = f"""
sh AS (
    SELECT doc_id, sh,
        list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT))
            AS hs
    FROM (
        SELECT doc_id,
            CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                 ELSE list_transform(range(1, len(toks) - 1),
                                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
            END AS sh
        FROM (SELECT doc_id, {_TOK} AS toks FROM aug)
    )
)
"""

# affine min-wise components in exact BIGINT arithmetic (same constants
# as the Spark side — imported, not copied)
_SIG_COMPONENTS = ", ".join(
    f"list_aggregate(list_transform(hs, h -> (h * {a} + {b}) % {MINHASH_PRIME}),"
    " 'min')"
    for a, b in MINHASH_COEFFS
)

_SIG_CTE = f"sig AS (SELECT doc_id, [{_SIG_COMPONENTS}] AS sig FROM sh)"

_BANDS_CTE = """
bands AS (
    SELECT doc_id, sig, b.band,
           md5(CAST(sig[b.band*3 + 1] AS VARCHAR) || '|' ||
               CAST(sig[b.band*3 + 2] AS VARCHAR) || '|' ||
               CAST(sig[b.band*3 + 3] AS VARCHAR)) AS bkey
    FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
)
"""

_PAIRS_CTE = """
pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                    a.sig AS sig_a, b.sig AS sig_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)
"""


@register(
    "dedup_exact",
    f"""
    WITH {_DOCS_AUG_CTE.strip()},
    keyed AS (SELECT doc_id, sha256(lower(trim(text))) AS _key FROM aug),
    cl AS (SELECT _key, min(doc_id) AS cluster_id FROM keyed GROUP BY _key)
    SELECT k.doc_id, c.cluster_id, k.doc_id <> c.cluster_id AS is_duplicate
    FROM keyed k JOIN cl c USING (_key)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_exact(_docs_aug(spark, sf_dir), "doc_id", "text")


@register(
    "dedup_minhash_pairs",
    f"""
    WITH {_DOCS_AUG_CTE.strip()},
    {_SH_CTE.strip()},
    {_SIG_CTE},
    {_BANDS_CTE.strip()},
    {_PAIRS_CTE.strip()},
    est AS (
        SELECT id_a, id_b,
               CAST(len(list_filter(list_transform(range(1, 13),
                                                   i -> sig_a[i] = sig_b[i]),
                                    x -> x)) AS DOUBLE) / 12.0 AS est_jaccard
        FROM pairs
    )
    SELECT 'full' AS src, id_a, id_b, est_jaccard FROM est
    UNION ALL
    SELECT 'incr' AS src, id_a, id_b, est_jaccard FROM est
    WHERE id_a % 2 = 1 OR id_b % 2 = 1
    UNION ALL
    -- 'kept': delta (odd-id) docs surviving dedup_incremental — drop on
    -- any pair with a corpus (even) doc, or as the larger id of a
    -- delta-delta pair
    SELECT 'kept' AS src, doc_id AS id_a, CAST(-1 AS BIGINT) AS id_b,
           CAST(-1.0 AS DOUBLE) AS est_jaccard
    FROM aug
    WHERE doc_id % 2 = 1 AND doc_id NOT IN (
        SELECT CASE WHEN id_a % 2 = 1 AND id_b % 2 = 0 THEN id_a
                    ELSE id_b END
        FROM est WHERE id_a % 2 = 1 OR id_b % 2 = 1
    )
    """,
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs, BOTH construction paths
    (consolidated entry, round 8): `src='full'` runs the whole corpus
    through `minhash_candidate_pairs`; `src='incr'` PUBLISHES the
    even-id half as a signature artifact (`publish_minhash_signatures`)
    and runs the odd-id half as a delta through
    `minhash_pairs_incremental` — the corpus half is never
    re-tokenized. The oracle identity: incremental pairs == full-run
    pairs restricted to pairs touching at least one odd (delta) id,
    bit-for-bit on est_jaccard. `src='kept'` adds the
    `dedup_incremental` survivors (the daily-ingest call: drop on any
    corpus hit — a band-bucket SEMI-join, pairs never materialized —
    or as the larger id of a delta-delta pair)."""
    import os
    import shutil
    import tempfile

    from ..operators.dedup import (
        dedup_incremental,
        minhash_pairs_incremental,
        publish_minhash_signatures,
    )

    docs = _docs_aug(spark, sf_dir)
    full = minhash_candidate_pairs(docs, "doc_id", "text").select(
        F.lit("full").alias("src"), "id_a", "id_b", "est_jaccard"
    )
    pub = os.path.join(
        tempfile.gettempdir(), f"duckdb_ann_spark_suite_pubsig_{os.getpid()}"
    )
    shutil.rmtree(pub, ignore_errors=True)
    publish_minhash_signatures(
        docs.where(F.col("doc_id") % 2 == 0), "doc_id", "text", pub
    )
    delta = docs.where(F.col("doc_id") % 2 == 1)
    incr = minhash_pairs_incremental(
        spark, pub, delta, "doc_id", "text"
    ).select(F.lit("incr").alias("src"), "id_a", "id_b", "est_jaccard")
    kept = dedup_incremental(spark, pub, delta, "doc_id", "text").select(
        F.lit("kept").alias("src"),
        F.col("doc_id").alias("id_a"),
        F.lit(-1).cast("long").alias("id_b"),
        F.lit(-1.0).alias("est_jaccard"),
    )
    return full.unionByName(incr).unionByName(kept)


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_DOCS_AUG_CTE.strip()},
    {_SH_CTE.strip()},
    {_SIG_CTE},
    {_BANDS_CTE.strip()},
    {_PAIRS_CTE.strip()},
    dsh AS (SELECT doc_id, list_distinct(sh) AS s FROM sh)
    SELECT p.id_a, p.id_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) AS jaccard
    FROM pairs p
    JOIN dsh a ON a.doc_id = p.id_a
    JOIN dsh b ON b.doc_id = p.id_b
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_docs_aug(spark, sf_dir), "doc_id", "text",
                               threshold=0.5)


@register(
    "dedup_simhash",
    f"""
    WITH dtoks AS (
        SELECT doc_id, list_distinct({_TOK}) AS toks
        FROM documents WHERE doc_id < 50
    ),
    th AS (
        SELECT doc_id,
               list_transform(toks,
                              t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)) AS hs
        FROM dtoks
    )
    SELECT doc_id,
        list_reduce(
            list_prepend(CAST(0 AS BIGINT),
                list_transform(range(0, 32), b ->
                    CASE WHEN list_reduce(
                            list_prepend(0, list_transform(hs,
                                h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)),
                            (acc, v) -> acc + v) > 0
                         THEN CAST(2 ** b AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
            (acc, v) -> acc + v) AS simhash
    FROM th
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 50)
        .select("doc_id", "text")
    )
    return simhash(docs, "doc_id", "text")


@register(
    "dedup_embedding_cosine",
    f"""
    WITH {_EMB_AUG_CTE.strip()},
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               a.embedding AS va, b.embedding AS vb
        FROM eaug a JOIN eaug b ON a.vec_id < b.vec_id
    ),
    scored AS (
        SELECT id_a, id_b,
            (list_reduce(list_transform(range(1, len(va) + 1),
                 i -> CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)),
                 (acc, v) -> acc + v))
            / (sqrt(list_reduce(list_transform(range(1, len(va) + 1),
                   i -> CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE)),
                   (acc, v) -> acc + v))
               * sqrt(list_reduce(list_transform(range(1, len(vb) + 1),
                   i -> CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)),
                   (acc, v) -> acc + v))) AS cosine
        FROM pairs
    )
    SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.95
    """,
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed near-dup join. The oracle brute-forces all
    pairs; they agree because identical vectors always share LSH buckets
    and the testdata has no natural pairs near the 0.95 boundary (max
    cosine 0.513)."""
    return embedding_near_dup_pairs(
        _emb_aug(spark, sf_dir), "vec_id", "embedding", threshold=0.95
    )


@register(
    "similarity_join_1nn",
    f"""
    SELECT query_idx, vec_id, _distance FROM (
        SELECT CAST(q.vec_id AS INT) AS query_idx, e.vec_id,
               {sql_index_distance('l2', 'e.embedding', 'q.embedding')} AS _distance,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {sql_index_distance('l2', 'e.embedding', 'q.embedding')},
                            e.vec_id
               ) AS rn
        FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
    ) WHERE rn = 1
    """,
)
def q_similarity_join_1nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each embedding's nearest *other* embedding — the similarity-join
    primitive. Exact path here (bit-exact distances); the bucketed scale
    path is dedup_embedding_cosine / the IVF engine."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").select("embedding").collect()
    ]
    hits = search_batch_ids(emb, "vec_id", "embedding", qs, k=2, method="exact")
    w = Window.partitionBy("query_idx").orderBy(
        F.col("_distance").asc_nulls_last(), F.col("vec_id").asc()
    )
    return (
        hits.where(F.col("vec_id") != F.col("query_idx"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("query_idx", "vec_id", "_distance")
    )


@register(
    "knn_join_fullprobe",
    f"""
    WITH lat AS (
        SELECT query_id, vec_id, _distance FROM (
            SELECT q.vec_id AS query_id, e.vec_id,
                   {sql_index_distance('l2', 'e.embedding', 'q.embedding')} AS _distance,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {sql_index_distance('l2', 'e.embedding', 'q.embedding')},
                                e.vec_id
                   ) AS rn
            FROM (SELECT * FROM embeddings WHERE vec_id < 40) q
            CROSS JOIN embeddings e
        ) WHERE rn <= 3
    )
    SELECT 'fresh' AS src, query_id, vec_id, _distance FROM lat
    UNION ALL
    SELECT 'index' AS src, query_id, vec_id, _distance FROM lat
    """,
)
def q_knn_join_fullprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-NN join, BOTH construction paths (consolidated
    entry, round 7): `src='fresh'` trains IVF cells per call
    (`knn_join`), `src='index'` joins against a PUBLISHED IVFFlat
    index's cells (`index_knn_join` — centroids + cell-partitioned
    parquet reused, no base-side assignment pass). At nprobe = nlist
    every pair is scored, so both legs are exact and hash-match the
    same LATERAL brute-force oracle, bit-for-bit on distances."""
    import os
    import tempfile

    from ..index import Catalog, create_index, drop_index
    from ..operators.knn_join import index_knn_join, knn_join

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 40)
    fresh = knn_join(
        queries, "vec_id", "embedding", emb, "vec_id", "embedding",
        k=3, nlist=8, nprobe=8, method="exact",
    ).select(
        F.lit("fresh").alias("src"),
        F.col("_q_vec_id").alias("query_id"), "vec_id", "_distance",
    )
    cat = Catalog(os.path.join(
        tempfile.gettempdir(), f"duckdb_ann_spark_suite_knn_{os.getpid()}"
    ))
    drop_index("suite_ikj", cat)
    create_index(
        emb, "vec_id", "embedding", "suite_ikj", engine="faiss",
        type="IVFFlat", ivf_nlist=8, nprobe=8, table_name="embeddings",
        catalog=cat,
    )
    via_index = index_knn_join(
        spark, "suite_ikj", queries, "vec_id", "embedding", k=3, nprobe=8,
        method="exact", catalog=cat,
    ).select(
        F.lit("index").alias("src"),
        F.col("_q_vec_id").alias("query_id"), "vec_id", "_distance",
    )
    return fresh.unionByName(via_index)
