"""Driver queries: corpus-preparation family (LLM-pipeline north star).

Six entries over `operators/corpus_ops.py`: Gopher-style repetition
filters, PII scrub, deterministic split + domain-mix sampling, near-dup
connected components, benchmark decontamination, and sequence packing.

The heavy array expressions (repetition, n-grams, buckets) are generated
for BOTH engines from the same dual-dialect builders in corpus_ops, so
the oracle can't drift from the operator. Ratios are single divisions of
exact BIGINT counts → every entry is bitwise hash-checked.

Inputs are augmented deterministically on both sides where the clean
testdata lacks signal (no newlines → no duplicate lines; no PII; no
contamination), following suite/dedup.py's convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_tokenize
from ..operators.corpus_ops import (
    bucket_sql,
    connected_components,
    domain_sample,
    hash_split,
    ngram_decontaminate,
    ngram_over_text_sql,
    pack_sequences,
    pii_scrub,
    pii_sql_cols,
    rate_case_sql,
    repetition_sql,
    repetition_stats,
    split_case_sql,
    stratified_sample,
)
from ..operators.dedup import minhash_candidate_pairs
from . import register
from .dedup import (
    _BANDS_CTE,
    _DOCS_AUG_CTE,
    _PAIRS_CTE,
    _SH_CTE,
    _SIG_CTE,
    _docs_aug,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# -- corpus_repetition -------------------------------------------------
#
# Synthetic duplicate lines for every third doc (the testdata has no
# newlines, so the line metrics would be vacuously 0 otherwise); the
# appended tokens also produce duplicate 2-/3-grams.

_REP_LINE = "Repeat Line zz"
_REP_AUG_DUCK = (
    "CASE WHEN doc_id % 3 = 0 THEN text || chr(10) || '"
    + _REP_LINE + "' || chr(10) || '" + _REP_LINE + "' ELSE text END"
)


@register(
    "corpus_repetition",
    f"""
    WITH aug AS (SELECT doc_id, {_REP_AUG_DUCK} AS text FROM documents)
    SELECT doc_id, unnest(r)
    FROM (SELECT doc_id, {repetition_sql('duck', 'text')} AS r FROM aug)
    """,
)
def q_corpus_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters (duplicate-line / duplicate-n-gram /
    top-n-gram-coverage fractions), fully row-local — the plan is a
    single whole-stage-codegen projection, no shuffle."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("\n" + _REP_LINE + "\n" + _REP_LINE),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return repetition_stats(docs, "doc_id", "text")


# -- corpus_pii_scrub --------------------------------------------------

_PII_SUFFIX = " Contact jane.doe@example.com or 192.168.1.99 or 555-867-5309."
_PII_AUG_DUCK = (
    f"CASE WHEN doc_id % 5 = 0 THEN text || '{_PII_SUFFIX}' ELSE text END"
)


@register(
    "corpus_pii_scrub",
    f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG_DUCK} AS text FROM documents)
    SELECT doc_id, {pii_sql_cols('duck', 'text')} FROM aug
    """,
)
def q_corpus_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/IPv4/phone redaction + counts, pure JVM regexp in the
    Java∩RE2 dialect subset (identical matches on both engines,
    including the redacted output text — string-exact in the hash)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0, F.lit(_PII_SUFFIX)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return pii_scrub(docs, "doc_id", "text")


# -- corpus_sampling ---------------------------------------------------

_SPLIT_FRACS = (0.9, 0.05, 0.05)
_SPLIT_NAMES = ("train", "val", "test")
_MIX_RATES = {"src0": 0.25, "src1": 0.5}
_MIX_DEFAULT = 1.0
_STRAT_K = 10


@register(
    "corpus_sampling",
    f"""
    SELECT doc_id, source,
           {bucket_sql('duck', 'doc_id', 'split')} AS bucket,
           {split_case_sql('duck', bucket_sql('duck', 'doc_id', 'split'),
                           _SPLIT_FRACS, _SPLIT_NAMES)} AS split,
           {bucket_sql('duck', 'doc_id', 'mix')}
               < ({rate_case_sql('duck', 'source', _MIX_RATES, _MIX_DEFAULT)})
               AS mix_keep,
           row_number() OVER (
               PARTITION BY source
               ORDER BY {bucket_sql('duck', 'doc_id', 'strat')}, doc_id
           ) <= {_STRAT_K} AS strat_keep
    FROM documents
    """,
)
def q_corpus_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-bucket train/val/test split + per-domain mixture
    downsampling + exact-k-per-domain stratified sample (three
    independent salts). Assignment depends only on the id, so it is
    reproducible across engines, runs, and cluster shapes — the
    property rand()-sampling lacks — and split/mix rows never migrate
    when the corpus grows."""
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    out = hash_split(docs, "doc_id", _SPLIT_FRACS, _SPLIT_NAMES)
    out = domain_sample(out, "doc_id", "source", _MIX_RATES, _MIX_DEFAULT)
    out = stratified_sample(out, "doc_id", "source", _STRAT_K)
    return out.select("doc_id", "source", "bucket", "split", "mix_keep",
                      "strat_keep")


# -- dedup_components --------------------------------------------------


@register(
    "dedup_components",
    f"""
    WITH RECURSIVE {_DOCS_AUG_CTE.strip()},
    {_SH_CTE.strip()},
    {_SIG_CTE},
    {_BANDS_CTE.strip()},
    {_PAIRS_CTE.strip()},
    nodes AS (
        SELECT DISTINCT id FROM (
            SELECT id_a AS id FROM pairs
            UNION ALL SELECT id_b FROM pairs
        )
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b
    )
    SELECT a AS doc_id, min(b) AS component_id,
           a <> min(b) AS is_duplicate
    FROM reach GROUP BY a
    """,
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs → connected components → one cluster
    representative (min id): the step that turns near-dup PAIRS into
    dedup CLUSTERS. Spark runs the large-star/small-star contraction
    (ids_only: the est_jaccard columns would be discarded unread); the
    oracle computes the same components with a recursive transitive
    closure."""
    pairs = minhash_candidate_pairs(
        _docs_aug(spark, sf_dir), "doc_id", "text", ids_only=True
    )
    comps = connected_components(pairs, "id_a", "id_b")
    return comps.select(
        F.col("node").alias("doc_id"),
        "component_id",
        (F.col("node") != F.col("component_id")).alias("is_duplicate"),
    )


# -- corpus_decontaminate ----------------------------------------------
#
# Benchmark = every 29th doc; docs 10-14 are contaminated by appending
# benchmark doc 3's text (ids that exist at every scale factor).

_DECON_N = 5


@register(
    "corpus_decontaminate",
    f"""
    WITH bt AS (SELECT text AS btext FROM documents WHERE doc_id = 3),
    aug AS (
        SELECT d.doc_id,
               CASE WHEN d.doc_id BETWEEN 10 AND 14
                    THEN d.text || ' ' || bt.btext
                    ELSE d.text END AS text
        FROM documents d CROSS JOIN bt
    ),
    bench AS (
        -- benchmark rows restricted to >= n tokens ON BOTH SIDES: the
        -- operator's short-row whole-text rule has no static-SQL oracle
        -- (it collects the length set), so the ENTRY pins the >= n case
        -- and pytest covers the short-row rule
        SELECT DISTINCT md5('{_DECON_N}' || '|' || ng) AS h FROM (
            SELECT unnest({ngram_over_text_sql('duck', 'text', _DECON_N)}) AS ng
            FROM aug
            WHERE doc_id % 29 = 3
              AND len({sql_tokenize('text')}) >= {_DECON_N}
        )
    ),
    dng AS (
        SELECT DISTINCT doc_id, md5('{_DECON_N}' || '|' || ng) AS h FROM (
            SELECT doc_id,
                   unnest({ngram_over_text_sql('duck', 'text', _DECON_N)}) AS ng
            FROM aug
        )
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_ngrams
    FROM dng JOIN bench USING (h)
    GROUP BY doc_id
    """,
)
def q_corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-overlap contamination check by shared token 5-grams
    (GPT-3 appendix C shape). Both sides reduce to distinct md5 digests
    before joining; the benchmark digest set broadcasts."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    bt = docs.where(F.col("doc_id") == 3).select(
        F.col("text").alias("_btext")
    )
    aug = docs.crossJoin(F.broadcast(bt)).select(
        "doc_id",
        F.when(
            F.col("doc_id").between(10, 14),
            F.concat(F.col("text"), F.lit(" "), F.col("_btext")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    from ..functions.text import token_count

    bench = aug.where(
        (F.col("doc_id") % 29 == 3) & (token_count("text") >= _DECON_N)
    )
    return ngram_decontaminate(aug, "doc_id", "text", bench, "text",
                               n=_DECON_N)


# -- corpus_pack -------------------------------------------------------

_PACK_LEN = 512
_PACK_TOK = sql_tokenize("text")


@register(
    "corpus_pack",
    f"""
    WITH t AS (
        SELECT doc_id, source, CAST(len({_PACK_TOK}) AS BIGINT) AS nt
        FROM documents
    ),
    w AS (
        SELECT doc_id, source, nt,
               CAST(coalesce(sum(nt) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS prev
        FROM t
    )
    SELECT doc_id, source, CAST(nt AS INT) AS n_tokens,
           prev // {_PACK_LEN} AS pack_no,
           prev % {_PACK_LEN} AS pack_offset
    FROM w
    """,
)
def q_corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic greedy sequence packing into {_PACK_LEN}-token
    training rows, windowed per source so packing parallelizes across
    domains (no global single-partition window)."""
    return pack_sequences(
        _docs(spark, sf_dir), "doc_id", "source", "text", max_len=_PACK_LEN
    )
