"""Driver queries: text-analysis operators (LLM-pipeline north star).

Each entry mirrors `operators/text_ops.py` in DuckDB SQL: identical
tokenization, integer counts, single-division ratios, and left-assoc
score sums, so floats hash-match bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.text import sql_tokenize
from ..operators.text_ops import (
    LANG_MARKERS,
    STOPWORDS,
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)
from . import register

_TOK = sql_tokenize("text")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


@register(
    "text_token_stats",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOK} AS toks FROM documents)
    SELECT doc_id,
           length(text) AS n_chars,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INT) AS n_unique_tokens,
           CAST(list_reduce(list_prepend(0, list_transform(toks, x -> length(x))),
                            (acc, v) -> acc + v) AS DOUBLE)
           / CAST(len(toks) AS DOUBLE) AS avg_token_len
    FROM t
    """,
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(_docs(spark, sf_dir), "doc_id", "text")


_STOP_SQL = "['" + "', '".join(STOPWORDS[0].split()) + "']"


@register(
    "text_quality",
    f"""
    WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
    c AS (
        SELECT doc_id,
            CAST(len(toks) AS DOUBLE) AS n,
            CAST(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))
                 AS DOUBLE) AS n_stop,
            CAST(len(list_filter(toks, x -> regexp_matches(x, '^[a-z]+$')))
                 AS DOUBLE) AS n_alpha,
            CAST(len(list_distinct(toks)) AS DOUBLE) AS uniq
        FROM t
    )
    SELECT doc_id,
           n_stop / n AS stopword_ratio,
           n_alpha / n AS alpha_ratio,
           uniq / n AS unique_ratio,
           0.25 * (CASE WHEN n >= 5 AND n <= 5000 THEN 1.0 ELSE 0.0 END)
           + 0.25 * least((n_stop / n) * 5.0, 1.0)
           + 0.25 * (n_alpha / n)
           + 0.25 * (uniq / n) AS quality_score
    FROM c
    """,
)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(_docs(spark, sf_dir), "doc_id", "text")


def _lang_sql() -> str:
    hits = ",\n            ".join(
        f"CAST(len(list_filter(toks, x -> list_contains(['"
        + "', '".join(markers)
        + f"'], x))) AS INT) AS h_{lang}"
        for lang, markers in LANG_MARKERS.items()
    )
    g = "greatest(" + ", ".join(f"h_{lg}" for lg in LANG_MARKERS) + ")"
    cases = "\n           ".join(
        f"WHEN h_{lg} > 0 AND h_{lg} >= {g} THEN '{lg}'" for lg in LANG_MARKERS
    )
    return f"""
    WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
    h AS (
        SELECT doc_id,
            {hits}
        FROM t
    )
    SELECT doc_id,
           CASE {cases}
           ELSE 'und' END AS lang_pred,
           {g} AS lang_hits
    FROM h
    """


@register("text_lang_id", _lang_sql())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(_docs(spark, sf_dir), "doc_id", "text")


@register(
    "text_fingerprint",
    f"""
    SELECT doc_id, md5(array_to_string({_TOK}, ' ')) AS fingerprint
    FROM documents
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(_docs(spark, sf_dir), "doc_id", "text")


@register(
    "text_bpe_tokens",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
               '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
           )) AS INT) AS n_pretokens,
           CAST(len(""" + _TOK + r""") AS INT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text,
               '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
           )) AS DOUBLE)
           / CAST(len(""" + _TOK + r""") AS DOUBLE)
               AS pretoken_ratio
    FROM documents
    """,
)
def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenizer counting (the split a byte-pair tokenizer
    applies before merges) — pure JVM regexp on both sides, same regex
    in Java-regex and RE2 dialects."""
    from ..operators.text_ops import bpe_token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_token_count(docs, "doc_id", "text")
