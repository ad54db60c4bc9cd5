"""Driver query: the composed corpus-prep pipeline (`pipeline.prepare_corpus`).

One entry exercises the full annotate → filter → exact-dedup →
near-dedup flow end-to-end against a DuckDB oracle that mirrors every
stage: same tokens, same single-division ratios and left-assoc score
sum (bitwise float match), same min-id-per-fingerprint window, same
MinHash-LSH + shingle-Jaccard verify + drop-larger-id policy. Runs on
the dedup family's augmented documents table so both dedup stages
actually fire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.text import sql_tokenize
from ..pipeline import prepare_corpus
from ..operators.text_ops import LANG_MARKERS
from . import register
from .dedup import _DOCS_AUG_CTE, _SIG_COMPONENTS, _docs_aug
from .text import _STOP_SQL, duck_lang_cols

_TOK = sql_tokenize("text")

# single-sourced duck lang fragments (suite/text.py) — a hand-typed
# second copy here could drift from text_signals' and the Spark twins
_HITS, _LANG_CASE_FULL = duck_lang_cols()
_GREATEST = "greatest(" + ", ".join(f"h_{lg}" for lg in LANG_MARKERS) + ")"

_ORACLE = f"""
    WITH {_DOCS_AUG_CTE.strip()},
    t AS (SELECT doc_id, text, {_TOK} AS toks FROM aug),
    a AS (
        SELECT doc_id, text, length(text) AS n_chars,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(toks) AS DOUBLE) AS n,
           CAST(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))
                AS DOUBLE) AS n_stop,
           CAST(len(list_filter(toks, x -> regexp_matches(x, '^[a-z]+$')))
                AS DOUBLE) AS n_alpha,
           CAST(len(list_distinct(toks)) AS DOUBLE) AS uniq,
           {_HITS},
           md5(array_to_string(toks, ' ')) AS fp
        FROM t
    ),
    s AS (
        SELECT doc_id, text, n_chars, n_tokens,
           0.25 * (CASE WHEN n >= 5 AND n <= 5000 THEN 1.0 ELSE 0.0 END)
           + 0.25 * least((n_stop / n) * 5.0, 1.0)
           + 0.25 * (n_alpha / n)
           + 0.25 * (uniq / n) AS quality_score,
           {_LANG_CASE_FULL} AS lang_pred,
           fp
        FROM a
    ),
    kept AS (
        SELECT * FROM s WHERE lang_pred IN ('en') AND quality_score >= 0.65
    ),
    uniq AS (
        SELECT doc_id, text, n_chars, n_tokens, quality_score, lang_pred
        FROM (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id)
                        AS rn
              FROM kept)
        WHERE rn = 1
    ),
    ush AS (
        SELECT doc_id, sh,
            list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT))
                AS hs
        FROM (
            SELECT doc_id,
                CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                     ELSE list_transform(range(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                END AS sh
            FROM (SELECT doc_id, {_TOK} AS toks FROM uniq)
        )
    ),
    usig AS (SELECT doc_id, [{_SIG_COMPONENTS}] AS sig FROM ush),
    ubands AS (
        SELECT doc_id, b.band,
               md5(CAST(sig[b.band*3 + 1] AS VARCHAR) || '|' ||
                   CAST(sig[b.band*3 + 2] AS VARCHAR) || '|' ||
                   CAST(sig[b.band*3 + 3] AS VARCHAR)) AS bkey
        FROM usig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
    ),
    upairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM ubands a JOIN ubands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    udsh AS (SELECT doc_id, list_distinct(sh) AS s FROM ush),
    drops AS (
        SELECT DISTINCT p.id_b AS doc_id
        FROM upairs p
        JOIN udsh a ON a.doc_id = p.id_a
        JOIN udsh b ON b.doc_id = p.id_b
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5
    )
    SELECT u.doc_id, u.text, u.n_chars, u.n_tokens, u.quality_score,
           u.lang_pred
    FROM uniq u
    WHERE NOT EXISTS (SELECT 1 FROM drops d WHERE d.doc_id = u.doc_id)
    ORDER BY u.doc_id
    """


@register("pipeline_prepare_corpus", _ORACLE)
def q_prepare_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prepare_corpus(
        _docs_aug(spark, sf_dir), "doc_id", "text",
        langs=("en",), min_quality=0.65, near_dup_threshold=0.5,
    )
