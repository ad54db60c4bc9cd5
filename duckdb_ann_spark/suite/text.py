"""Driver queries: text-analysis operators (LLM-pipeline north star).

One consolidated ``text_signals`` entry (round 5: formerly five —
text_token_stats / text_quality / text_lang_id / text_fingerprint /
text_bpe_tokens; merged to stay under the driver's 50-entry registry cap
while the corpus-prep family was added). Every column of every original
entry survives in the combined output, so each operator keeps a bitwise
DuckDB-oracle gate: identical tokenization, integer counts,
single-division ratios, left-assoc score sums.

Per-operator unit/edge coverage lives in tests/test_dedup_text.py; this
entry is the cross-engine hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.text import sql_tokenize
from ..operators.text_ops import (
    LANG_MARKERS,
    STOPWORDS,
    bpe_token_count,
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)
from . import register

_TOK = sql_tokenize("text")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


_STOP_SQL = "['" + "', '".join(STOPWORDS[0].split()) + "']"


def duck_lang_cols() -> tuple[str, str]:
    """(hit-count column list, CASE decision) in DuckDB SQL — mirrors
    operators.text_ops lang_id / lang_pred_from_hits. THE single duck
    spelling: pipeline_suite reuses it (a second hand-typed copy could
    silently drift from this one and from the Spark twins)."""
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
    return hits, f"CASE {cases} ELSE 'und' END"


_HITS, _LANG_CASE = duck_lang_cols()
_G = "greatest(" + ", ".join(f"h_{lg}" for lg in LANG_MARKERS) + ")"

# DuckDB string literal of the SAME pre-tokenizer regex the operator
# uses — derived, not retyped, so an edit to BPE_PRETOKEN_RE reaches
# the oracle automatically
from ..operators.text_ops import BPE_PRETOKEN_RE as _BPE_SRC  # noqa: E402

_BPE_RE = "'" + _BPE_SRC.replace("'", "''") + "'"


@register(
    "text_signals",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOK} AS toks FROM documents),
    stats AS (
        SELECT doc_id,
               length(text) AS n_chars,
               CAST(len(toks) AS INT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS INT) AS n_unique_tokens,
               CAST(list_reduce(list_prepend(0, list_transform(toks, x -> length(x))),
                                (acc, v) -> acc + v) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) AS avg_token_len
        FROM t
    ),
    qc AS (
        SELECT doc_id,
            CAST(len(toks) AS DOUBLE) AS n,
            CAST(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))
                 AS DOUBLE) AS n_stop,
            CAST(len(list_filter(toks, x -> regexp_matches(x, '^[a-z]+$')))
                 AS DOUBLE) AS n_alpha,
            CAST(len(list_distinct(toks)) AS DOUBLE) AS uniq
        FROM t
    ),
    quality AS (
        SELECT doc_id,
               n_stop / n AS stopword_ratio,
               n_alpha / n AS alpha_ratio,
               uniq / n AS unique_ratio,
               0.25 * (CASE WHEN n >= 5 AND n <= 5000 THEN 1.0 ELSE 0.0 END)
               + 0.25 * least((n_stop / n) * 5.0, 1.0)
               + 0.25 * (n_alpha / n)
               + 0.25 * (uniq / n) AS quality_score
        FROM qc
    ),
    hits AS (
        SELECT doc_id,
            {_HITS}
        FROM t
    ),
    lang AS (
        SELECT doc_id, {_LANG_CASE} AS lang_pred, {_G} AS lang_hits
        FROM hits
    ),
    fp AS (
        SELECT doc_id, md5(array_to_string(toks, ' ')) AS fingerprint FROM t
    ),
    bpe AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, {_BPE_RE})) AS INT)
                   AS n_pretokens,
               CAST(len(toks) AS INT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, {_BPE_RE})) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) AS pretoken_ratio
        FROM t
    )
    SELECT s.doc_id, s.n_chars, s.n_tokens, s.n_unique_tokens, s.avg_token_len,
           q.stopword_ratio, q.alpha_ratio, q.unique_ratio, q.quality_score,
           l.lang_pred, l.lang_hits,
           f.fingerprint,
           b.n_pretokens, b.n_ws_tokens, b.pretoken_ratio
    FROM stats s
    JOIN quality q USING (doc_id)
    JOIN lang l USING (doc_id)
    JOIN fp f USING (doc_id)
    JOIN bpe b USING (doc_id)
    """,
)
def q_text_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All five text-analysis operators over the documents table, joined
    on doc_id: token stats, quality features, language ID, fingerprint,
    and BPE-ish pre-token counts. Each underlying operator is unchanged
    (operators/text_ops.py) and individually exercised by unit tests;
    the join here is a 1:1 equi-join on the id (broadcast-or-shuffle,
    Catalyst's pick) purely to fit the registry cap."""
    docs = _docs(spark, sf_dir)
    out = (
        token_stats(docs, "doc_id", "text")
        .join(quality_score(docs, "doc_id", "text"), on="doc_id")
        .join(lang_id(docs, "doc_id", "text"), on="doc_id")
        .join(fingerprint(docs, "doc_id", "text"), on="doc_id")
        .join(
            bpe_token_count(docs, "doc_id", "text").select(
                "doc_id", "n_pretokens", "n_ws_tokens", "pretoken_ratio"
            ),
            on="doc_id",
        )
    )
    return out
