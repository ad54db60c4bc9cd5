"""Text-analysis operators for training-data pipelines.

All pure Column expressions (whole-stage codegen, no UDFs, no shuffle):

* :func:`token_stats` — token/char/unique counts, avg token length;
* :func:`quality_score` — heuristic quality features (stopword ratio,
  alpha ratio, repetition) and a composite score;
* :func:`lang_id` — marker-token n-gram heuristic over a small built-in
  lexicon (en/es/de/fr/zh for the testdata's language mix);
* :func:`fingerprint` — md5 document fingerprint over normalized tokens
  (the rolling-hash analog; identical in DuckDB for oracle checks).

Float discipline: every ratio is a single a/b division of exact integer
counts, so results hash-match the SQL oracle bitwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.expr import bind_once
from ..functions.text import tokenize

STOPWORDS = (
    "a an and are as at be by for from has he in is it its of on that the to was were with",
)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    # order matters: ties resolve to the first listed language
    "en": ("the", "a", "and", "of", "to", "is", "in", "it", "row", "table"),
    "es": ("el", "la", "los", "de", "y", "es", "en", "que", "un", "una"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "zh": ("de5", "shi4", "zai4", "he2", "le5", "you3", "wo3", "ta1", "men5", "bu4"),
}

__all__ = ["token_stats", "quality_score", "lang_id", "fingerprint",
           "lm_unigram_scores",
           "bpe_token_count", "quality_features", "lang_hit_struct",
           "lang_pred_from_hits", "LANG_MARKERS", "STOPWORDS",
           "BPE_PRETOKEN_RE"]


def _toks(text_col) -> Column:
    return tokenize(text_col)


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # stats share ONE tokenize evaluation via bind_once (four inline
    # references would re-run the regexp split four times per row)
    stats = bind_once(
        _toks(text_col),
        lambda toks: F.struct(
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
            F.try_divide(
                F.aggregate(
                    toks, F.lit(0), lambda acc, t: acc + F.length(t)
                ).cast("double"),
                F.size(toks).cast("double"),
            ).alias("avg_token_len"),
        ),
    )
    return df.select(
        F.col(id_col), F.length(text_col).alias("n_chars"), stats.alias("_s")
    ).select(
        id_col, "n_chars", "_s.n_tokens", "_s.n_unique_tokens",
        "_s.avg_token_len",
    )


def sql_quality_struct(toks: str = "toks") -> str:
    """Spark SQL fragment: :func:`quality_features` over a bound token
    array named `toks` — identical expression tree (double literals use
    the D suffix so nothing parses as DECIMAL), assembled as a string so
    big annotate plans cost one py4j call instead of one per node."""
    n = f"cast(size({toks}) as double)"
    n_stop = (
        f"cast(size(filter({toks}, t -> "
        f"array_contains(split('{STOPWORDS[0]}', ' '), t))) as double)"
    )
    n_alpha = (
        f"cast(size(filter({toks}, t -> t rlike '^[a-z]+$')) as double)"
    )
    uniq = f"cast(size(array_distinct({toks})) as double)"
    len_ok = f"case when {n} >= 5 and {n} <= 5000 then 1.0D else 0.0D end"
    stop_ratio = f"try_divide({n_stop}, {n})"
    alpha_ratio = f"try_divide({n_alpha}, {n})"
    rep = f"try_divide({uniq}, {n})"
    score = (
        f"0.25D * ({len_ok}) + 0.25D * least(({stop_ratio}) * 5.0D, 1.0D) "
        f"+ 0.25D * ({alpha_ratio}) + 0.25D * ({rep})"
    )
    return (
        f"struct({stop_ratio} as stopword_ratio, {alpha_ratio} as alpha_ratio, "
        f"{rep} as unique_ratio, {score} as quality_score)"
    )


def sql_lang_hits_struct(toks: str = "toks") -> str:
    """Spark SQL fragment: :func:`lang_hit_struct` over a bound token
    array named `toks`."""
    cols = ", ".join(
        "size(filter({t}, t -> array_contains(array({ms}), t))) as h_{lg}".format(
            t=toks,
            ms=", ".join(f"'{m}'" for m in markers),
            lg=lang,
        )
        for lang, markers in LANG_MARKERS.items()
    )
    return f"struct({cols})"


def sql_lang_pred_case(h: str = "hh") -> str:
    """Spark SQL CASE over a bound lang-hits struct named `h`, mirroring
    :func:`lang_pred_from_hits` exactly (first LANG_MARKERS language
    with a nonzero maximal hit count wins; keep in lockstep)."""
    g = "greatest(" + ", ".join(f"{h}.h_{lg}" for lg in LANG_MARKERS) + ")"
    whens = " ".join(
        f"WHEN {h}.h_{lg} > 0 AND {h}.h_{lg} >= {g} THEN '{lg}'"
        for lg in LANG_MARKERS
    )
    return f"CASE {whens} ELSE 'und' END"


def quality_features(toks: Column) -> Column:
    """Expression builder over a bound token array →
    struct(stopword_ratio, alpha_ratio, unique_ratio, quality_score).

    Column-API twin of :func:`sql_quality_struct` (which internal
    callers use — one py4j call instead of one per node); keep the two
    in lockstep. `toks` must be a `bind_once`-bound reference or the
    tokenize re-runs per feature."""
    stop = F.split(F.lit(STOPWORDS[0]), " ")
    n = F.size(toks).cast("double")
    n_stop = F.size(
        F.filter(toks, lambda t: F.array_contains(stop, t))
    ).cast("double")
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$"))).cast(
        "double"
    )
    uniq = F.size(F.array_distinct(toks)).cast("double")
    len_ok = F.when((n >= 5) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ratio = F.try_divide(n_stop, n)
    alpha_ratio = F.try_divide(n_alpha, n)
    rep = F.try_divide(uniq, n)
    score = (
        F.lit(0.25) * len_ok
        + F.lit(0.25) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
        + F.lit(0.25) * alpha_ratio
        + F.lit(0.25) * rep
    )
    return F.struct(
        stop_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        rep.alias("unique_ratio"),
        score.alias("quality_score"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length/stopword/alpha/repetition features + composite score in [0,1].

    score = 0.25*len_ok + 0.25*stopword_ratio_clamped
          + 0.25*alpha_ratio + 0.25*(unique/total)."""
    from ..functions.text import spark_sql_tokenize, sql_bind_once

    feats = sql_bind_once(
        spark_sql_tokenize(text_col), "toks", sql_quality_struct()
    )
    return df.select(F.col(id_col), F.expr(feats).alias("_f")).select(
        id_col, "_f.stopword_ratio", "_f.alpha_ratio", "_f.unique_ratio",
        "_f.quality_score",
    )


def lang_hit_struct(toks: Column) -> Column:
    """Expression builder → struct(h_en, h_es, ...) of per-language
    marker-token hit counts over a bound token array. Column-API twin of
    :func:`sql_lang_hits_struct`; keep in lockstep."""
    def _contains(arr):
        # NB: a two-parameter lambda would be treated as (x, idx) by
        # F.filter — capture the marker array via closure instead.
        return lambda t: F.array_contains(arr, t)

    cols = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        cols.append(F.size(F.filter(toks, _contains(arr))).alias(f"h_{lang}"))
    return F.struct(*cols)


def lang_pred_from_hits(h) -> Column:
    """Decision over materialized hit counts: `h(lang)` → that language's
    hit-count Column. Ties and zero hits fall back in LANG_MARKERS order
    / 'und'."""
    best = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # earlier langs win ties
        hit = h(lang)
        cond = hit >= F.greatest(*[h(lg) for lg in LANG_MARKERS])
        best = F.when((hit > 0) & cond, F.lit(lang)).otherwise(best)
    return best


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """→ (id, lang_pred, lang_hits): language with the most marker-token
    hits; ties and zero hits fall back in LANG_MARKERS order / 'und'."""
    from ..functions.text import spark_sql_tokenize, sql_bind_once

    hits_expr = sql_bind_once(
        spark_sql_tokenize(text_col), "toks", sql_lang_hits_struct()
    )
    with_hits = df.select(
        F.col(id_col), F.expr(hits_expr).alias("_h")
    ).select(
        id_col, *[F.col(f"_h.h_{lang}").alias(f"_h_{lang}") for lang in LANG_MARKERS]
    )
    h = lambda lg: F.col(f"_h_{lg}")
    best_hits = F.greatest(*[h(lg) for lg in LANG_MARKERS])
    return with_hits.select(
        F.col(id_col),
        lang_pred_from_hits(h).alias("lang_pred"),
        best_hits.alias("lang_hits"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """→ (id, fingerprint): md5 over space-joined normalized tokens —
    whitespace/punctuation-insensitive exact-dup key."""
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", _toks(text_col))).alias("fingerprint"),
    )


# GPT-2-shape pre-tokenizer regex, constrained to the common subset of
# Java regex (Spark) and RE2 (DuckDB): contractions, space-prefixed
# letter/digit/punctuation runs, whitespace runs. No lookaheads — RE2
# has none, so the original '\s+(?!\S)' branch is folded into '\s+'.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """BPE-ish token counting: the pre-tokenizer split every byte-pair
    tokenizer applies before merges — a much better LLM-cost estimate
    than whitespace counts (punctuation and digit runs count separately).
    Pure JVM regexp, no UDF.

    → (id, n_pretokens, n_ws_tokens, pretoken_ratio)"""
    pre = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0)
    ws = _toks(text_col)
    # two-step projection: each regexp runs once; the ratio reads the
    # already-computed counts (inline size(...) refs would re-run both)
    counts = df.select(
        F.col(id_col),
        F.size(pre).alias("n_pretokens"),
        F.size(ws).alias("n_ws_tokens"),
    )
    return counts.select(
        id_col, "n_pretokens", "n_ws_tokens",
        F.try_divide(
            F.col("n_pretokens").cast("double"),
            F.col("n_ws_tokens").cast("double"),
        ).alias("pretoken_ratio"),
    )


def lm_unigram_scores(
    df: DataFrame, id_col: str, text_col: str, vocab_size: int = 50_000,
    include_empty_docs: bool = True,
) -> DataFrame:
    """Corpus-trained unigram-LM scoring — the CCNet/Gopher-style
    "perplexity filter" signal a training-data pipeline ranks documents
    by (low average log-probability = gibberish / boilerplate-mix).

    → (id, n_scored_tokens, sum_logprob_nano, avg_logprob): per doc,
    the sum over tokens of ln(p(token)) where p = corpus_count/total,
    with tokens capped out of the top-`vocab_size` vocabulary floored
    to count 1.

    Scale shape: pass 1 explodes tokens into ONE map-side-combined
    count shuffle (token vocabulary, zipf-bounded) and takes the top-V
    via TakeOrdered, broadcast back (V x ~20 B); pass 2 re-explodes,
    broadcast-joins the vocabulary, and aggregates per doc — the
    shuffle carries (id, one bigint) per token. Two scans of the raw
    text, nothing driver-side.

    Float discipline: each token's ln(p) is quantized to INTEGER
    nanonats (floor(ln(p)*1e9) as BIGINT) and summed as BIGINT, so the
    per-doc sum is exact and ORDER-FREE — a double sum across shuffled
    rows would be nondeterministic, and ln itself is the one
    non-bit-deterministic op cross-engine (see operators/hybrid.py).
    `avg_logprob` = sum/1e9/n is two exact IEEE divisions. Perplexity
    is exp(-avg_logprob) — left to the caller because exp is also
    engine-divergent at the last ulp. (As with the BM25 idf, the
    quantization is a mitigation, not a proof: a 1-ulp ln divergence
    still flips the floor when ln(p)*1e9 sits within ~2e-6 of an
    integer — ~1e-6 per distinct (count, total) pair.)

    ``include_empty_docs=False`` skips the final reinstatement join
    (zero-token docs absent instead of n=0/null rows) — callers that
    immediately filter on the score should pass False and save a
    corpus-wide id scan.
    """
    toks = df.select(
        F.col(id_col), F.explode(_toks(text_col)).alias("_tok")
    )
    # the count table feeds BOTH the total and the top-V vocabulary:
    # persist it (vocabulary-sized, tiny) so the tokenize+explode+count
    # lineage runs once, not once per consumer — same single-evaluation
    # discipline as minhash_candidate_pairs' signature table
    counts = toks.groupBy("_tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("_cnt")
    ).persist()
    total = counts.agg(F.sum("_cnt").alias("_total"))
    vocab = counts.orderBy(F.desc("_cnt"), F.asc("_tok")).limit(vocab_size)

    logp_nano = F.floor(
        F.log(
            F.coalesce(F.col("_cnt"), F.lit(1)).cast("double")
            / F.col("_total").cast("double")
        ) * F.lit(1e9)
    ).cast("bigint")
    per_doc = (
        toks.join(F.broadcast(vocab), on="_tok", how="left")
        .crossJoin(F.broadcast(total))
        .select(F.col(id_col), logp_nano.alias("_lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scored_tokens"),
            F.sum("_lp").alias("sum_logprob_nano"),
        )
    )
    avg = (
        F.col("sum_logprob_nano").cast("double") / F.lit(1e9)
        / F.col("n_scored_tokens").cast("double")
    ).alias("avg_logprob")
    from ..caching import track_caches

    if not include_empty_docs:
        return track_caches(
            per_doc.select(
                id_col, "n_scored_tokens", "sum_logprob_nano", avg
            ),
            counts,
        )
    return track_caches(
        df.select(id_col).join(per_doc, on=id_col, how="left").select(
            id_col,
            F.coalesce("n_scored_tokens", F.lit(0)).alias("n_scored_tokens"),
            "sum_logprob_nano",
            avg,
        ),
        counts,
    )
