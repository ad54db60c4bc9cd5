"""Corpus-preparation operators for large-scale training-data pipelines.

The signals a 100 TB pretraining pipeline computes besides dedup/quality
(reference scope: `decisiongraph/duckdb-ann` has no corpus-prep surface;
these extend the engine the way SURVEY.md's "training-data pipeline"
north star prescribes):

* :func:`repetition_stats` — Gopher-style repetition filters (duplicate
  line / duplicate n-gram / top-n-gram-coverage fractions, per
  Rae et al. 2021 "Scaling Language Models" §A1.1) — computed entirely
  ROW-LOCALLY: sort the per-document line/n-gram array and count equal
  adjacent elements, so the operator is pure whole-stage-codegen with NO
  shuffle (an explode+groupBy formulation would shuffle every n-gram of
  every document).
* :func:`pii_scrub` — email/IPv4/phone redaction with per-pattern
  counts; pure JVM regexp in the Java∩RE2 dialect subset.
* :func:`hash_split` — deterministic, engine-portable train/val/test
  assignment from an md5 bucket of the id (stable across runs, engines,
  and cluster sizes — never `rand()`).
* :func:`domain_sample` — per-domain deterministic downsampling to
  target mixture rates (the "data mixing" step), same bucket scheme
  under a different salt so split and mix decisions are independent.
* :func:`connected_components` — min-label propagation over a near-dup
  pair set (the step that turns LSH pairs into dedup clusters).
* :func:`ngram_decontaminate` — benchmark-overlap flagging by shared
  token n-grams (the standard eval-contamination check).
* :func:`pack_sequences` — deterministic greedy sequence packing into
  fixed-token-budget training rows via a per-domain window cumsum.

Dual-dialect fragments: the heavy array expressions are generated for
BOTH Spark SQL and DuckDB SQL from one builder (``d`` = "spark" |
"duck"), so the driver oracle can never drift from the operator — the
same discipline as ``functions/text.py``'s tokenize twins. Every ratio
is one division of exact BIGINT counts → bitwise hash-matchable.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    quote_ident,
    spark_sql_tokenize_expr,
    sql_bind_once,
    sql_tokenize,
    token_count,
)

__all__ = [
    "repetition_stats",
    "repetition_sql",
    "repetition_gate_sql",
    "pii_scrub",
    "pii_redact",
    "pii_sql_cols",
    "PII_PATTERNS",
    "hash_split",
    "domain_sample",
    "stratified_sample",
    "bucket_sql",
    "HASH_BUCKETS",
    "connected_components",
    "ngram_decontaminate",
    "ngram_over_text_sql",
    "pack_sequences",
]


# ---------------------------------------------------------------------------
# dialect primitives ("spark" = Spark SQL, "duck" = DuckDB SQL)
# ---------------------------------------------------------------------------

def _el(d: str, arr: str, i: str) -> str:
    return f"element_at({arr}, {i})" if d == "spark" else f"({arr})[{i}]"


def _size(d: str, arr: str) -> str:
    return f"size({arr})" if d == "spark" else f"len({arr})"


def _seq1(d: str, n: str) -> str:
    """[1..n], empty when n <= 0. Spark's sequence(1, 0) DESCENDS
    ([1, 0]), so the guard is load-bearing."""
    if d == "spark":
        return f"if(({n}) <= 0, array(), sequence(1, {n}))"
    return f"range(1, ({n}) + 1)"


def _filter(d: str, arr: str, var: str, body: str) -> str:
    fn = "filter" if d == "spark" else "list_filter"
    return f"{fn}({arr}, {var} -> {body})"


def _transform(d: str, arr: str, var: str, body: str) -> str:
    fn = "transform" if d == "spark" else "list_transform"
    return f"{fn}({arr}, {var} -> {body})"


def _sort(d: str, arr: str) -> str:
    # both engines order ASCII strings bytewise, so equal elements end up
    # adjacent identically; only EQUALITY of neighbors is consumed below
    return f"array_sort({arr})" if d == "spark" else f"list_sort({arr})"


def _sum0(d: str, arr: str) -> str:
    """Sequential BIGINT fold (deterministic, order-fixed on the bound
    array)."""
    if d == "spark":
        return f"aggregate({arr}, cast(0 as bigint), (acc, v) -> acc + v)"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {arr}), "
        "(acc, v) -> acc + v)"
    )


def _amax(d: str, arr: str) -> str:
    return f"array_max({arr})" if d == "spark" else f"list_aggregate({arr}, 'max')"


def _pos(d: str, arr: str, v: str) -> str:
    fn = "array_position" if d == "spark" else "list_position"
    return f"{fn}({arr}, {v})"


def _cat2(d: str, a: str, b: str) -> str:
    fn = "concat" if d == "spark" else "list_concat"
    return f"{fn}({a}, {b})"


def _arr1(d: str, x: str) -> str:
    return f"array({x})" if d == "spark" else f"[{x}]"


def _bind(d: str, val: str, var: str, body: str) -> str:
    """Evaluate `val` once, expose it to `body` as `var` — delegates to
    the canonical single-sourced spelling for the Spark dialect
    (functions/text.py:sql_bind_once)."""
    if d == "spark":
        return sql_bind_once(val, var, body)
    return f"list_transform([{val}], {var} -> {body})[1]"


def _struct(d: str, fields: list[tuple[str, str]]) -> str:
    if d == "spark":
        inner = ", ".join(f"{expr} as {name}" for name, expr in fields)
        return f"struct({inner})"
    inner = ", ".join(f"{name} := {expr}" for name, expr in fields)
    return f"struct_pack({inner})"


def _tok(d: str, text_expr: str) -> str:
    """The repo-wide tokenize contract over an arbitrary text EXPRESSION
    — both dialects delegate to the canonical single-sourced fragments
    in functions/text.py."""
    if d == "spark":
        return spark_sql_tokenize_expr(text_expr)
    return sql_tokenize(text_expr)


def _lines(d: str, text_expr: str) -> str:
    """Non-empty trimmed lines of the text."""
    if d == "spark":
        split = f"split({text_expr}, '\\\\n')"
    else:
        split = f"string_split_regex({text_expr}, '\\n')"
    trimmed = _transform(d, split, "l", "trim(l)")
    return _filter(d, trimmed, "l", "l <> ''")


def _ngrams(d: str, toks: str, n: int) -> str:
    """Space-joined token n-grams; [] when the doc has < n tokens (a
    counting metric wants no whole-text fallback, unlike dedup
    shingles)."""
    elems = ", ".join(_el(d, toks, f"i + {j}") for j in range(n))
    count = f"greatest({_size(d, toks)} - {n - 1}, 0)"
    return _transform(d, _seq1(d, count), "i", f"concat_ws(' ', {elems})")


def ngram_over_text_sql(d: str, text_expr: str, n: int) -> str:
    """array<string> of token n-grams of a text expression (tokens bound
    once)."""
    return _bind(d, _tok(d, text_expr), "toks", _ngrams(d, "toks", n))


# ---------------------------------------------------------------------------
# repetition_stats
# ---------------------------------------------------------------------------

def _rep_counts(d: str, arr_sql: str) -> str:
    """BIGINT count struct over a string-array expression:

    ``(n, dup, dup_chars, chars, top_run, top_chars)`` where `dup` =
    elements involved in any duplicate (equal to a sorted neighbor),
    `*_chars` weight elements by length, and `top_*` describe the most
    frequent element (ties → bytewise-smallest value, which is the
    FIRST maximal run of the sorted array on both engines).

    Everything derives from the run structure of the sorted array,
    bound once per row: run starts → run lengths → duplicate counts
    (n − singleton runs) — no shuffle, no explode; O(m log m) per
    document, and each per-element pass exists once (higher-order
    functions evaluate interpreted, so pass count is the cost driver)."""
    zero = "cast(0 as bigint)" if d == "spark" else "CAST(0 AS BIGINT)"
    s, st, rl, tc, mr, sg = "s", "st", "rl", "tc", "mr", "sg"
    n = _size(d, s)
    # the i-1 access short-circuits behind i > 1 on both engines (probed)
    run_starts = _filter(
        d, _seq1(d, n), "i",
        f"i = 1 OR {_el(d, s, 'i - 1')} <> {_el(d, s, 'i')}",
    )
    # run lengths from consecutive run starts (sentinel n+1 appended, so
    # the j+1 access stays in bounds by construction)
    st2 = _cat2(d, st, _arr1(d, f"{n} + 1"))
    run_lens = _transform(
        d, _seq1(d, _size(d, st)), "j",
        f"{_el(d, st2, 'j + 1')} - {_el(d, st, 'j')}",
    )
    total_chars = _sum0(d, _transform(d, s, "x", "cast(length(x) as bigint)"))
    # indexes (into st/rl) of the runs of length 1 — the NON-duplicated
    # elements; everything else is "involved in a duplicate"
    singles = _filter(d, _seq1(d, _size(d, st)), "j", f"{_el(d, rl, 'j')} = 1")
    single_chars = _sum0(d, _transform(
        d, sg, "j",
        f"cast(length({_el(d, s, _el(d, st, 'j'))}) as bigint)",
    ))
    # array_position returns BIGINT on Spark; element_at wants INT
    top_val = _el(d, s, _el(d, st, f"cast({_pos(d, rl, mr)} as int)"))
    fields = [
        ("n", f"cast({n} as bigint)"),
        ("dup", f"cast({n} - {_size(d, sg)} as bigint)"),
        ("dup_chars", f"cast({tc} - {single_chars} as bigint)"),
        ("chars", tc),
        ("top_run", f"cast({mr} as bigint)"),
        ("top_chars", f"cast({mr} * length({top_val}) as bigint)"),
    ]
    zeros = _struct(d, [(name, zero) for name, _ in fields])
    body = _bind(d, run_starts, st,
                 _bind(d, run_lens, rl,
                       _bind(d, total_chars, tc,
                             _bind(d, _amax(d, rl), mr,
                                   _bind(d, singles, sg, _struct(d, fields))))))
    guarded = f"CASE WHEN {n} = 0 THEN {zeros} ELSE {body} END"
    cleaned = _sort(d, _filter(d, arr_sql, "x", "x <> ''"))
    return _bind(d, cleaned, s, guarded)


def _ratio(d: str, a: str, b: str) -> str:
    """One exact-integer division → double; NULL when the denominator is
    0 (Spark try_divide; DuckDB's `/` is already NULL-on-zero)."""
    if d == "spark":
        return f"try_divide(cast({a} as double), cast({b} as double))"
    return f"(CAST({a} AS DOUBLE) / CAST({b} AS DOUBLE))"


# signal name → (count-struct group, expression over that group's bound
# variable). Shared by repetition_sql (all signals) and
# repetition_gate_sql (only the groups the gates reference).
_REP_SIGNALS: dict[str, tuple[str, object]] = {
    "n_lines": ("lc", lambda d, v: f"cast({v}.n as int)"),
    "dup_line_frac": ("lc", lambda d, v: _ratio(d, f"{v}.dup", f"{v}.n")),
    "dup_line_char_frac": (
        "lc", lambda d, v: _ratio(d, f"{v}.dup_chars", f"{v}.chars")),
    "dup_2gram_frac": ("g2", lambda d, v: _ratio(d, f"{v}.dup", f"{v}.n")),
    "dup_3gram_frac": ("g3", lambda d, v: _ratio(d, f"{v}.dup", f"{v}.n")),
    "top_2gram_char_frac": (
        "g2", lambda d, v: _ratio(d, f"{v}.top_chars", f"{v}.chars")),
}


def _bind_rep_groups(d: str, text_expr: str, groups: set, body: str) -> str:
    """Wrap `body` in binds for the requested count-struct groups (lc =
    lines, g2/g3 = token n-grams; the token array binds once when any
    n-gram group is present)."""
    if "g3" in groups:
        body = _bind(d, _rep_counts(d, _ngrams(d, "toks", 3)), "g3", body)
    if "g2" in groups:
        body = _bind(d, _rep_counts(d, _ngrams(d, "toks", 2)), "g2", body)
    if groups & {"g2", "g3"}:
        body = _bind(d, _tok(d, text_expr), "toks", body)
    if "lc" in groups:
        body = _bind(d, _rep_counts(d, _lines(d, text_expr)), "lc", body)
    return body


def repetition_sql(d: str, text_expr: str) -> str:
    """Flat struct of the Gopher-style repetition signals over a text
    expression: ``(n_lines, dup_line_frac, dup_line_char_frac,
    dup_2gram_frac, dup_3gram_frac, top_2gram_char_frac)``."""
    out = _struct(d, [
        (name, fn(d, grp)) for name, (grp, fn) in _REP_SIGNALS.items()
    ])
    return _bind_rep_groups(d, text_expr, {"lc", "g2", "g3"}, out)


def repetition_gate_sql(d: str, text_expr: str,
                        gates: dict[str, float]) -> str:
    """ONE self-contained boolean expression: every gated signal is NULL
    (no evidence → pass) or at-or-under its ceiling.

    Built as a single bind chain so the whole computation is evaluated
    exactly once per row however the optimizer rewrites the surrounding
    plan — a `withColumn` + `where` + `drop` spelling gets the struct
    alias inlined into the filter, duplicating the (expensive) tree once
    per gate key (measured: 156 array_sort nodes in the plan vs 3).
    Only the count-struct groups the gate keys reference are computed."""
    bad = set(gates) - set(_REP_SIGNALS)
    if bad:
        raise ValueError(
            f"unknown repetition_gates keys {sorted(bad)}; "
            f"allowed: {sorted(_REP_SIGNALS)}"
        )
    if not gates:
        raise ValueError("repetition_gates must name at least one signal")
    preds, groups = [], set()
    for key, ceiling in sorted(gates.items()):
        grp, fn = _REP_SIGNALS[key]
        groups.add(grp)
        val = fn(d, grp)
        preds.append(
            f"(({val}) IS NULL OR ({val}) <= cast({float(ceiling)!r} as double))"
        )
    return _bind_rep_groups(d, text_expr, groups, " AND ".join(preds))


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """→ (id, n_lines, dup_line_frac, dup_line_char_frac, dup_2gram_frac,
    dup_3gram_frac, top_2gram_char_frac): the Gopher repetition filters
    (Rae et al. 2021 §A1.1 shape).

    Scale: 100% row-local whole-stage codegen — the document never
    explodes into per-line/per-n-gram rows, so there is NO shuffle and
    the operator streams at parquet-scan speed regardless of corpus
    size. Round 15 (guide §2.5): `widen_if_narrow` — a single-split
    local input otherwise runs the whole n-gram scan on ONE task (the
    round-15 bench plan had zero exchanges and one partition, 1/32
    utilization on local[32]); on any real multi-split read it is a
    no-op."""
    from ..local import widen_if_narrow

    expr = repetition_sql("spark", quote_ident(text_col))
    return widen_if_narrow(df).select(
        F.col(id_col), F.expr(expr).alias("_r")
    ).select(id_col, "_r.*")


# ---------------------------------------------------------------------------
# pii_scrub
# ---------------------------------------------------------------------------

# Patterns restricted to the Java-regex ∩ RE2 common subset (no
# lookaround, no backrefs; \b is the ASCII word boundary in both), so
# Spark and the DuckDB oracle match/replace identically. Applied in
# list order; replacement tokens contain no digits/@, so later patterns
# can't match inside an earlier redaction.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ips", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phones", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def pii_redact(col) -> "F.Column":
    """The PII redaction fold over a text Column — THE single Column-API
    spelling of the pattern list (pii_scrub and prepare_corpus both
    call this; pii_sql_cols mirrors it for the oracles)."""
    clean = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    return clean


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """→ (id, n_emails, n_ips, n_phones, text_clean): counts of each PII
    pattern in the ORIGINAL text plus the text with all three redacted
    (email → ip → phone order).

    Pure JVM regexp columns (no UDF, no shuffle); at 100 TB this runs as
    a map-only scan."""
    c = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    return df.select(
        F.col(id_col), *counts, pii_redact(c).alias("text_clean")
    )


def pii_sql_cols(d: str, text_expr: str) -> str:
    """The scrub output columns as a SQL fragment (both dialects):
    ``n_emails, n_ips, n_phones, text_clean``."""
    counts = []
    for name, pat, _ in PII_PATTERNS:
        if d == "spark":
            counts.append(
                f"size(regexp_extract_all({text_expr}, '{_sql_escape_re(pat)}', 0))"
                f" as n_{name}"
            )
        else:
            counts.append(
                f"len(regexp_extract_all({text_expr}, '{pat}')) AS n_{name}"
            )
    clean = text_expr
    for _, pat, repl in PII_PATTERNS:
        if d == "spark":
            clean = f"regexp_replace({clean}, '{_sql_escape_re(pat)}', '{repl}')"
        else:
            clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    return ", ".join(counts + [f"{clean} AS text_clean"])


def _sql_escape_re(pat: str) -> str:
    """Spark SQL string literals process backslash escapes; double them
    so the regex engine sees the same pattern DuckDB's (escape-free)
    literals produce."""
    return pat.replace("\\", "\\\\")


# ---------------------------------------------------------------------------
# hash_split / domain_sample
# ---------------------------------------------------------------------------

HASH_BUCKETS = 10_000


def bucket_sql(d: str, id_expr: str, salt: str) -> str:
    """Deterministic bucket in [0, HASH_BUCKETS): first 32 md5 bits of
    ``"<id>:<salt>"`` mod 10000. Identical in Spark and DuckDB (verified
    constant-for-constant), stable across runs/engines/partitionings —
    the property `rand()`-based sampling lacks."""
    if not re.fullmatch(r"[A-Za-z0-9_.-]+", salt):
        # the salt is interpolated into a SQL string literal; restrict it
        # rather than escape per-dialect
        raise ValueError(
            f"salt must match [A-Za-z0-9_.-]+, got {salt!r}"
        )
    if d == "spark":
        key = f"concat(cast({id_expr} as string), ':{salt}')"
        return (
            f"pmod(cast(conv(substring(md5({key}), 1, 8), 16, 10) as bigint), "
            f"{HASH_BUCKETS})"
        )
    key = f"CAST({id_expr} AS VARCHAR) || ':{salt}'"
    return (
        f"(CAST('0x' || substr(md5({key}), 1, 8) AS BIGINT) % {HASH_BUCKETS})"
    )


def _split_edges(fracs, names) -> list[int]:
    """Cumulative bucket edges for a split spec — THE single quantization
    rule (operator + oracle both call this, so they cannot disagree).
    Validates that no split quantizes to zero width: a positive fraction
    silently yielding a forever-empty split (e.g. two edges rounding
    equal, or the last edge rounding to 10000) is a data bug users
    should hear about at build time."""
    if len(fracs) != len(names):
        raise ValueError("fracs and names must align")
    if abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError("fracs must sum to 1")
    edges, acc = [], 0.0
    for frac in fracs[:-1]:
        acc += frac
        edges.append(int(round(acc * HASH_BUCKETS)))
    widths = [b - a for a, b in zip([0] + edges, edges + [HASH_BUCKETS])]
    if any(w <= 0 for w in widths):
        raise ValueError(
            f"split fractions {tuple(fracs)} quantize (1/{HASH_BUCKETS}) to "
            f"an empty split: bucket widths {widths} for {tuple(names)}"
        )
    return edges


def hash_split(
    df: DataFrame,
    id_col: str,
    fracs: tuple[float, ...] = (0.95, 0.025, 0.025),
    names: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "split",
) -> DataFrame:
    """Adds (bucket, split): deterministic train/val/test assignment.

    Fractions quantize to 1/10000 (validated non-empty per split); rows
    never migrate between splits when the corpus grows (assignment
    depends only on the id)."""
    edges = _split_edges(fracs, names)
    bucket = F.expr(bucket_sql("spark", quote_ident(id_col), salt))
    out = df.withColumn("bucket", bucket)
    split = F.lit(names[-1])
    for name, edge in zip(reversed(names[:-1]), reversed(edges)):
        split = F.when(F.col("bucket") < edge, F.lit(name)).otherwise(split)
    return out.withColumn("split", split)


def _sql_str(value: str) -> str:
    """A value destined for a SQL string literal in BOTH dialects —
    reject quoting rather than escape per-dialect (these are oracle
    helpers; the operator path takes Columns and has no restriction)."""
    if "'" in value or "\\" in value:
        raise ValueError(
            f"value {value!r} cannot contain quotes/backslashes in "
            "oracle SQL helpers"
        )
    return f"'{value}'"


def split_case_sql(d: str, bucket_expr: str, fracs, names) -> str:
    """The matching CASE fragment for an oracle over the same buckets."""
    edges = _split_edges(fracs, names)
    whens = " ".join(
        f"WHEN {bucket_expr} < {edge} THEN {_sql_str(name)}"
        for name, edge in zip(names[:-1], edges)
    )
    return f"CASE {whens} ELSE {_sql_str(names[-1])} END"


def domain_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Adds (mix_keep): deterministic per-domain downsampling to target
    mixture rates — the "data mixing" step of corpus prep. A domain with
    rate r keeps the ~r·|domain| rows whose salted id-bucket falls below
    round(r·10000); decisions are independent of :func:`hash_split`'s
    (different salt) and reproducible on any cluster shape."""
    bucket = F.expr(bucket_sql("spark", quote_ident(id_col), salt))
    thr = F.lit(_rate_threshold(default_rate))
    for dom, r in sorted(rates.items()):
        thr = F.when(
            F.col(domain_col) == dom, F.lit(_rate_threshold(r))
        ).otherwise(thr)
    return df.withColumn("mix_keep", bucket < thr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    k: int,
    salt: str = "strat",
) -> DataFrame:
    """Adds (strat_keep): EXACT-k-per-domain deterministic sample — the
    first k rows of each domain ordered by salted md5 bucket (ties by
    id). Unlike rate-based :func:`domain_sample`, guarantees exact
    per-domain counts (min(k, |domain|)) — the eval-set-carving /
    per-domain-cap primitive.

    Scale (round-6 rewrite): the global rank within a domain is computed
    in TWO LEVELS so no task ever sorts a whole domain (real corpora are
    Zipfian — one domain can be 80%+ of rows, and a
    ``Window.partitionBy(domain)`` would serialize on it):

    1. rank within (domain, bucket) — the salted md5 bucket already
       splits each domain into <=10000 ordered groups of ~|domain|/10000
       rows, so the per-task sort is bounded;
    2. per-(domain, bucket) counts (tiny: <=10000 rows per domain)
       prefix-summed over buckets, joined back as the rank base.

    ``base + rank_within_bucket`` equals the single-window rank exactly
    (ids are the unique tie-break within a bucket), so the output is
    identical by construction — the driver oracle's single-window SQL
    still hash-matches."""
    if k < 0:
        raise ValueError("k must be >= 0")
    b = F.expr(bucket_sql("spark", quote_ident(id_col), salt))
    helper = [
        c for c in ("_sb", "_srn", "_sbase", "_sdom", "_ssb")
        if c in df.columns
    ]
    if helper:
        raise ValueError(f"columns {helper} collide with helper names")
    with_b = df.withColumn("_sb", b)
    w1 = Window.partitionBy(domain_col, "_sb").orderBy(F.col(id_col).asc())
    ranked = with_b.withColumn("_srn", F.row_number().over(w1))
    counts = with_b.groupBy(domain_col, "_sb").agg(
        F.count(F.lit(1)).alias("_sc")
    )
    wb = (
        Window.partitionBy(domain_col)
        .orderBy(F.col("_sb").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = counts.select(
        F.col(domain_col).alias("_sdom"),
        F.col("_sb").alias("_ssb"),
        F.coalesce(F.sum("_sc").over(wb), F.lit(0)).alias("_sbase"),
    )
    # null-SAFE equi-join: a plain `on=[domain_col, "_sb"]` drops every
    # NULL-domain row (equi-joins never match NULL keys), but the
    # single-window semantics this rewrite replicates treat NULL as its
    # own domain group — the contract is to ADD strat_keep, never to
    # filter rows. `eqNullSafe` (<=>) is still a hash-joinable equi-key.
    out = ranked.join(
        base,
        on=F.col(domain_col).eqNullSafe(F.col("_sdom"))
        & F.col("_sb").eqNullSafe(F.col("_ssb")),
    ).withColumn("strat_keep", (F.col("_sbase") + F.col("_srn")) <= k)
    # join reorders columns (keys first); restore the input's order
    return out.select(*df.columns, "strat_keep")


def _rate_threshold(rate: float) -> int:
    """Rate → integer bucket threshold, rounded in PYTHON: ``r * 10000``
    is non-integral in doubles for ~11% of rate values (0.0003 * 10000
    = 2.9999...96) and Spark's bigint cast truncates where DuckDB's
    rounds — both the keep-contract and cross-engine parity need the
    integer decided once, engine-independently (same move as
    hash_split's edges). Rates outside [0, 1] fail at build time
    (matching `_split_edges`' discipline): a typo'd 25-meaning-25%
    would otherwise silently keep everything."""
    rate = float(rate)
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(round(rate * HASH_BUCKETS))


def rate_case_sql(d: str, domain_expr: str, rates: dict[str, float],
                  default_rate: float) -> str:
    """Matching integer-threshold CASE for an oracle: compare the salted
    bucket directly against this (no float multiply in either engine)."""
    whens = " ".join(
        f"WHEN {domain_expr} = {_sql_str(dom)} THEN {_rate_threshold(r)}"
        for dom, r in sorted(rates.items())
    )
    return f"CASE {whens} ELSE {_rate_threshold(default_rate)} END"


# ---------------------------------------------------------------------------
# connected_components
# ---------------------------------------------------------------------------

def _large_star(canon: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al. 2014, Alg. 1): every node links
    its strictly-larger neighbors to the minimum of its neighborhood
    (incl. itself). Input/output: canonical (u > v) distinct edges."""
    und = canon.unionByName(
        canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = und.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        und.join(mins, on="u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") > F.col("v"))
        .distinct()
    )


def _small_star(canon: DataFrame) -> DataFrame:
    """Small-star round (Kiveris et al. 2014, Alg. 2): every node links
    itself and its smaller neighbors to the minimum of those. Input
    edges are canonical (u > v), so each u's neighbors here are exactly
    its smaller ones."""
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))
    relink = (
        canon.join(mins, on="u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_link = mins.select("u", F.col("m").alias("v"))
    return (
        relink.unionByName(self_link)
        .where(F.col("u") > F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src_col: str,
    dst_col: str,
    max_iter: int = 50,
) -> DataFrame:
    """→ (node, component_id): connected components of the undirected
    pair graph; component id = smallest node id in the component. The
    step that turns LSH candidate PAIRS (minhash/simhash/embedding
    near-dup) into dedup CLUSTERS with one kept representative.

    Alternating large-star/small-star contraction (Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond" — the algorithm
    production MapReduce/Spark dedup pipelines use): each round is two
    groupBy-min shuffles over the edge set REGARDLESS of component
    shape, and the edge set provably converges to stars centered at
    component minima in O(log^2 n) rounds (a handful in practice). The
    naive alternative — min-label propagation — needs graph-DIAMETER
    rounds, which a few-hundred-node chain (pathological but possible
    under aggressive LSH banding) already breaks.

    Convergence is detected by an order-free edge-set signature
    (count + XOR of per-edge hashes), one tiny action per round;
    `max_iter` rounds without convergence raises rather than returning
    wrong labels. Shuffles carry (long, long) edges only. The input
    `pairs` plan is scanned exactly once: it is typically an expensive
    LSH band self-join, and canon + the two nodes branches would
    otherwise re-execute it three times — and the RETURNED plan reads
    only localCheckpoint-ed data, so caller actions never re-run the
    pair computation either."""
    src = (
        pairs.select(F.col(src_col).alias("_a"), F.col(dst_col).alias("_b"))
        .persist()
    )
    canon = (
        src.select(
            F.greatest("_a", "_b").alias("u"),
            F.least("_a", "_b").alias("v"),
        )
        .where(F.col("u") > F.col("v"))
        .distinct()
        .persist()
    )
    # endpoints (incl. self-pair nodes dropped from canon) keep a label.
    # localCheckpoint (eager), NOT persist: this frame survives into the
    # returned plan, and a persist released on exit would silently
    # re-execute the pair computation on every caller action.
    nodes = (
        src.select(F.col("_a").alias("node"))
        .unionByName(src.select(F.col("_b").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def _sig(e: DataFrame):
        # bit_xor: order-free and overflow-free under ANSI (a sum of
        # 64-bit hashes overflows LONG)
        return e.agg(
            F.count(F.lit(1)), F.expr("bit_xor(xxhash64(u, v))")
        ).first()

    sig = _sig(canon)  # materializes canon (from the cached pair scan)
    src.unpersist()
    converged = False
    for _ in range(max_iter):
        # localCheckpoint (not just persist): the iterated plan
        # otherwise NESTS one whole large+small round per iteration
        # and the logical tree grows ~8x per round — the driver OOMs
        # building plan strings long before the data is big. At
        # cluster scale prefer setCheckpointDir + checkpoint() if
        # executor loss mid-run must be survivable.
        stepped = _small_star(_large_star(canon)).localCheckpoint()
        new_sig = _sig(stepped)
        # signature match is a fast filter; the exceptAll confirms the
        # edge sets are EXACTLY equal (counts already match via the
        # signature, so one-sided emptiness suffices) — a 2^-64 hash
        # collision can then never terminate a round early with wrong
        # labels. Both frames are checkpointed, so the check is cheap.
        if new_sig == sig and stepped.exceptAll(canon).isEmpty():
            canon.unpersist()
            canon = stepped
            converged = True
            break
        canon.unpersist()
        canon = stepped
        sig = new_sig
    if not converged:
        # best-effort cleanup; the localCheckpoint blocks themselves are
        # reclaimed by the ContextCleaner once these frames are GC'd
        canon.unpersist()
        nodes.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "large-star/small-star rounds (rounds needed ~ log^2 of "
            "the largest component; raise max_iter)"
        )
    # converged edges are stars: u -> its component minimum; roots
    # and self-pair-only nodes label themselves
    star = canon.groupBy("u").agg(F.min("v").alias("component_id"))
    return nodes.join(
        star.withColumnRenamed("u", "node"), on="node", how="left"
    ).select(
        "node",
        F.coalesce("component_id", F.col("node")).alias("component_id"),
    )


# ---------------------------------------------------------------------------
# ngram_decontaminate
# ---------------------------------------------------------------------------

# a broadcast benchmark past this many rows raises (the digest set is
# collected to the driver and shipped to every task); "small by
# contract" is now enforced, not assumed
MAX_BENCH_ROWS = 500_000


def ngram_decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bench: DataFrame,
    bench_text_col: str,
    n: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """→ (id, n_hit_ngrams) for documents sharing >= 1 token n-gram with
    the benchmark corpus — the standard eval-contamination check (GPT-3
    appendix C shape; n=13 there, parameterized here). A benchmark row
    SHORTER than n tokens matches on its full token sequence instead of
    being silently unmatchable (the GPT-3 "use the whole example when
    it is shorter than n" rule): the corpus side additionally emits
    t-grams for each short benchmark length t, digest-tagged by length
    so a t-gram can only match a t-length benchmark row.

    Scale: digests are compared BELOW any shuffle — the corpus side
    emits ONE length-tagged digest array per document covering the main
    n AND every short benchmark length (tokens bound once, one scan, one
    explode — round-6 fix: the per-length unions used to re-scan the
    whole corpus once per distinct short length), filtered by the
    broadcast benchmark digest set map-side; only the (tiny)
    contaminated remainder shuffles for the per-document distinct
    count. ``broadcast_benchmark=True`` (default) collects the
    benchmark digest set — guarded by a `MAX_BENCH_ROWS` probe so an
    oversized benchmark fails loud instead of OOM-ing the driver; pass
    ``broadcast_benchmark=False`` for large benchmarks (the join
    becomes a digest-keyed shuffle; the corpus side then moves its
    full (id, digest) set)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if broadcast_benchmark:
        nb = bench.limit(MAX_BENCH_ROWS + 1).count()
        if nb > MAX_BENCH_ROWS:
            raise ValueError(
                f"ngram_decontaminate: benchmark exceeds {MAX_BENCH_ROWS} "
                "rows; its digest set is collected and broadcast to every "
                "task. Pass broadcast_benchmark=False to use a digest-keyed "
                "shuffle join instead."
            )

    def _tagged(src: DataFrame, col: str, length: int, exact: bool):
        """(… , _h) digests of `length`-grams, tagged with the length;
        exact=True keeps only rows with exactly `length` tokens (the
        short-benchmark whole-text case)."""
        grams = F.expr(
            ngram_over_text_sql("spark", quote_ident(col), length)
        )
        out = src
        if exact:
            ntok = F.size(
                F.expr(spark_sql_tokenize_expr(quote_ident(col)))
            )
            out = out.where(ntok == length)
        keep = [F.col(id_col)] if id_col in src.columns else []
        return out.select(
            *keep, F.explode(grams).alias("_ng")
        ).withColumn("_h", F.md5(F.concat_ws("|", F.lit(str(length)), "_ng")))

    # short benchmark rows (< n tokens): collected driver-side — the
    # benchmark is small by contract
    short_lengths = sorted(
        r[0]
        for r in bench.select(
            F.size(
                F.expr(spark_sql_tokenize_expr(quote_ident(bench_text_col)))
            ).alias("_t")
        )
        .where((F.col("_t") > 0) & (F.col("_t") < n))
        .distinct()
        .collect()
    )

    bench_ng = _tagged(bench.select(F.col(bench_text_col)), bench_text_col,
                       n, exact=False)
    for t in short_lengths:
        bench_ng = bench_ng.unionByName(
            _tagged(bench.select(F.col(bench_text_col)), bench_text_col,
                    t, exact=True)
        )
    bench_h = bench_ng.select("_h").distinct()

    # corpus side: ONE tagged-digest array over all needed lengths —
    # single scan, single explode, tokens bound once per row
    parts = [
        _transform(
            "spark", _ngrams("spark", "toks", length), "g",
            f"md5(concat_ws('|', '{length}', g))",
        )
        for length in [n] + short_lengths
    ]
    combined = parts[0] if len(parts) == 1 else f"concat({', '.join(parts)})"
    digest_arr = _bind(
        "spark", _tok("spark", quote_ident(text_col)), "toks", combined
    )
    doc_ngrams = df.select(
        F.col(id_col), F.explode(F.expr(digest_arr)).alias("_h")
    )
    joined = doc_ngrams.select(id_col, "_h").join(
        F.broadcast(bench_h) if broadcast_benchmark else bench_h, on="_h"
    )
    return joined.groupBy(id_col).agg(
        F.countDistinct("_h").cast("bigint").alias("n_hit_ngrams")
    )


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------

def pack_sequences(
    df: DataFrame,
    id_col: str,
    part_col: str,
    text_col: str,
    max_len: int = 2048,
    chunks: int = 512,
) -> DataFrame:
    """→ (id, part, n_tokens, pack_no, pack_offset): deterministic greedy
    packing of documents into fixed-token-budget training rows.

    Documents are taken in id order within each `part_col` group; a
    document joins the pack in which its first token lands
    (``pack_no = floor(prev_cumsum / max_len)``), so packs fill greedily
    and may overflow by at most one document — the standard streaming
    packing discipline (no re-sorting, so ordering stays reproducible).

    Scale (round-6 rewrite): the per-domain running sum is computed in
    TWO LEVELS so no task ever sorts a whole domain. Real pretraining
    corpora are Zipfian — one domain (web crawl) can be 80%+ of rows,
    and the previous single ``Window.partitionBy(part_col)`` cumsum
    serialized on it (one task sorting billions of rows):

    1. each domain's id RANGE is split into ~`chunks` balanced,
       order-respecting segments via per-domain `percentile_approx`
       boundaries (one tiny map-combinable aggregation over (id, part)
       only — no tokenize);
    2. the cumsum windows over (part, chunk) — bounded task size
       ~|domain|/chunks regardless of skew;
    3. per-chunk token totals (tiny: <= parts x chunks rows) are
       prefix-summed over chunks and joined back as the rebase offset.

    ``chunk_base + within_chunk_prev`` equals the single-window prefix
    sum EXACTLY for any order-respecting boundary placement, so the
    output is identical by construction (the sketch's boundary choice
    only affects load balance, never values) and the driver oracle's
    single-window SQL still hash-matches. Cost: the token count is
    evaluated in both the cumsum and the totals branch (two map-side
    passes) — the price of not persisting a corpus-sized intermediate.
    """
    if max_len <= 0:
        raise ValueError("max_len must be positive")
    if chunks < 1:
        raise ValueError("chunks must be >= 1")
    helper = [
        c for c in ("_chunk", "_bounds", "_bpart", "_cpart", "_cchunk")
        if c in df.columns
    ]
    if helper:
        raise ValueError(f"columns {helper} collide with helper names")
    toks = df.select(
        F.col(id_col),
        F.col(part_col),
        token_count(text_col).cast("bigint").alias("n_tokens"),
    )
    if chunks == 1:
        assigned = toks.withColumn("_chunk", F.lit(0))
    else:
        fracs = [i / chunks for i in range(1, chunks)]
        # null-SAFE joins below (<=>): a plain `on=part_col` silently
        # drops NULL-part documents (equi-joins never match NULL keys),
        # but the single-window semantics this rewrite replicates pack
        # NULL as its own partition group — losing training data
        # silently is the worst possible failure mode here.
        bounds = toks.groupBy(part_col).agg(
            F.percentile_approx(id_col, fracs).alias("_bounds")
        ).select(F.col(part_col).alias("_bpart"), "_bounds")

        def _lt_id(b):
            return b < F.col(id_col)

        assigned = toks.join(
            F.broadcast(bounds),
            on=F.col(part_col).eqNullSafe(F.col("_bpart")),
        ).withColumn(
            "_chunk", F.size(F.filter("_bounds", _lt_id))
        ).drop("_bpart", "_bounds")
    w1 = (
        Window.partitionBy(part_col, "_chunk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = assigned.withColumn(
        "_wprev", F.coalesce(F.sum("n_tokens").over(w1), F.lit(0))
    )
    totals = assigned.groupBy(part_col, "_chunk").agg(
        F.sum("n_tokens").alias("_ct")
    )
    wc = (
        Window.partitionBy(part_col)
        .orderBy(F.col("_chunk").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = totals.select(
        F.col(part_col).alias("_cpart"),
        F.col("_chunk").alias("_cchunk"),
        F.coalesce(F.sum("_ct").over(wc), F.lit(0)).alias("_cbase"),
    )
    with_prev = within.join(
        base,
        on=F.col(part_col).eqNullSafe(F.col("_cpart"))
        & F.col("_chunk").eqNullSafe(F.col("_cchunk")),
    ).withColumn("_prev", F.col("_cbase") + F.col("_wprev"))
    return with_prev.select(
        id_col,
        part_col,
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.expr(f"_prev div {int(max_len)}").alias("pack_no"),
        F.pmod("_prev", F.lit(int(max_len))).cast("bigint").alias("pack_offset"),
    )
