"""Unit/edge coverage for operators/corpus_ops.py (the cross-engine hash
gate lives in test_suite_oracle.py via the corpus_* suite entries)."""

import pytest
from pyspark.sql import functions as F

from duckdb_ann_spark.operators.corpus_ops import (
    HASH_BUCKETS,
    connected_components,
    domain_sample,
    hash_split,
    ngram_decontaminate,
    pack_sequences,
    pii_scrub,
    repetition_stats,
)


@pytest.fixture(scope="module")
def rep_df(spark):
    rows = [
        # 4 lines of 8 chars, 'dup line' twice -> 2/4 dup lines, 16/32 chars
        (0, "dup line\nunique a\ndup line\nunique b"),
        (1, ""),  # empty doc: n_lines 0, every ratio NULL
        (2, "no repeats here at all"),
        # tokens a b a b a -> 2-grams: [a b, b a, a b, b a] all dup
        (3, "a b a b a"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_known_values(rep_df):
    out = {
        r["doc_id"]: r
        for r in repetition_stats(rep_df, "doc_id", "text").collect()
    }
    r0 = out[0]
    assert r0["n_lines"] == 4
    assert r0["dup_line_frac"] == 2 / 4
    assert r0["dup_line_char_frac"] == 16 / 32
    r1 = out[1]
    assert r1["n_lines"] == 0
    assert r1["dup_line_frac"] is None
    assert r1["dup_2gram_frac"] is None
    r2 = out[2]
    assert r2["dup_line_frac"] == 0.0
    assert r2["dup_2gram_frac"] == 0.0
    r3 = out[3]
    assert r3["dup_2gram_frac"] == 1.0
    # top 2-gram 'a b' covers 2 runs x 3 chars of 4x3 total chars
    assert r3["top_2gram_char_frac"] == 6 / 12


def test_repetition_is_shuffle_free(rep_df):
    """The Gopher filters must not explode documents into per-n-gram
    rows: the plan is a pure projection (no Exchange)."""
    plan = repetition_stats(rep_df, "doc_id", "text")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan


def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (0, "mail a@b.co and c.d@e-f.org, ip 10.0.0.1, ph 555-123-4567"),
            (1, "clean text"),
            (2, "ips 1.2.3.4 5.6.7.8"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scrub(df, "doc_id", "text").collect()}
    assert (out[0]["n_emails"], out[0]["n_ips"], out[0]["n_phones"]) == (2, 1, 1)
    assert out[0]["text_clean"] == (
        "mail <EMAIL> and <EMAIL>, ip <IP>, ph <PHONE>"
    )
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (0, 0, 0)
    assert out[1]["text_clean"] == "clean text"
    assert out[2]["n_ips"] == 2 and out[2]["text_clean"] == "ips <IP> <IP>"


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.range(0, 1000).withColumnRenamed("id", "doc_id")


def test_hash_split_assigns_all_and_is_deterministic(ids_df):
    out = hash_split(ids_df, "doc_id", (0.8, 0.1, 0.1))
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 1000
    # md5 buckets are uniform; 1000 draws stay well inside 5 sigma
    assert 700 <= counts["train"] <= 900
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0
    again = hash_split(ids_df, "doc_id", (0.8, 0.1, 0.1))
    assert out.exceptAll(again).count() == 0


def test_hash_split_validates(ids_df):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(ids_df, "doc_id", (0.5, 0.1), names=("a", "b"))
    with pytest.raises(ValueError, match="align"):
        hash_split(ids_df, "doc_id", (0.5, 0.5), names=("only",))


def test_domain_sample_rates(spark):
    df = spark.range(0, 600).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "keep_all")
        .when(F.col("id") % 3 == 1, "drop_all")
        .otherwise("half")
        .alias("source"),
    )
    out = domain_sample(
        df, "doc_id", "source", {"keep_all": 1.0, "drop_all": 0.0, "half": 0.5}
    )
    kept = {r["source"]: r["n"] for r in
            out.where("mix_keep").groupBy("source")
            .agg(F.count("*").alias("n")).collect()}
    assert kept.get("keep_all") == 200
    assert "drop_all" not in kept
    assert 60 <= kept.get("half", 0) <= 140


def test_domain_sample_nonrepresentable_rate(spark):
    """rate * 10000 is non-integral in doubles for ~11% of rates
    (0.0003 * 10000 = 2.9999...96); the threshold must be rounded in
    Python, not cast engine-side (Spark truncates, DuckDB rounds)."""
    from duckdb_ann_spark.operators.corpus_ops import _rate_threshold

    assert _rate_threshold(0.0003) == 3
    df = spark.range(0, 10000).select(
        F.col("id").alias("doc_id"), F.lit("d").alias("source")
    )
    out = domain_sample(df, "doc_id", "source", {"d": 0.0003})
    kept = out.where("mix_keep").count()
    # buckets are ~uniform over [0, 10000): threshold 3 keeps ~3 rows
    # (binomial n=10000 p=3/10000, generous bounds), not ~2
    assert 0 < kept <= 12


def test_stratified_sample_exact_counts(spark):
    from duckdb_ann_spark.operators.corpus_ops import stratified_sample

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "big")
        .when(F.col("id") % 3 == 1, "big2")
        .otherwise("small")
        .alias("source"),
    ).where((F.col("source") != "small") | (F.col("doc_id") < 9))
    out = stratified_sample(df, "doc_id", "source", 20)
    kept = {r["source"]: r["n"] for r in
            out.where("strat_keep").groupBy("source")
            .agg(F.count("*").alias("n")).collect()}
    # exact k per domain; a domain smaller than k keeps everything
    assert kept == {"big": 20, "big2": 20, "small": 3}
    again = stratified_sample(df, "doc_id", "source", 20)
    assert out.exceptAll(again).count() == 0
    with pytest.raises(ValueError, match=">= 0"):
        stratified_sample(df, "doc_id", "source", -1)


def test_stratified_sample_null_domain_rows_survive(spark):
    """Round-7 regression (advice): the two-level rewrite's equi-join
    dropped NULL-domain rows. NULL is its own domain group, exactly as
    the single-window `Window.partitionBy(domain)` semantics had it, and
    the operator's contract is to ADD strat_keep, never to filter."""
    from duckdb_ann_spark.operators.corpus_ops import stratified_sample

    df = spark.createDataFrame(
        [(0, "a"), (1, None), (2, "a"), (3, None), (4, None), (5, "b")],
        "doc_id long, source string",
    )
    out = stratified_sample(df, "doc_id", "source", 2)
    rows = out.collect()
    assert len(rows) == 6  # no row loss
    kept = {r["source"]: 0 for r in rows}
    for r in rows:
        kept[r["source"]] += int(r["strat_keep"])
    # exactly min(k, |group|) kept per group, NULL included
    assert kept == {"a": 2, None: 2, "b": 1}


def test_pack_sequences_null_part_rows_survive(spark):
    """Round-7 regression (advice): both rewrite joins (broadcast chunk
    bounds + rebase) dropped NULL-part documents. NULL packs as its own
    partition group, like the single-window version."""
    df = spark.createDataFrame(
        [
            (0, None, "a b c"),
            (1, None, "a b c d"),
            (2, None, "a b c d e"),
            (3, "t", "x y"),
        ],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in
           pack_sequences(df, "doc_id", "source", "text", max_len=6).collect()}
    assert len(out) == 4  # no row loss
    assert (out[0]["pack_no"], out[0]["pack_offset"]) == (0, 0)
    assert (out[1]["pack_no"], out[1]["pack_offset"]) == (0, 3)
    assert (out[2]["pack_no"], out[2]["pack_offset"]) == (1, 1)
    assert (out[3]["pack_no"], out[3]["pack_offset"]) == (0, 0)


def test_connected_components_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        # a 6-node chain (needs several propagation rounds) + a 2-island
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)],
        "id_a long, id_b long",
    )
    comps = {
        r["node"]: r["component_id"]
        for r in connected_components(pairs, "id_a", "id_b").collect()
    }
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 10: 10, 11: 10}


def test_connected_components_empty(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs, "id_a", "id_b").count() == 0


def test_connected_components_long_chain_and_random(spark):
    """A 120-edge chain (diameter 120 — min-label propagation would need
    120 rounds and silently time out at max_iter=50) plus a random
    60-edge graph and a self-pair, validated against a driver-side
    union-find reference. Star contraction must converge well inside the
    default round budget."""
    import random

    chain = [(i, i + 1) for i in range(200, 320)]
    rng = random.Random(7)
    extra = [(rng.randrange(80), rng.randrange(80)) for _ in range(60)]
    allp = chain + [(a, b) for a, b in extra if a != b] + [(500, 500)]
    df = spark.createDataFrame(allp, "id_a long, id_b long")
    got = {r["node"]: r["component_id"]
           for r in connected_components(df, "id_a", "id_b").collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in allp:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union-by-min so every root is its component's minimum
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want


def test_ngram_decontaminate_flags_overlap(spark):
    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),  # contains bench gram
            (1, "totally different words in this one here"),
            (2, "short doc"),  # < 5 tokens: no n-grams, never flagged
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon",)], "text string"
    )
    out = {r["doc_id"]: r["n_hit_ngrams"]
           for r in ngram_decontaminate(df, "doc_id", "text", bench, "text",
                                        n=5).collect()}
    assert out == {0: 1}


def test_decontaminate_short_benchmark_rows(spark):
    """A benchmark row shorter than n matches on its whole token
    sequence (the GPT-3 'use the whole example' rule) instead of being
    silently unmatchable."""
    df = spark.createDataFrame(
        [
            (0, "padding words then the answer is forty two appears here"),
            (1, "completely unrelated content in this document row"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("the answer is forty two",)], "text string"  # 5 tokens < n=13
    )
    out = {r["doc_id"]: r["n_hit_ngrams"]
           for r in ngram_decontaminate(df, "doc_id", "text", bench, "text",
                                        n=13).collect()}
    assert out == {0: 1}


def test_hash_split_rejects_empty_quantized_split(spark):
    from duckdb_ann_spark.operators.corpus_ops import hash_split

    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="empty split"):
        hash_split(df, "doc_id", (0.99994, 0.00003, 0.00003))


def test_bucket_salt_validated(spark):
    from duckdb_ann_spark.operators.corpus_ops import hash_split

    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="salt must match"):
        hash_split(df, "doc_id", salt="it's")


def test_ngram_jaccard_tolerates_ids_only_kwarg(spark):
    from duckdb_ann_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d e f")], "doc_id long, text string"
    )
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5,
                                ids_only=True)
    assert pairs.count() == 1


def test_pack_sequences_known_packing(spark):
    df = spark.createDataFrame(
        [
            # source s: 3+4+5 tokens, max_len 6:
            # doc0 prev=0 pack0 off0; doc1 prev=3 pack0 off3;
            # doc2 prev=7 pack1 off1
            (0, "s", "a b c"),
            (1, "s", "a b c d"),
            (2, "s", "a b c d e"),
            # independent stream per source
            (3, "t", "x y"),
        ],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in
           pack_sequences(df, "doc_id", "source", "text", max_len=6).collect()}
    assert (out[0]["pack_no"], out[0]["pack_offset"]) == (0, 0)
    assert (out[1]["pack_no"], out[1]["pack_offset"]) == (0, 3)
    assert (out[2]["pack_no"], out[2]["pack_offset"]) == (1, 1)
    assert (out[3]["pack_no"], out[3]["pack_offset"]) == (0, 0)
    assert out[2]["n_tokens"] == 5


def test_plan_shapes(spark):
    """The scale contracts as plan assertions: sampling/scrub are pure
    projections (no Exchange); packing and stratified sampling window
    WITH a partition spec (never the single-partition global window
    Spark warns about)."""
    from duckdb_ann_spark.operators.corpus_ops import (
        hash_split, pack_sequences, stratified_sample,
    )

    df = spark.createDataFrame(
        [(0, "s", "a b c")], "doc_id long, source string, text string"
    )

    def plan(d):
        return d._jdf.queryExecution().executedPlan().toString()

    p = plan(domain_sample(hash_split(df, "doc_id"), "doc_id", "source", {}))
    assert "Exchange" not in p
    p = plan(pii_scrub(df, "doc_id", "text"))
    assert "Exchange" not in p and "EvalPython" not in p

    for windowed in (
        pack_sequences(df, "doc_id", "source", "text", 64),
        stratified_sample(df, "doc_id", "source", 5),
    ):
        p = plan(windowed)
        assert "Window" in p
        # a partitioned window exchanges on the domain key; a global
        # window would exchange to SinglePartition instead
        assert "hashpartitioning(source" in p, p
        assert "SinglePartition" not in p, p


def test_pack_sequences_validates(spark):
    df = spark.createDataFrame([(0, "s", "a")],
                               "doc_id long, source string, text string")
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(df, "doc_id", "source", "text", max_len=0)


def test_ops_with_hostile_column_names(spark):
    """Operators assemble SQL strings; column names with spaces/dashes
    must round-trip through quote_ident instead of parsing as
    arithmetic."""
    from duckdb_ann_spark.operators.corpus_ops import (
        hash_split, pack_sequences,
    )

    df = spark.createDataFrame(
        [(0, "s", "dup line\ndup line"), (1, "s", "x y")],
        "doc_id long, source string, text string",
    ).withColumnRenamed("doc_id", "doc-id").withColumnRenamed(
        "text", "text body"
    )
    rep = {r["doc-id"]: r for r in
           repetition_stats(df, "doc-id", "text body").collect()}
    assert rep[0]["dup_line_frac"] == 1.0
    assert pii_scrub(df, "doc-id", "text body").count() == 2
    assert hash_split(df, "doc-id").count() == 2
    out = pack_sequences(df, "doc-id", "source", "text body", 64).collect()
    assert len(out) == 2
    bench = spark.createDataFrame([("dup line dup line none here pad",)],
                                  "`b text` string")
    flagged = ngram_decontaminate(df, "doc-id", "text body", bench,
                                  "b text", n=2)
    assert flagged.count() >= 1


def test_all_ops_survive_empty_input(spark):
    """Every corpus operator degrades to an empty (or all-false-flag)
    result on an empty corpus — no crashes anywhere in the chain."""
    from duckdb_ann_spark.operators.corpus_ops import (
        hash_split, pack_sequences, stratified_sample,
    )

    empty = spark.createDataFrame(
        [], "doc_id long, source string, text string"
    )
    bench = spark.createDataFrame([("alpha beta gamma delta epsilon",)],
                                  "text string")
    assert repetition_stats(empty, "doc_id", "text").count() == 0
    assert pii_scrub(empty, "doc_id", "text").count() == 0
    assert hash_split(empty, "doc_id").count() == 0
    assert domain_sample(empty, "doc_id", "source", {"a": 0.5}).count() == 0
    assert stratified_sample(empty, "doc_id", "source", 3).count() == 0
    assert pack_sequences(empty, "doc_id", "source", "text", 64).count() == 0
    assert ngram_decontaminate(empty, "doc_id", "text", bench, "text",
                               n=5).count() == 0
    # empty BENCHMARK: nothing is ever flagged
    docs = spark.createDataFrame([(0, "s", "alpha beta gamma delta epsilon")],
                                 "doc_id long, source string, text string")
    assert ngram_decontaminate(docs, "doc_id", "text",
                               empty.select("text"), "text", n=5).count() == 0


def test_domain_sample_rejects_out_of_range_rate(spark):
    from duckdb_ann_spark.operators.corpus_ops import domain_sample

    df = spark.createDataFrame([(0, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match=r"rate must be in \[0, 1\]"):
        domain_sample(df, "doc_id", "source", {"a": 25.0})
    with pytest.raises(ValueError, match=r"rate must be in \[0, 1\]"):
        domain_sample(df, "doc_id", "source", {"a": 0.5}, default_rate=-1.0)


def test_decontaminate_bench_size_guard(spark, monkeypatch):
    """Round-6 guard: a broadcast benchmark past MAX_BENCH_ROWS raises
    and names the broadcast_benchmark=False escape hatch, which still
    produces the same result via the shuffle join."""
    import duckdb_ann_spark.operators.corpus_ops as co

    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(f"alpha beta gamma delta epsilon {i}",) for i in range(5)],
        "text string",
    )
    monkeypatch.setattr(co, "MAX_BENCH_ROWS", 3)
    with pytest.raises(ValueError, match="broadcast_benchmark=False"):
        ngram_decontaminate(df, "doc_id", "text", bench, "text", n=5)
    out = {r["doc_id"]: r["n_hit_ngrams"]
           for r in ngram_decontaminate(df, "doc_id", "text", bench, "text",
                                        n=5, broadcast_benchmark=False)
           .collect()}
    assert out == {0: 1}


def test_decontaminate_single_corpus_scan(spark, sf_dir):
    """Round-6 advice fix: short benchmark rows must NOT multiply corpus
    scans — all needed gram lengths ride one tagged-digest array, so the
    plan scans the documents parquet exactly once."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon",), ("two tokens",), ("one",)],
        "text string",
    )
    plan = (
        ngram_decontaminate(docs, "doc_id", "text", bench, "text", n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1, plan
