"""Randomized reference tests: the corpus_ops SQL expression trees vs
plain-Python reimplementations of the same semantics, over seeded random
documents engineered to hit duplicates, empties, and boundary shapes.

All cases go through ONE Spark job per operator (a single createDataFrame
+ collect), so the battery stays seconds-fast while covering ~100 random
documents per run."""

import random
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from duckdb_ann_spark.operators.corpus_ops import (
    pack_sequences,
    repetition_stats,
)

SEED = 20260814


def _random_docs(n: int = 100) -> list[tuple[int, str]]:
    rng = random.Random(SEED)
    words = [f"w{i}" for i in range(12)]  # tiny alphabet → natural dups
    docs = []
    for i in range(n):
        n_lines = rng.randint(0, 6)
        lines = []
        for _ in range(n_lines):
            n_toks = rng.randint(0, 8)
            lines.append(" ".join(rng.choice(words) for _ in range(n_toks)))
        if rng.random() < 0.4 and lines:
            # planted duplicate line
            lines.append(rng.choice(lines))
        text = "\n".join(lines)
        if rng.random() < 0.1:
            text = ""
        docs.append((i, text))
    return docs


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _ngrams(toks: list[str], n: int) -> list[str]:
    return [" ".join(toks[i:i + n]) for i in range(max(len(toks) - n + 1, 0))]


def _rep_ref(items: list[str]) -> dict:
    """Python reference for the _rep_counts semantics."""
    items = [x for x in items if x != ""]
    n = len(items)
    if n == 0:
        return dict(n=0, dup=0, dup_chars=0, chars=0, top_run=0, top_chars=0)
    c = Counter(items)
    dup = sum(v for v in c.values() if v > 1)
    chars = sum(len(x) for x in items)
    dup_chars = sum(len(x) * v for x, v in c.items() if v > 1)
    top_run = max(c.values())
    # ties resolve to the bytewise-smallest value (sorted-array argmax)
    top_val = min(x for x, v in c.items() if v == top_run)
    return dict(n=n, dup=dup, dup_chars=dup_chars, chars=chars,
                top_run=top_run, top_chars=top_run * len(top_val))


def _ratio(a: int, b: int):
    return a / b if b else None


def _expected_rep(text: str) -> tuple:
    lines = [ln.strip() for ln in text.split("\n") if ln.strip() != ""]
    lc = _rep_ref(lines)
    toks = _tokens(text)
    g2 = _rep_ref(_ngrams(toks, 2))
    g3 = _rep_ref(_ngrams(toks, 3))
    return (
        lc["n"],
        _ratio(lc["dup"], lc["n"]),
        _ratio(lc["dup_chars"], lc["chars"]),
        _ratio(g2["dup"], g2["n"]),
        _ratio(g3["dup"], g3["n"]),
        _ratio(g2["top_chars"], g2["chars"]),
    )


def test_repetition_stats_vs_python_reference(spark):
    docs = _random_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_lines"], r["dup_line_frac"], r["dup_line_char_frac"],
            r["dup_2gram_frac"], r["dup_3gram_frac"],
            r["top_2gram_char_frac"],
        )
        for r in repetition_stats(df, "doc_id", "text").collect()
    }
    for i, text in docs:
        assert got[i] == _expected_rep(text), (i, text, got[i],
                                               _expected_rep(text))


def test_pack_sequences_vs_python_reference(spark):
    rng = random.Random(SEED + 1)
    rows = [
        (i, f"src{rng.randint(0, 3)}",
         " ".join("tok" for _ in range(rng.randint(0, 30))))
        for i in range(120)
    ]
    max_len = 16
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["doc_id"]: (r["source"], r["n_tokens"], r["pack_no"],
                         r["pack_offset"])
           for r in pack_sequences(df, "doc_id", "source", "text",
                                   max_len=max_len).collect()}
    # python reference: per-source id-ordered greedy cumsum binning
    by_src: dict[str, list[tuple[int, int]]] = {}
    for i, src, text in rows:
        by_src.setdefault(src, []).append((i, len(_tokens(text))))
    want = {}
    for src, docs in by_src.items():
        prev = 0
        for i, nt in sorted(docs):
            want[i] = (src, nt, prev // max_len, prev % max_len)
            prev += nt
    assert got == want
    # invariants: offsets within budget; pack ids non-decreasing per src
    for src, docs in by_src.items():
        packs = [got[i][2] for i, _ in sorted(docs)]
        assert packs == sorted(packs)
    assert all(0 <= off < max_len for _, _, _, off in got.values())


def test_hash_split_partition_of_corpus(spark):
    """Splits partition the corpus: every row lands in exactly one split
    regardless of fraction shape, and quantization errors never drop a
    row (edges computed cumulatively)."""
    from duckdb_ann_spark.operators.corpus_ops import hash_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", (1 / 3, 1 / 3, 1 / 3))
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert set(counts) == {"train", "val", "test"}
    for v in counts.values():
        assert 530 <= v <= 800  # ~uniform thirds at n=2000


def test_pack_sequences_skewed_domain_matches_reference(spark):
    """Round-6 two-level packing: a 90%-one-domain corpus (the Zipfian
    shape that serialized the old single window) with sparse,
    non-contiguous ids must still produce the exact single-stream
    prefix sums — chunk boundaries from percentile_approx only move
    work between tasks, never values."""
    rng = random.Random(SEED + 7)
    ids = rng.sample(range(10_000_000), 2000)
    rows = [
        (i, "web" if j % 10 else "rare",
         " ".join("tok" for _ in range(rng.randint(0, 9))))
        for j, i in enumerate(ids)
    ]
    max_len = 16
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["doc_id"]: (r["source"], r["n_tokens"], r["pack_no"],
                         r["pack_offset"])
           for r in pack_sequences(df, "doc_id", "source", "text",
                                   max_len=max_len, chunks=8).collect()}
    by_src: dict[str, list[tuple[int, int]]] = {}
    for i, src, text in rows:
        by_src.setdefault(src, []).append((i, len(_tokens(text))))
    want = {}
    for src, docs in by_src.items():
        prev = 0
        for i, nt in sorted(docs):
            want[i] = (src, nt, prev // max_len, prev % max_len)
            prev += nt
    assert got == want


def test_stratified_sample_skewed_domain_matches_reference(spark):
    """Round-6 two-level rank: strat_keep on a 90%-one-domain corpus
    equals the single-window (bucket, id) rank rule exactly."""
    from duckdb_ann_spark.operators.corpus_ops import (
        bucket_sql,
        stratified_sample,
    )

    rng = random.Random(SEED + 8)
    ids = rng.sample(range(10_000_000), 1500)
    rows = [(i, "web" if j % 10 else "rare") for j, i in enumerate(ids)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    k = 40
    got = {r["doc_id"]: r["strat_keep"]
           for r in stratified_sample(df, "doc_id", "source", k).collect()}
    # independent reference: compute each row's bucket via the same SQL
    # fragment (one scalar projection), then rank in python
    buckets = {
        r["doc_id"]: r["b"]
        for r in df.selectExpr(
            "doc_id", f"{bucket_sql('spark', 'doc_id', 'strat')} AS b"
        ).collect()
    }
    by_src: dict[str, list[tuple[int, int]]] = {}
    for i, src in rows:
        by_src.setdefault(src, []).append((buckets[i], i))
    want = {}
    for src, members in by_src.items():
        for rank, (_, i) in enumerate(sorted(members), start=1):
            want[i] = rank <= k
    assert got == want
