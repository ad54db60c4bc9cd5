"""Deduplication operators for large-scale training-data pipelines.

Five families, all shuffle-bounded (no all-pairs crossJoin anywhere):

* :func:`dedup_exact` — hash-groupBy on normalized text; cluster id =
  min doc id. One shuffle on a fixed-width digest.
* :func:`minhash_signatures` / :func:`minhash_candidate_pairs` —
  word-shingle MinHash with banded LSH: pairs meet only inside a band
  bucket, so the shuffle is O(n·bands) and the pair set is the classic
  LSH candidate set. Each shingle is hashed ONCE (md5 → first 32 bits);
  the signature components are affine derivations ``(a_j*h + b_j) mod p``
  of that one hash (Broder's universal-hash min-wise scheme — the same
  structure Spark ML's MinHashLSH uses), so signature cost is one md5
  per shingle instead of n_hashes of them. All arithmetic is 64-bit
  integer → bitwise identical in Spark and DuckDB (oracle
  hash-matchable).
* :func:`ngram_jaccard_pairs` — exact shingle-set Jaccard computed only
  for LSH candidates (verification step after banding).
* :func:`simhash` / :func:`simhash_pairs` — 32-bit SimHash over token
  md5 prefixes; near-dups have small Hamming distance, and the pair
  generator finds ALL pairs within `max_hamming` bits exactly (band
  equi-join by the pigeonhole principle + popcount verification).
* :func:`embedding_near_dup_pairs` — random-hyperplane (sign) LSH
  buckets over an embedding column, exact cosine verification within
  buckets. The bucketed join is the 100 TB path; brute force is only
  used by tests as the recall oracle.

Defaults: 12 minhash permutations in 4 bands of 3, 3-word shingles.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import track_caches
from ..functions.expr import bind_once as _bind
from ..functions.text import spark_sql_tokenize, sql_bind_once
from ..local import widen_if_narrow

N_HASHES = 12
N_BANDS = 4
SHINGLE_WORDS = 3

# Affine min-wise hashing: component j = min over shingles of
# (a_j*h + b_j) mod MINHASH_PRIME, where h is the shingle's 32-bit hash.
# Bounds keep the arithmetic exactly representable in signed 64-bit on
# both engines: h < 2^32, a < 2^30 → a*h + b < 2^63.
MINHASH_PRIME = 4_294_967_291  # largest prime < 2^32
# Frozen literals (odd a in [1, 2^30), b in [0, PRIME)) — originally
# drawn from default_rng(1337) but pinned as constants: NumPy's
# compatibility policy allows Generator streams to change across
# versions, and persisted signatures must stay comparable across
# environments.
MINHASH_COEFFS: list[tuple[int, int]] = [
    (586611233, 256679336), (942854737, 832071153),
    (780617357, 708693735), (199209131, 1467750085),
    (580040769, 1187820521), (988809335, 2129405699),
    (420395769, 2426415130), (1016367357, 3858475059),
    (310853819, 1027655057), (938995913, 27739557),
    (495735179, 2241753832), (124277845, 976724811),
]
if len(MINHASH_COEFFS) != N_HASHES:  # not assert: must survive python -O
    raise RuntimeError(
        "MINHASH_COEFFS must hold exactly N_HASHES frozen pairs; "
        "extending N_HASHES requires appending new literal coefficients"
    )

__all__ = [
    "dedup_exact",
    "shingles",
    "minhash_signatures",
    "band_keys_from_signatures",
    "minhash_candidate_pairs",
    "publish_minhash_signatures",
    "published_band_keys",
    "minhash_pairs_incremental",
    "dedup_incremental",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_pairs",
    "embedding_near_dup_pairs",
]


def dedup_exact(
    df: DataFrame, id_col: str, text_col: str, normalize: bool = True
) -> DataFrame:
    """→ (id, cluster_id, is_duplicate): rows with identical (normalized)
    text share the cluster of their smallest id.

    Scale: groups on a 256-bit digest of the text, so the shuffle carries
    (id, 64-byte key) — never the document bodies."""
    norm = F.lower(F.trim(F.col(text_col))) if normalize else F.col(text_col)
    keyed = df.select(F.col(id_col), F.sha2(norm, 256).alias("_key"))
    clusters = keyed.groupBy("_key").agg(F.min(id_col).alias("cluster_id"))
    return (
        keyed.join(clusters, on="_key")
        .select(
            id_col,
            "cluster_id",
            (F.col(id_col) != F.col("cluster_id")).alias("is_duplicate"),
        )
    )


def shingle_body_sql(n: int = SHINGLE_WORDS) -> str:
    """n-word shingles over a BOUND token array named `toks` (whole text
    when shorter)."""
    elems = ", ".join(f"element_at(toks, i + {j})" for j in range(n))
    return (
        f"case when size(toks) < {n} then array(concat_ws(' ', toks)) "
        f"else transform(sequence(1, size(toks) - {n - 1}), "
        f"i -> concat_ws(' ', {elems})) end"
    )


def shingle_sql(text_col: str, n: int = SHINGLE_WORDS) -> str:
    """Spark SQL fragment: array<string> of n-word shingles (the whole
    text when shorter), over ONE bound tokenize evaluation. Assembled as
    a string so the deep HOF tree parses JVM-side in one py4j call (the
    per-node Column builders cost seconds of driver time per plan)."""
    return sql_bind_once(
        spark_sql_tokenize(text_col), "toks", shingle_body_sql(n)
    )


def shingles(text_col: str, n: int = SHINGLE_WORDS) -> Column:
    """array<string> of n-word shingles (the whole text when shorter)."""
    return F.expr(shingle_sql(text_col, n))


def signature_sql(text_col: str, n_hashes: int = N_HASHES,
                  shingle_words: int = SHINGLE_WORDS) -> str:
    """Spark SQL fragment: the MinHash signature array<bigint>.

    The shingle array AND the per-shingle hash array are bound once
    (`element_at(transform(array(..)), 1)` — the SQL spelling of
    `bind_once`) so the n_hashes components share ONE evaluation of
    each; every component is a cheap integer transform of the shared
    hash array. One md5 per shingle, total."""
    return sql_bind_once(
        spark_sql_tokenize(text_col), "toks",
        signature_body_sql(n_hashes, shingle_words),
    )


def signature_body_sql(n_hashes: int = N_HASHES,
                       shingle_words: int = SHINGLE_WORDS) -> str:
    """The MinHash signature over a BOUND token array named `toks` —
    lets callers that already tokenize per row (prepare_corpus' fused
    annotate pass) compute the signature in the SAME evaluation instead
    of re-tokenizing the corpus."""
    if n_hashes > len(MINHASH_COEFFS):
        raise ValueError(f"n_hashes must be <= {len(MINHASH_COEFFS)}")
    comps = ", ".join(
        f"array_min(transform(hs, h -> pmod(h * {a} + {b}, {MINHASH_PRIME})))"
        for a, b in MINHASH_COEFFS[:n_hashes]
    )
    hs = (
        "transform(s, x -> "
        "cast(conv(substring(md5(x), 1, 8), 16, 10) as bigint))"
    )
    return sql_bind_once(
        shingle_body_sql(shingle_words), "s",
        sql_bind_once(hs, "hs", f"array({comps})"),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = N_HASHES,
    shingle_words: int = SHINGLE_WORDS,
) -> DataFrame:
    """→ (id, sig array<bigint>[n_hashes]) — one narrow pass, no shuffle.

    The whole signature expression is assembled as ONE SQL string
    (:func:`signature_sql`): the per-node Column builders paid ~1s of
    py4j round-trips per plan for this tree alone."""
    sig = F.expr(signature_sql(text_col, n_hashes, shingle_words))
    return df.select(F.col(id_col), sig.alias("sig"))


# Band-key derivation version, recorded in published signature-artifact
# manifests (round 14). v2 = xxhash64 BIGINT keys; v1 (pre-round-14) was
# a 32-hex md5 string — 4x the key bytes through every band shuffle and
# a string compare in every bucket join, measured -15% on the sf0.1
# candidate-pairs leg. Bumping the version makes v1 artifacts fail LOUD
# in `published_band_keys` (re-publish) instead of silently joining
# zero pairs against v2 delta keys.
BAND_KEY_VERSION = 2


def band_keys_from_signatures(
    sigs: DataFrame,
    id_col: str,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """(id, sig) → (id, band, bkey): one BIGINT LSH bucket key per band
    (xxhash64 over the band's signature slice — same-slice → same-key,
    which is all the bucket join consumes; the DuckDB oracle derives its
    own equality keys from the same slices, so pair SETS are identical).
    Shared by the batch pair generator and the streaming near-dedup —
    both sides MUST derive keys identically or stream-vs-batch dedup
    decisions diverge (BAND_KEY_VERSION pins this for published
    artifacts)."""
    r = n_hashes // n_bands

    def band_keys(s: Column) -> Column:
        # s is the bound signature array: the n_bands keys share one
        # evaluation instead of re-inlining the signature expression
        return F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[s[b * r + i] for i in range(r)]).alias("bkey"),
            )
            for b in range(n_bands)
        ])

    return sigs.select(
        F.col(id_col),
        F.explode(_bind(F.col("sig"), band_keys)).alias("bk"),
    ).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    )


def _candidate_pairs(
    bands: DataFrame,
    id_col: str,
    key_cols: list[str],
    carry: dict[str, str] | None = None,
) -> DataFrame:
    """Shared LSH candidate self-join used by every near-dup family
    (MinHash bands, hyperplane buckets, SimHash bands): (id, *keys
    [, *carry]) → distinct (id_a, id_b[, <carry>_a, <carry>_b]) with
    id_a < id_b. Pairs form ONLY inside key buckets — the one shape that
    keeps all three families crossJoin-free — and the join/distinct move
    fixed-width rows (ids + carried scalars), never vectors/signatures."""
    carry = carry or {}
    a = bands.select(
        F.col(id_col).alias("id_a"), *key_cols,
        *[F.col(c).alias(f"{al}_a") for c, al in carry.items()],
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), *key_cols,
        *[F.col(c).alias(f"{al}_b") for c, al in carry.items()],
    )
    return (
        a.join(b, on=key_cols)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            *[f"{al}_a" for al in carry.values()],
            *[f"{al}_b" for al in carry.values()],
        )
        .distinct()
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    shingle_words: int = SHINGLE_WORDS,
    widen: bool = True,
    ids_only: bool = False,
    sig_col: str | None = None,
    cache_sigs: bool | None = None,
) -> DataFrame:
    """→ (id_a, id_b, est_jaccard) for pairs sharing >=1 LSH band bucket
    (id_a < id_b). est_jaccard = matching signature fraction.
    ``widen=False`` skips the narrow-input probe when the caller already
    guaranteed a wide input (avoids a redundant plan compile).
    ``ids_only=True`` returns just (id_a, id_b) and SKIPS the two
    signature joins est_jaccard needs — callers that re-verify with
    exact Jaccard (ngram_jaccard_pairs, the pipeline) never read the
    estimate, and Catalyst can't prune a join it can't prove 1:1.
    ``sig_col`` names a PRECOMPUTED signature column (array<bigint>,
    built with signature_body_sql under the same n_hashes/shingle_words)
    — a caller that already tokenizes per row (prepare_corpus' fused
    annotate) skips the whole tokenize→shingle→hash pass here."""
    if sig_col is not None:
        # precomputed signatures: a narrow projection of the caller's
        # frame. The signature table is consumed up to four times (see
        # below), so an UNPERSISTED sig_col input would re-run the
        # caller's whole upstream plan per consumer. `cache_sigs` is the
        # caching contract: None (default) persists exactly when this
        # frame isn't already persisted; a caller whose cache lives
        # UPSTREAM of a projection (prepare_corpus persists the annotate
        # table, then projects) passes False to keep the round-6 fix —
        # duplicate blocks never accumulate in long sessions.
        sigs = df.select(F.col(id_col), F.col(sig_col).alias("sig"))
        if cache_sigs is None:
            cache_sigs = not (
                df.storageLevel.useMemory or df.storageLevel.useDisk
            )
        if cache_sigs:
            sigs = sigs.persist()
    else:
        # signatures are the heavy per-row expression chain (tokenize →
        # shingle → hash); don't let a single-file input serialize them
        sigs = minhash_signatures(
            widen_if_narrow(df) if widen else df,
            id_col, text_col, n_hashes, shingle_words,
        )
        # the signature table is consumed up to FOUR times (two
        # band-join branches + two est-jaccard joins): persist it so
        # the tokenize→shingle→minhash pipeline runs once — at scale
        # this is the "write the signature table, then band it"
        # structure every production LSH pipeline uses. The persisted
        # projection is (id, 12 bigints): a small fixed fraction of the
        # corpus, MEMORY_AND_DISK-evictable. It stays referenced by the
        # returned plan, so it cannot be unpersisted here — callers
        # that loop should spark.catalog.clearCache() (or unpersist)
        # after materializing their output, as bench.py does.
        sigs = sigs.persist()
    bands = band_keys_from_signatures(sigs, id_col, n_hashes, n_bands)

    # pairs carry only ids through the band join + distinct (signature
    # arrays ride along in neither the shuffle nor the dedupe); the
    # est-jaccard join pulls signatures back for just the candidate set
    pairs = _candidate_pairs(bands, id_col, ["band", "bkey"])
    if ids_only:
        return track_caches(pairs, sigs)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda m: m,
            )
        ).cast("double")
        / F.lit(float(n_hashes))
    )
    return track_caches(
        pairs.join(sa, on="id_a")
        .join(sb, on="id_b")
        .select("id_a", "id_b", est.alias("est_jaccard")),
        sigs,
    )


def publish_minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    output_path: str,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    shingle_words: int = SHINGLE_WORDS,
) -> None:
    """Write a corpus' MinHash signature artifact — the PAY-ONCE half of
    incremental near-dedup (the `index_knn_join` discipline applied to
    the text side: a 100-TB corpus deduped against daily deltas must
    not re-tokenize per delta).

    Layout: ``output_path/sig`` (id, sig array<bigint>),
    ``output_path/bands`` (id, band, bkey), and ``output_path/manifest``
    written LAST (the repo's manifest-is-the-commit-point discipline):
    readers refuse an artifact with a missing/torn manifest, and the
    manifest records n_hashes/n_bands/shingle_words so a query with
    mismatched parameters fails loud instead of joining bogus keys.
    The band table is what the delta joins against; the signature table
    serves est_jaccard lookups. Both are narrow fixed-width projections
    (~n_bands rows + one 12-bigint array per doc), a small fixed
    fraction of corpus bytes. Keys derive from frozen coefficients
    (``MINHASH_COEFFS``), so artifacts written on any environment join
    correctly against any later delta. Re-publishing IN PLACE while
    readers are live is inherently racy on object stores — publish each
    corpus version to a fresh path and switch pointers instead."""
    sigs = minhash_signatures(
        widen_if_narrow(df), id_col, text_col, n_hashes, shingle_words
    ).persist()
    spark = df.sparkSession
    from ..local import local_df as _ldf

    # clear the commit marker FIRST (empty overwrite — head() = None
    # reads as uncommitted) so a crash mid-rewrite leaves a detectably-
    # unpublished artifact, never a stale-valid one
    _ldf(
        spark, [],
        "n_hashes int, n_bands int, shingle_words int, key_version int",
    ).write.mode("overwrite").parquet(f"{output_path}/manifest")
    try:
        sigs.write.mode("overwrite").parquet(f"{output_path}/sig")
        band_keys_from_signatures(sigs, id_col, n_hashes, n_bands).write.mode(
            "overwrite"
        ).parquet(f"{output_path}/bands")
    finally:
        # also on a failed write: the artifact stays detectably
        # uncommitted (manifest cleared above), but the signature frame
        # must not stay pinned for the session (round-9 advice)
        sigs.unpersist()
    _ldf(
        spark,
        [(int(n_hashes), int(n_bands), int(shingle_words),
          int(BAND_KEY_VERSION))],
        "n_hashes int, n_bands int, shingle_words int, key_version int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{output_path}/manifest")


def published_band_keys(
    spark,
    published_path: str,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    shingle_words: int = SHINGLE_WORDS,
) -> DataFrame:
    """Validated reader for a `publish_minhash_signatures` artifact →
    the (id, band, bkey) band table. Raises when the commit-marker
    manifest is absent (torn/interrupted publish) or records different
    LSH parameters than the caller's (mismatched keys would join
    garbage silently). Shared by the batch and streaming consumers so
    the two corpus-hit implementations cannot drift."""
    try:
        m = (
            spark.read.parquet(f"{published_path.rstrip('/')}/manifest")
            .head()
        )
    except Exception as e:
        raise ValueError(
            f"'{published_path}' is not a committed signature artifact "
            "(missing manifest — interrupted publish?); re-run "
            "publish_minhash_signatures"
        ) from e
    if m is None:
        # the cleared-first marker: a publish started but never reached
        # its final manifest write
        raise ValueError(
            f"signature artifact at '{published_path}' is uncommitted "
            "(publish was interrupted mid-rewrite); re-run "
            "publish_minhash_signatures"
        )
    if (m["n_hashes"], m["n_bands"], m["shingle_words"]) != (
        n_hashes, n_bands, shingle_words
    ):
        got = (m["n_hashes"], m["n_bands"], m["shingle_words"])
        raise ValueError(
            f"published artifact at '{published_path}' was built with "
            f"(n_hashes, n_bands, shingle_words)={got}, query asked for "
            f"{(n_hashes, n_bands, shingle_words)} — keys would not join"
        )
    # round 14: v1 (md5-string) artifacts would silently join ZERO pairs
    # against v2 (xxhash64 bigint) delta keys — fail loud instead
    mv = m.asDict().get("key_version", 1)
    if mv != BAND_KEY_VERSION:
        raise ValueError(
            f"published artifact at '{published_path}' uses band-key "
            f"version {mv}, this engine derives version "
            f"{BAND_KEY_VERSION} — re-run publish_minhash_signatures"
        )
    return spark.read.parquet(f"{published_path.rstrip('/')}/bands")


def minhash_pairs_incremental(
    spark,
    published_path: str,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    shingle_words: int = SHINGLE_WORDS,
    ids_only: bool = False,
) -> DataFrame:
    """Near-dup candidate pairs TOUCHING A NEW ROW, against a published
    corpus artifact → (id_a, id_b, est_jaccard), id_a < id_b: the
    new-vs-corpus pairs (via the published band table — the corpus is
    never re-tokenized) plus the new-vs-new pairs. Corpus-vs-corpus
    pairs are the published corpus' own dedup, done once at publish
    time; the result equals `minhash_candidate_pairs(corpus ∪ new)`
    restricted to pairs with at least one new member (same signatures,
    same band keys — the suite entry hash-checks that identity against
    the DuckDB oracle).

    Ids must be disjoint between the published corpus and the delta
    (same contract as every dedup family: ids are unique). Only the
    delta is tokenized; the corpus sides of the joins move fixed-width
    (id, band-key) and (id, 12-bigint) rows."""
    sigs_new = minhash_signatures(
        widen_if_narrow(new_df), id_col, text_col, n_hashes, shingle_words
    ).persist()
    bands_new = band_keys_from_signatures(sigs_new, id_col, n_hashes, n_bands)
    bands_pub = published_band_keys(
        spark, published_path, n_hashes, n_bands, shingle_words
    )
    cross = (
        bands_pub.select(F.col(id_col).alias("_pid"), "band", "bkey")
        .join(
            bands_new.select(F.col(id_col).alias("_nid"), "band", "bkey"),
            on=["band", "bkey"],
        )
        # ids are disjoint by contract; the guard keeps a violation from
        # fabricating (x, x) self-pairs instead of corrupting downstream
        .where(F.col("_pid") != F.col("_nid"))
        .select(
            F.least("_pid", "_nid").alias("id_a"),
            F.greatest("_pid", "_nid").alias("id_b"),
        )
        .distinct()
    )
    within = _candidate_pairs(bands_new, id_col, ["band", "bkey"])
    pairs = cross.unionByName(within).distinct()
    if ids_only:
        return track_caches(pairs, sigs_new)
    all_sigs = spark.read.parquet(f"{published_path}/sig").unionByName(
        sigs_new
    )
    sa = all_sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = all_sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda m: m,
            )
        ).cast("double")
        / F.lit(float(n_hashes))
    )
    return track_caches(
        pairs.join(sa, on="id_a")
        .join(sb, on="id_b")
        .select("id_a", "id_b", est.alias("est_jaccard")),
        sigs_new,
    )


def dedup_incremental(
    spark,
    published_path: str,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    shingle_words: int = SHINGLE_WORDS,
) -> DataFrame:
    """The delta rows that SURVIVE near-dedup against a published corpus
    artifact — the call a daily ingest actually makes. Drops a delta row
    when it shares an LSH band bucket with ANY corpus row (the corpus
    copy is canonical regardless of id order — a band-key SEMI-join, so
    corpus-delta pairs are never materialized) or with a smaller-id
    delta row. BOTH drop rules are COLLISION-ONLY (no exact-Jaccard
    verification), the same policy as the corpus-hit path and
    `stream_dedup_minhash` — a rare LSH false positive overdrops
    rather than underdropping, and the collision-only rule is what
    keeps the oracle identity `incremental == restricted-full
    minhash_candidate_pairs` exact. This deliberately DIFFERS from
    `prepare_corpus`' within-batch near-dedup, which Jaccard-verifies
    candidates against `near_dup_threshold` before dropping; for
    verified delta-delta drops, run `prepare_corpus(new_df, ...,
    dedup_against=published_path)` instead (corpus hits stay
    collision-only there too — the artifact stores no text to verify
    against). Returns `new_df` rows (all columns) minus the drops."""
    sigs_new = minhash_signatures(
        widen_if_narrow(new_df), id_col, text_col, n_hashes, shingle_words
    ).persist()
    bands_new = band_keys_from_signatures(sigs_new, id_col, n_hashes, n_bands)
    bands_pub = published_band_keys(
        spark, published_path, n_hashes, n_bands, shingle_words
    )
    hit_corpus = bands_new.join(
        bands_pub.select("band", "bkey"), on=["band", "bkey"], how="leftsemi"
    ).select(id_col)
    within_larger = _candidate_pairs(bands_new, id_col, ["band", "bkey"]).select(
        F.col("id_b").alias(id_col)
    )
    drops = hit_corpus.union(within_larger).distinct()
    return track_caches(
        new_df.join(drops, on=id_col, how="anti"), sigs_new
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_words: int = SHINGLE_WORDS,
    **lsh_kw,
) -> DataFrame:
    """LSH candidates verified with exact shingle-set Jaccard →
    (id_a, id_b, jaccard) for jaccard >= threshold."""
    # est_jaccard is never read here (exact Jaccard re-verifies), so the
    # ids-only fast path is forced; drop a caller-supplied ids_only
    # instead of colliding with it
    lsh_kw.pop("ids_only", None)
    cands = minhash_candidate_pairs(
        df, id_col, text_col, shingle_words=shingle_words, ids_only=True,
        **lsh_kw
    ).persist()
    # shingle only the rows that appear in a candidate pair: the exact
    # verification set is bounded by the LSH band structure, so the
    # (heavy) shingle arrays are built for a candidate-sized slice of the
    # corpus, not all of it — and the persisted slice is what both
    # verification joins read (one tokenize pass, not two full-corpus
    # passes)
    ids = (
        cands.select(F.col("id_a").alias(id_col))
        .union(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = df.join(ids, on=id_col, how="leftsemi").select(
        F.col(id_col),
        F.array_distinct(shingles(text_col, shingle_words)).alias("_sh"),
    ).persist()
    j = (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sh", "_sa"),
                   on="id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sh", "_sb"),
              on="id_b")
    )
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("double")
    union = F.size(F.array_union("_sa", "_sb")).cast("double")
    return track_caches(
        j.select("id_a", "id_b", F.try_divide(inter, union).alias("jaccard"))
        .where(F.col("jaccard") >= threshold),
        cands, sh,
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """→ (id, simhash bigint): 32-bit SimHash. Each distinct token hashes
    to 32 bits (md5 prefix); bit b of the fingerprint is 1 when more
    token-hashes set b than clear it (ties → 0). Near-duplicate texts
    land within small Hamming distance.

    Assembled as one SQL string (the nested per-bit aggregate lambdas
    cost a py4j round-trip per node through the Column API). Bit b is
    read as floor(h / 2^b) % 2 — h < 2^32 and 2^b are exact in doubles —
    because the shift builtins only take int literals."""
    th = (
        "transform(array_distinct("
        + spark_sql_tokenize(text_col)
        + "), t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint))"
    )
    bit_sums = (
        "transform(sequence(0, 31), b -> aggregate(th, 0, (acc, h) -> "
        "acc + (case when pmod(cast(floor(h / power(2.0D, b)) as bigint), 2)"
        " = 1 then 1 else -1 end)))"
    )
    fp = (
        "aggregate(zip_with("
        + bit_sums
        + ", sequence(0, 31), (s, b) -> case when s > 0 then "
        "cast(power(2.0D, b) as bigint) else cast(0 as bigint) end), "
        "cast(0 as bigint), (acc, x) -> acc + x)"
    )
    expr = sql_bind_once(th, "th", fp)
    return df.select(F.col(id_col), F.expr(expr).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """→ (id_a, id_b, hamming): all pairs within `max_hamming` bits of
    SimHash distance (id_a < id_b) — COMPLETE by the pigeonhole
    principle: with `n_bands > max_hamming` equal-width bands of the
    32-bit fingerprint, any pair within the bound shares at least one
    identical band, so the band equi-join (never an all-pairs product)
    generates a candidate superset and the exact popcount filter keeps
    the true pairs.

    Scale: same LSH shape as the MinHash path — the shuffle carries
    (id, 8-byte fingerprint) rows, pairs form only inside band buckets,
    and the verification is one JVM `bit_count(xor)` per candidate."""
    if n_bands <= max_hamming:
        raise ValueError(
            "n_bands must exceed max_hamming for pigeonhole completeness"
        )
    if n_bands > 32:
        # width would be 0: every band value collapses to 0 and the
        # equi-join degenerates into an all-pairs product
        raise ValueError("n_bands must be <= 32 (one bit per band minimum)")
    width = 32 // n_bands
    sigs = simhash(df, id_col, text_col).persist()
    band_arr = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            (
                F.floor(
                    F.col("simhash") / F.lit(float(2 ** (width * b)))
                ).cast("bigint") % F.lit(2 ** width)
            ).alias("bval"),
        )
        for b in range(n_bands)
    ])
    bands = sigs.select(
        F.col(id_col), "simhash", F.explode(band_arr).alias("bk")
    ).select(id_col, "simhash", F.col("bk.band").alias("band"),
             F.col("bk.bval").alias("bval"))
    return track_caches(
        _candidate_pairs(bands, id_col, ["band", "bval"],
                         carry={"simhash": "sh"})
        .withColumn(
            "hamming", F.expr("bit_count(sh_a ^ sh_b)").cast("int")
        )
        .where(F.col("hamming") <= F.lit(int(max_hamming)))
        .select("id_a", "id_b", "hamming"),
        sigs,
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH: each of `n_tables` tables buckets vectors by
    the sign pattern of `n_planes` projections; exact cosine verification
    within buckets → (id_a, id_b, cosine) with cosine >= threshold.

    Scale: shuffle is O(n·tables); near-identical vectors collide with
    probability ~(1 - theta/pi)^planes per table."""
    spark = df.sparkSession
    first = df.select(vec_col).head()
    if first is None:
        return spark.createDataFrame([], "id_a long, id_b long, cosine double")
    dim = len(first[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim)).astype(np.float32)

    def bucket_for(t: int) -> Column:
        def bits(v: Column) -> Column:
            # v is the bound f64 vector: all n_planes projections share
            # one cast/evaluation instead of re-casting per plane
            return F.concat(*[
                F.when(
                    F.aggregate(
                        F.zip_with(
                            v,
                            F.array(*[F.lit(float(x)) for x in planes[t, p]]),
                            lambda a, b: a * b,
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    >= 0,
                    F.lit("1"),
                ).otherwise(F.lit("0"))
                for p in range(n_planes)
            ])

        return _bind(F.col(vec_col).cast("array<double>"), bits)

    tables = []
    for t in range(n_tables):
        tables.append(
            df.select(
                F.col(id_col),
                F.lit(t).alias("table"),
                bucket_for(t).alias("bucket"),
            )
        )
    bucketed = tables[0]
    for t in tables[1:]:
        bucketed = bucketed.unionByName(t)
    # the bucket table is self-joined (a x b): persist so the
    # n_tables x n_planes sign projections are computed once per row, not
    # once per join side. It carries (id, table, bucket) ONLY — the band
    # join, the id_a<id_b filter and the distinct all move fixed-width
    # rows; the ~KB-per-row vectors never enter a wide exchange.
    bucketed = bucketed.persist()

    pairs = _candidate_pairs(bucketed, id_col, ["table", "bucket"])
    # vectors join back for the CANDIDATE slice only (mirrors
    # ngram_jaccard_pairs' shingle slice): leftsemi down to ids that
    # appear in a pair before persisting, so the cached/joined vector
    # payload is bounded by the LSH band structure, not the corpus
    pairs = cand_pairs = pairs.persist()
    pair_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    vecs = (
        df.select(F.col(id_col), F.col(vec_col))
        .join(pair_ids, on=id_col, how="leftsemi")
        .persist()
    )
    pairs = (
        pairs.join(
            vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")),
            on="id_a",
        )
        .join(
            vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")),
            on="id_b",
        )
    )
    dot = F.aggregate(
        F.zip_with(F.col("_va").cast("array<double>"),
                   F.col("_vb").cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(
        F.zip_with(F.col("_va").cast("array<double>"),
                   F.col("_va").cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    nb = F.sqrt(F.aggregate(
        F.zip_with(F.col("_vb").cast("array<double>"),
                   F.col("_vb").cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    return track_caches(
        pairs.select("id_a", "id_b", F.try_divide(dot, na * nb).alias("cosine"))
        .where(F.col("cosine") >= threshold),
        bucketed, cand_pairs, vecs,
    )
