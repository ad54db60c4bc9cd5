"""Dedup + text-analysis + multimodal operators on constructed data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_ann_spark.operators.dedup import (
    dedup_exact,
    embedding_near_dup_pairs,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from duckdb_ann_spark.operators.multimodal import (
    binary_stats,
    decode_image,
    extract_features,
)
from duckdb_ann_spark.operators.text_ops import (
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE + " extra"),  # near dup of 0
        (3, "completely different content about spark query engines here"),
        (4, "  " + BASE.upper() + "  "),  # dup of 0 after normalization
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_clusters(docs):
    res = {r.doc_id: (r.cluster_id, r.is_duplicate)
           for r in dedup_exact(docs, "doc_id", "text").collect()}
    assert res[0] == (0, False)
    assert res[1] == (0, True)
    assert res[4] == (0, True)  # normalization catches case/whitespace
    assert res[2][1] is False and res[3][1] is False


def test_minhash_finds_near_dups(docs):
    pairs = {(r.id_a, r.id_b): r.est_jaccard
             for r in minhash_candidate_pairs(docs, "doc_id", "text").collect()}
    assert pairs[(0, 1)] == 1.0  # identical → identical signatures
    assert (0, 2) in pairs and pairs[(0, 2)] >= 0.5
    assert not any(3 in p for p in pairs)  # unrelated text never pairs


def test_minhash_plan_has_no_crossjoin(docs):
    plan = minhash_candidate_pairs(docs, "doc_id", "text")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_ngram_jaccard_verifies(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(docs, "doc_id", "text", 0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert 0.5 <= pairs[(0, 2)] < 1.0


def test_simhash_hamming(docs):
    fps = {r.doc_id: r.simhash for r in simhash(docs, "doc_id", "text").collect()}
    assert fps[0] == fps[1]  # identical text → identical fingerprint
    ham_near = bin(fps[0] ^ fps[2]).count("1")
    ham_far = bin(fps[0] ^ fps[3]).count("1")
    assert ham_near < ham_far
    assert ham_near <= 8


def test_embedding_near_dup(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 16)).astype("float32")
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # 100: copy of 0; 101: tiny perturbation of 1
    rows.append((100, [float(x) for x in base[0]]))
    rows.append((101, [float(x) for x in base[1] + 1e-4]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.id_a, r.id_b): r.cosine
             for r in embedding_near_dup_pairs(df, "vec_id", "embedding",
                                               threshold=0.99).collect()}
    assert (0, 100) in pairs and pairs[(0, 100)] >= 0.999999
    assert (1, 101) in pairs and pairs[(1, 101)] >= 0.99


def test_token_stats_and_quality(docs):
    st = {r.doc_id: r for r in token_stats(docs, "doc_id", "text").collect()}
    assert st[0].n_tokens == 13
    assert st[0].n_unique_tokens == 11  # 'the'/'again' repeat
    assert st[5].n_tokens == 2
    q = {r.doc_id: r for r in quality_score(docs, "doc_id", "text").collect()}
    assert 0.0 <= q[0].quality_score <= 1.0
    assert q[0].quality_score > q[5].quality_score  # too-short text penalized
    assert q[0].stopword_ratio > 0


def test_lang_id(spark):
    rows = [
        (0, "the cat and the dog are in the house"),
        (1, "el perro y la casa es en la calle un dia"),
        (2, "der hund und die katze ist ein tier mit von zu"),
        (3, "xyzzy qwerty plugh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = {r.doc_id: r.lang_pred for r in lang_id(df, "doc_id", "text").collect()}
    assert res[0] == "en" and res[1] == "es" and res[2] == "de"
    assert res[3] == "und"


def test_fingerprint_normalizes(docs):
    fp = {r.doc_id: r.fingerprint
          for r in fingerprint(docs, "doc_id", "text").collect()}
    assert fp[0] == fp[1] == fp[4]  # punctuation/case/whitespace-insensitive
    assert fp[0] != fp[2]


def test_binary_stats_and_features(docs):
    blobs = docs.select("doc_id", F.col("text").cast("binary").alias("blob"))
    st = {r.doc_id: r for r in binary_stats(blobs, "doc_id", "blob").collect()}
    assert st[0].n_bytes == len(BASE.encode())
    feats = {r.doc_id: r for r in extract_features(
        blobs, "doc_id", "blob", decoder="bytes").collect()}
    assert feats[0].n_bytes == len(BASE.encode())
    assert len(feats[0].features) == 8
    assert abs(sum(feats[0].features) - 1.0) < 1e-5  # normalized histogram
    assert feats[0].features == feats[1].features  # deterministic


@pytest.mark.skipif(
    __import__("duckdb_ann_spark.operators.multimodal",
               fromlist=["_pil_available"])._pil_available(),
    reason="PIL installed: decode_image decodes for real",
)
def test_decode_image_stub():
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\x89PNG fake")


def test_frame_sample_slices(spark):
    """Frames are exact byte slices at uniformly spaced indices."""
    from duckdb_ann_spark.operators.multimodal import frame_sample

    blob = bytes(range(100))  # 6 full 16-byte frames, 4 trailing dropped
    df = spark.createDataFrame([(1, bytearray(blob))], "id long, blob binary")
    rows = frame_sample(df, "id", "blob", n_frames=4, frame_bytes=16).collect()
    assert [r.sample_idx for r in rows] == [0, 1, 2, 3]
    assert [r.frame_idx for r in rows] == [0, 1, 3, 4]  # floor(j*6/4)
    for r in rows:
        lo = r.frame_idx * 16
        assert bytes(r.frame) == blob[lo: lo + 16]
    # short blob: fewer frames than requested; empty blob: none
    short = spark.createDataFrame(
        [(2, bytearray(b"x" * 20)), (3, bytearray(b""))], "id long, blob binary"
    )
    got = frame_sample(short, "id", "blob", n_frames=4, frame_bytes=16).collect()
    assert len(got) == 1 and got[0].id == 2 and got[0].frame_idx == 0


def test_resize_features_pooling(spark):
    """Area pooling over the byte-matrix fake decode."""
    from duckdb_ann_spark.operators.multimodal import resize_features

    blob = bytes([10] * 32 + [20] * 32)  # 2 rows of width 32
    df = spark.createDataFrame([(1, bytearray(blob))], "id long, blob binary")
    r = resize_features(df, "id", "blob", src_width=32, out_h=2, out_w=2).head()
    assert (r.src_h, r.src_w) == (2, 32)
    assert r.pixels == [10.0, 10.0, 20.0, 20.0]


def test_sql_fragments_match_column_builders(spark, docs):
    """The SQL-string twins (one py4j call) must stay in lockstep with
    the public Column builders — bitwise, since downstream oracle
    hashes ride on the SQL path."""
    from pyspark.sql import functions as F
    from duckdb_ann_spark.functions.expr import bind_once
    from duckdb_ann_spark.functions.text import (
        spark_sql_tokenize, sql_bind_once, tokenize,
    )
    from duckdb_ann_spark.operators.text_ops import (
        lang_hit_struct, quality_features,
        sql_lang_hits_struct, sql_quality_struct,
    )

    via_sql = docs.select(
        F.expr(sql_bind_once(
            spark_sql_tokenize("text"), "toks", sql_quality_struct()
        )).alias("q"),
        F.expr(sql_bind_once(
            spark_sql_tokenize("text"), "toks", sql_lang_hits_struct()
        )).alias("h"),
    ).collect()
    via_cols = docs.select(
        bind_once(tokenize("text"), quality_features).alias("q"),
        bind_once(tokenize("text"), lang_hit_struct).alias("h"),
    ).collect()
    assert [tuple(r) for r in via_sql] == [tuple(r) for r in via_cols]


def test_lm_unigram_scores_oracle_parity(spark, sf_dir):
    """lm_unigram_scores hash-matches a DuckDB re-implementation bitwise
    (integer-nanonat quantization makes the per-doc sum order-free and
    the ln 1-ulp cross-engine divergence collapses under floor(x*1e9))."""
    import duckdb

    from duckdb_ann_spark.functions.text import sql_tokenize
    from duckdb_ann_spark.operators.text_ops import lm_unigram_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        lm_unigram_scores(docs, "doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(f"""
        WITH toks AS (
            SELECT doc_id, unnest({sql_tokenize('text')}) AS tok
            FROM documents
        ),
        counts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        total AS (SELECT sum(cnt) AS total FROM counts),
        scored AS (
            SELECT t.doc_id,
                   CAST(floor(ln(CAST(COALESCE(c.cnt, 1) AS DOUBLE)
                                 / CAST(tt.total AS DOUBLE)) * 1e9)
                        AS BIGINT) AS lp
            FROM toks t LEFT JOIN counts c USING (tok) CROSS JOIN total tt
        ),
        per_doc AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored_tokens,
                   CAST(sum(lp) AS BIGINT) AS sum_logprob_nano
            FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_scored_tokens, 0) AS BIGINT)
                   AS n_scored_tokens,
               p.sum_logprob_nano,
               CAST(p.sum_logprob_nano AS DOUBLE) / 1e9
                   / CAST(p.n_scored_tokens AS DOUBLE) AS avg_logprob
        FROM (SELECT doc_id FROM documents) d
        LEFT JOIN per_doc p USING (doc_id)
        ORDER BY doc_id
    """).df()
    assert len(got) == len(want) > 0
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (got["n_scored_tokens"].to_numpy()
            == want["n_scored_tokens"].to_numpy()).all()
    assert (got["sum_logprob_nano"].to_numpy()
            == want["sum_logprob_nano"].to_numpy()).all()
    s, w = got["avg_logprob"].to_numpy(), want["avg_logprob"].to_numpy()
    assert ((s == w) | (np.isnan(s) & np.isnan(w))).all()
    # sanity: scores are negative log-probs and common-word docs rank
    # higher (less negative) than the corpus minimum
    assert (got["avg_logprob"].dropna() < 0).all()


def test_simhash_pairs_exact_vs_brute(spark, sf_dir):
    """simhash_pairs is EXACT for the Hamming bound (pigeonhole band
    completeness + popcount filter): it must equal the all-pairs
    brute-force on the same fingerprints."""
    from itertools import combinations

    from duckdb_ann_spark.operators.dedup import simhash, simhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 200
    )
    sh = {r.doc_id: r.simhash
          for r in simhash(docs, "doc_id", "text").collect()}
    want = {
        (a, b, bin(sh[a] ^ sh[b]).count("1"))
        for a, b in combinations(sorted(sh), 2)
        if bin(sh[a] ^ sh[b]).count("1") <= 3
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    assert got == want and len(want) > 0, (len(got), len(want))

    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(docs, "doc_id", "text", max_hamming=4, n_bands=4)


def test_simhash_pairs_no_cartesian_product(spark, sf_dir):
    """The candidate join is a band equi-join, never an all-pairs
    product (the plan assertion every dedup family carries)."""
    from duckdb_ann_spark.operators.dedup import simhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        simhash_pairs(docs, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_lm_unigram_scores_oov_floor_parity(spark, sf_dir):
    """A vocab_size below the corpus vocabulary exercises the OOV
    count-floor branch (capped-out tokens score as count 1); the DuckDB
    oracle mirrors the top-V cutoff, so parity stays bitwise."""
    import duckdb

    from duckdb_ann_spark.functions.text import sql_tokenize
    from duckdb_ann_spark.operators.text_ops import lm_unigram_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    V = 12
    got = (
        lm_unigram_scores(docs, "doc_id", "text", vocab_size=V,
                          include_empty_docs=False)
        .orderBy("doc_id").toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(f"""
        WITH toks AS (
            SELECT doc_id, unnest({sql_tokenize('text')}) AS tok
            FROM documents
        ),
        counts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        total AS (SELECT sum(cnt) AS total FROM counts),
        vocab AS (SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok LIMIT {V}),
        scored AS (
            SELECT t.doc_id,
                   CAST(floor(ln(CAST(COALESCE(v.cnt, 1) AS DOUBLE)
                                 / CAST(tt.total AS DOUBLE)) * 1e9)
                        AS BIGINT) AS lp
            FROM toks t LEFT JOIN vocab v USING (tok) CROSS JOIN total tt
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored_tokens,
               CAST(sum(lp) AS BIGINT) AS sum_logprob_nano
        FROM scored GROUP BY doc_id ORDER BY doc_id
    """).df()
    # the corpus has more than V distinct tokens, so the floor branch
    # genuinely fires
    n_vocab = con.execute(
        f"SELECT count(DISTINCT tok) FROM (SELECT unnest({sql_tokenize('text')})"
        " AS tok FROM documents)"
    ).fetchone()[0]
    assert n_vocab > V, n_vocab
    assert (got["sum_logprob_nano"].to_numpy()
            == want["sum_logprob_nano"].to_numpy()).all()
    assert (got["n_scored_tokens"].to_numpy()
            == want["n_scored_tokens"].to_numpy()).all()


@pytest.mark.skipif(
    not __import__("duckdb_ann_spark.operators.multimodal",
                   fromlist=["_pil_available"])._pil_available(),
    reason="PIL not installed: real image decode unavailable",
)
def test_extract_features_real_pil_decode(spark):
    """Soft-dependency path: real PNG bytes → real grayscale-histogram
    features through the SAME Arrow plumbing the stub uses (schema,
    batching, byte-stats unchanged). Runs only where PIL exists."""
    import io

    import numpy as np
    from PIL import Image

    from duckdb_ann_spark.operators.multimodal import (
        _pil_decode,
        extract_features,
    )

    def png(seed: int) -> bytes:
        rng = np.random.default_rng(seed)
        img = Image.fromarray(rng.integers(0, 256, (16, 16), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [(i, png(i)) for i in range(4)]
    blobs = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {r.doc_id: r for r in
           extract_features(blobs, "doc_id", "blob", decoder="image")
           .collect()}
    for i, blob in rows:
        want = [float(x) for x in _pil_decode(blob)]
        assert got[i].features == want
        assert got[i].n_bytes == len(blob)  # byte stats stay byte-level
    # auto on this machine means image; bytes stays the stub
    stub = extract_features(blobs, "doc_id", "blob", decoder="bytes")
    assert stub.collect()[0].features != got[0].features


def test_minhash_incremental_matches_full(spark, docs, tmp_path):
    """Round-8: publish-then-delta incremental dedup equals the full run
    restricted to pairs touching a delta id — the corpus half is never
    re-tokenized (its signatures come from the published artifact)."""
    from duckdb_ann_spark.operators.dedup import (
        minhash_pairs_incremental,
        publish_minhash_signatures,
    )

    full = {(r.id_a, r.id_b): r.est_jaccard
            for r in minhash_candidate_pairs(docs, "doc_id", "text").collect()}
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    delta = docs.where(F.col("doc_id") % 2 == 1)
    pub = str(tmp_path / "pubsig")
    publish_minhash_signatures(corpus, "doc_id", "text", pub)
    incr = {(r.id_a, r.id_b): r.est_jaccard
            for r in minhash_pairs_incremental(
                spark, pub, delta, "doc_id", "text").collect()}
    want = {p: j for p, j in full.items() if p[0] % 2 == 1 or p[1] % 2 == 1}
    assert incr == want
    assert (0, 1) in incr  # corpus-vs-delta pair found via the artifact
    # ids_only path: same pair set, no signature joins
    only = {(r.id_a, r.id_b) for r in minhash_pairs_incremental(
        spark, pub, delta, "doc_id", "text", ids_only=True).collect()}
    assert only == set(want)


def test_minhash_incremental_plan_shape(spark, docs, tmp_path):
    """The incremental plan neither crossJoins nor tokenizes the corpus
    side: the published parquet is scanned with only (id, band, bkey) /
    (id, sig) columns — no text column anywhere near the corpus legs."""
    from duckdb_ann_spark.operators.dedup import (
        minhash_pairs_incremental,
        publish_minhash_signatures,
    )

    pub = str(tmp_path / "pubsig2")
    publish_minhash_signatures(
        docs.where(F.col("doc_id") % 2 == 0), "doc_id", "text", pub
    )
    out = minhash_pairs_incremental(
        spark, pub, docs.where(F.col("doc_id") % 2 == 1), "doc_id", "text"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    n_scans = plan.count("Scan parquet")
    assert n_scans >= 2  # bands + sig artifacts are genuinely read


def test_dedup_incremental_survivors(spark, docs, tmp_path):
    """dedup_incremental returns the delta rows minus corpus-hits (any
    band-bucket shared with the published corpus, regardless of id
    order) and minus larger-id delta dups."""
    from duckdb_ann_spark.operators.dedup import (
        dedup_incremental,
        publish_minhash_signatures,
    )

    corpus = docs.where(F.col("doc_id") % 2 == 0)   # 0, 2, 4
    delta = docs.where(F.col("doc_id") % 2 == 1)    # 1, 3, 5
    pub = str(tmp_path / "pub")
    publish_minhash_signatures(corpus, "doc_id", "text", pub)
    kept = {r.doc_id for r in
            dedup_incremental(spark, pub, delta, "doc_id", "text").collect()}
    # 1 = BASE, identical to corpus doc 0 → dropped; 3 and 5 are unique
    assert kept == {3, 5}
    # schema passthrough: all delta columns survive
    out = dedup_incremental(spark, pub, delta, "doc_id", "text")
    assert out.columns == delta.columns


def test_published_artifact_manifest_validation(spark, docs, tmp_path):
    """The artifact manifest is the commit point: a torn publish (no
    manifest) or mismatched LSH parameters refuse loudly instead of
    joining garbage keys."""
    import shutil

    from duckdb_ann_spark.operators.dedup import (
        minhash_pairs_incremental,
        publish_minhash_signatures,
        published_band_keys,
    )

    pub = str(tmp_path / "pub")
    publish_minhash_signatures(docs, "doc_id", "text", pub)
    assert published_band_keys(spark, pub).count() > 0
    with pytest.raises(ValueError, match="keys would not join"):
        published_band_keys(spark, pub, n_bands=6)
    with pytest.raises(ValueError, match="keys would not join"):
        minhash_pairs_incremental(spark, pub, docs, "doc_id", "text",
                                  shingle_words=2)
    # round 14: a pre-v2 artifact (md5-string band keys, manifest without
    # key_version) must fail loud — its keys would silently join ZERO
    # pairs against xxhash64 delta keys
    from duckdb_ann_spark.local import local_df

    local_df(
        spark, [(12, 4, 3)], "n_hashes int, n_bands int, shingle_words int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{pub}/manifest")
    with pytest.raises(ValueError, match="band-key version 1"):
        published_band_keys(spark, pub)

    shutil.rmtree(f"{pub}/manifest")  # simulate an interrupted publish
    with pytest.raises(ValueError, match="missing manifest"):
        published_band_keys(spark, pub)
