"""End-to-end tour of duckdb_ann_spark on the bundled testdata.

Run:  python examples/quickstart.py [SF_DIR]

Covers the full surface a reference (decisiongraph/duckdb-ann) user
needs: index build + ANN search (exact Flat, IVF partial probe, sharded
DiskANN, layered HNSW), the top-k planner rewrite, hybrid BM25+vector
search, the LLM-data operators (dedup, text analysis, k-NN join), and
the composed corpus-prep pipeline.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from duckdb_ann_spark.index import (
    Catalog, ann_index_info, create_index, drop_index, index_scan,
)
from duckdb_ann_spark.operators.hybrid import hybrid_search
from duckdb_ann_spark.operators.knn_join import knn_join
from duckdb_ann_spark.operators.topk import topk
from duckdb_ann_spark.pipeline import prepare_corpus
from duckdb_ann_spark.plans import topk_auto
from duckdb_ann_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("quickstart")
    cat = Catalog(os.path.join(tempfile.mkdtemp(), "indexes"))

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]

    # -- exact top-k (no index) ---------------------------------------
    print("\n== exact top-5 (brute force) ==")
    topk(emb, "embedding", qvec, k=5, metric="l2", id_col="vec_id").show()

    # -- CREATE INDEX + search ----------------------------------------
    for name, engine, opts in (
        ("demo_flat", "faiss", {}),
        # nprobe=0: searches ride the build-time MEASURED recall curve
        ("demo_ivf", "faiss", {"type": "IVFFlat", "ivf_nlist": 0, "nprobe": 0}),
        ("demo_vamana", "diskann", {"max_degree": 32, "build_complexity": 64}),
        ("demo_hnsw", "faiss", {"type": "HNSW", "hnsw_m": 16}),
    ):
        drop_index(name, cat)
        create_index(emb, "vec_id", "embedding", name, engine=engine,
                     table_name="embeddings", catalog=cat, **opts)
        hits = index_scan(spark, name, [qvec], k=3, catalog=cat).collect()
        print(f"{name:12s} top-3: "
              f"{[(r.vec_id, round(r._distance, 4)) for r in hits]}")
    print("\n== ann_index_info ==")
    ann_index_info(spark, cat).show(truncate=False)

    # -- the optimizer-rewrite analog ---------------------------------
    res, decision = topk_auto(
        emb, "embedding", qvec, k=5, table_name="embeddings",
        id_col="vec_id", catalog=cat, explain=True,
    )
    print(f"planner routed through: {decision.strategy} ({decision.index})")

    # -- hybrid BM25 + vector with RRF --------------------------------
    print("\n== hybrid search ==")
    base = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "embedding"
    )
    hybrid_search(base, "doc_id", qvec, "spark join query data",
                  text_col="text", vec_col="embedding", k=5).show()

    # -- distributed k-NN join (both sides large) ---------------------
    # defaults (nlist=0, nprobe=0) are the recall-calibrated AUTO
    # pairing — holds the 0.70 recall floor with margin out of the box;
    # see ivf.floor_nprobe for the cheapest floor-clearing config
    print("== 1-NN join, 20 queries x full base (auto defaults) ==")
    q20 = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    knn_join(q20, "qid", "embedding", emb, "vec_id", "embedding",
             k=1).show(5)

    # -- DataFrame-queries search against a published index -----------
    # (no driver collect of the query side; repeated joins reuse the
    # index's trained cells / shard graphs instead of re-training)
    from duckdb_ann_spark.index import index_search_table

    print("== index_search_table: 20-row query DataFrame x ivfflat ==")
    index_search_table(spark, "demo_ivf", q20, "qid", "embedding", k=1,
                       catalog=cat).show(5)

    # -- per-call recall contract + cheap staleness remedy ------------
    # target_recall resolves the probe count (IVF) or the joint
    # (route_nprobe, beam width) pair (routed graphs, anchored at the
    # build-time MEASURED end recall) from the manifest's curves;
    # recalibrate_index re-runs just the bounded measurement passes
    # when ann_index_info reports calibration_stale — no rebuild.
    from duckdb_ann_spark.index import recalibrate_index

    hits = index_scan(spark, "demo_ivf", [qvec], k=3, catalog=cat,
                      target_recall=0.9).collect()
    print(f"target_recall=0.9 top-3: {[r.vec_id for r in hits]}")
    recalibrate_index(spark, "demo_ivf", catalog=cat)
    print("demo_ivf recalibrated against the live artifact")

    # -- near-dup detection three ways --------------------------------
    from duckdb_ann_spark.operators.dedup import (
        minhash_candidate_pairs, simhash_pairs,
    )

    n_mh = minhash_candidate_pairs(docs, "doc_id", "text").count()
    n_sh = simhash_pairs(docs, "doc_id", "text", max_hamming=3).count()
    print(f"near-dup candidates: {n_mh} MinHash-LSH pairs, "
          f"{n_sh} SimHash pairs within 3 Hamming bits")

    # -- unigram-LM quality signal (perplexity-filter style) ----------
    from duckdb_ann_spark.operators.text_ops import lm_unigram_scores

    lm = lm_unigram_scores(docs, "doc_id", "text")
    print("== lowest-LM-score (most 'surprising') documents ==")
    lm.orderBy("avg_logprob").select("doc_id", "avg_logprob").show(3)

    # -- LLM corpus prep pipeline -------------------------------------
    cleaned = prepare_corpus(docs, "doc_id", "text", langs=("en",),
                             min_quality=0.65, min_avg_logprob=-8.0,
                             scrub_pii=True,
                             repetition_gates={"dup_2gram_frac": 0.5,
                                               "top_2gram_char_frac": 0.5})
    print(f"prepare_corpus: {docs.count()} docs -> {cleaned.count()} "
          "after PII scrub, language/quality/LM/repetition gates + "
          "exact & near dedup")

    # -- corpus-prep signals standalone -------------------------------
    from duckdb_ann_spark.operators.corpus_ops import (
        connected_components, hash_split, repetition_stats,
    )
    from duckdb_ann_spark.operators.dedup import minhash_candidate_pairs

    pairs = minhash_candidate_pairs(docs, "doc_id", "text", ids_only=True)
    comps = connected_components(pairs, "id_a", "id_b")
    n_dup = comps.where(F.col("node") != F.col("component_id")).count()
    print(f"near-dup clusters: {comps.count()} member rows, "
          f"{n_dup} non-representative duplicates")

    rep = repetition_stats(docs, "doc_id", "text")
    print("== most 2-gram-repetitive documents ==")
    rep.orderBy(F.desc("dup_2gram_frac")).select(
        "doc_id", "dup_2gram_frac", "top_2gram_char_frac"
    ).show(3)
    split = hash_split(cleaned, "doc_id", (0.9, 0.05, 0.05))
    print("== deterministic split sizes ==")
    split.groupBy("split").count().orderBy("split").show()

    spark.stop()


if __name__ == "__main__":
    main()
