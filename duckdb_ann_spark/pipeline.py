"""`prepare_corpus`: the composed training-data prep pipeline.

This is the end-to-end flow a large-scale LLM-data team runs over a raw
document corpus, expressed as ONE declarative Spark plan built from the
engine's own operators (`operators/text_ops.py`, `operators/dedup.py`):

1. **gate** — keep documents whose predicted language is allowed and
   whose composite quality score clears the floor, as ONE
   self-contained predicate over the raw text (a filter on annotate
   aliases would get the whole annotate tree inlined into its
   predicates — measured 9 evaluations per row);
2. **annotate** — token stats, quality features, language-ID, the
   exact-dup fingerprint, AND the MinHash signature, all computed for
   the surviving rows in a single narrow scan sharing ONE tokenize
   evaluation per row (no shuffle);
3. **exact dedup** — keep the smallest id per normalized-text
   fingerprint via `min_by` hash aggregation: map-side partial combine
   before ONE shuffle keyed on the 32-hex-char digest, no per-partition
   sort (a row_number window would sort every partition and hold whole
   partitions, where the agg keeps one running row per distinct digest);
4. **near dedup** — MinHash-LSH candidate pairs verified with exact
   shingle Jaccard (`ngram_jaccard_pairs`); the LARGER id of each
   verified pair is dropped (deterministic, no transitive-closure
   iteration — the policy production pipelines use to stay one-pass).

Scale shape at 100 TB: stage 1-2 stream; stage 3 shuffles ids+digests;
stage 4 is bounded by the LSH band structure (pairs only form inside
band buckets). Nothing collects to the driver.

The reference has no composed pipeline operator — this is the
beyond-reference surface the Spark engine adds (brief: "the operations
a large-scale training-data pipeline would need").
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .caching import track_caches
from .functions.text import spark_sql_tokenize, sql_bind_once
from .local import widen_if_narrow
from .operators.dedup import ngram_jaccard_pairs
from .operators.text_ops import (
    lang_pred_from_hits,
    sql_lang_hits_struct,
    sql_lang_pred_case,
    sql_quality_struct,
)

__all__ = ["prepare_corpus", "annotate_and_gate"]


def annotate_and_gate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    langs: Sequence[str],
    min_quality: float,
    scrub_pii: bool = False,
    repetition_gates: dict[str, float] | None = None,
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """The STATELESS per-document stages shared by batch
    :func:`prepare_corpus` and streaming ``stream_prepare_corpus``:
    [PII scrub →] fused annotate → language/quality filter
    [→ repetition gates].

    → (*extra_cols, id, text, n_chars, n_tokens, quality_score,
    lang_pred, _fp, _sig) where `_fp` is the normalized-token exact-dup
    fingerprint both dedup flavors key on and `_sig` is the MinHash
    signature (computed in the same tokenize evaluation, so near-dedup
    never re-tokenizes). Pure row-local projections + filters —
    stream-safe by construction (no shuffle, no state)."""
    if scrub_pii:
        from .operators.corpus_ops import pii_redact

        docs = docs.withColumn(text_col, pii_redact(text_col))

    # language/quality gate FIRST, as one self-contained predicate over
    # the raw text: a filter on the annotate projection's aliases gets
    # those aliases INLINED into its predicates by pushdown, and with
    # them the whole annotate tree — measured NINE evaluations of the
    # struct (tokenize + signature included) per row vs one. The gate
    # re-derives only the cheap subset it needs (quality score + lang
    # hits) and must stay semantically identical to the lang_pred /
    # quality_score columns produced below (sql_lang_pred_case mirrors
    # lang_pred_from_hits; both sides read sql_quality_struct).
    # codes are lowercase-normalized ('EN' keeps working), then
    # validated: the codes are interpolated into a SQL IN-list AND must
    # belong to the lang-id vocabulary's shape — a malformed code (e.g.
    # 'pt-BR') raises here instead of the pre-round-5 silent no-match
    langs = tuple(lg.lower() for lg in langs)
    for lg in langs:
        if not re.fullmatch(r"[a-z0-9_]+", lg):
            raise ValueError(f"invalid language code {lg!r}")
    if langs:
        langs_sql = ", ".join(f"'{lg}'" for lg in langs)
        gate = sql_bind_once(
            spark_sql_tokenize(text_col), "toks",
            f"({sql_quality_struct()}).quality_score >= "
            f"cast({float(min_quality)!r} as double) AND "
            + sql_bind_once(
                sql_lang_hits_struct(), "hh",
                f"({sql_lang_pred_case('hh')}) IN ({langs_sql})",
            ),
        )
    else:
        gate = "false"  # no allowed languages: empty (correct schema)
    docs = docs.where(F.expr(gate))

    # the whole annotate struct as ONE SQL string (the node-by-node
    # Column builders paid a py4j round-trip per node — seconds of
    # driver time per plan); element_at(transform(array(..)), 1) is the
    # SQL spelling of bind_once: one tokenize evaluation per row
    from .operators.dedup import signature_body_sql

    annotations = F.expr(
        sql_bind_once(
            spark_sql_tokenize(text_col), "toks",
            "struct(size(toks) as n_tokens, "
            f"{sql_quality_struct()} as q, "
            f"{sql_lang_hits_struct()} as h, "
            "md5(concat_ws(' ', toks)) as fp, "
            # MinHash signature in the SAME tokenize evaluation: the
            # near-dedup stage then skips its full corpus re-tokenize
            f"{signature_body_sql()} as sig)",
        )
    )
    ann = docs.select(
        *[F.col(c) for c in extra_cols],
        F.col(id_col),
        F.col(text_col),
        F.length(text_col).alias("n_chars"),
        annotations.alias("_a"),
    ).select(
        *extra_cols,
        id_col,
        text_col,
        "n_chars",
        F.col("_a.n_tokens").alias("n_tokens"),
        F.col("_a.q.quality_score").alias("quality_score"),
        lang_pred_from_hits(lambda lg: F.col(f"_a.h.h_{lg}")).alias("lang_pred"),
        F.col("_a.fp").alias("_fp"),
        F.col("_a.sig").alias("_sig"),
    )
    # NO filter on ann's aliases here — the gate already ran upstream
    kept = ann

    if repetition_gates:
        # one self-contained boolean predicate (single evaluation of the
        # repetition tree per row, only the needed signal groups) — a
        # withColumn+where spelling gets the struct alias inlined into
        # the filter, duplicating the expensive tree per gate key
        from .functions.text import quote_ident
        from .operators.corpus_ops import repetition_gate_sql

        kept = kept.where(F.expr(
            repetition_gate_sql("spark", quote_ident(text_col),
                                repetition_gates)
        ))
    return kept


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    langs: Sequence[str] = ("en",),
    min_quality: float = 0.65,
    near_dup_threshold: float = 0.5,
    min_avg_logprob: float | None = None,
    scrub_pii: bool = False,
    repetition_gates: dict[str, float] | None = None,
    benchmark: DataFrame | None = None,
    benchmark_text_col: str = "text",
    decontaminate_n: int = 13,
    dedup_against: str | None = None,
) -> DataFrame:
    """→ the cleaned corpus: (id, text, n_chars, n_tokens, quality_score,
    lang_pred). Row order is NOT guaranteed (no global sort: at corpus
    scale an output ORDER BY is a full range-shuffle that downstream
    writers immediately destroy; sort explicitly if you need one).

    [PII scrub →] annotate → language/quality filter [→ repetition
    gates] [→ unigram-LM gate] [→ benchmark decontamination] → exact
    dedup (min-id per fingerprint) → MinHash-LSH near-dedup (drop the
    larger id of each verified pair).

    Optional stages (each off by default, oracle entry unchanged):

    * ``scrub_pii`` — redact emails/IPv4s/phones BEFORE annotation, so
      every downstream signal (tokens, fingerprints, shingles) sees the
      redacted text and identical docs differing only in PII dedup
      together. Adds zero shuffles (three regexp_replace in the scan).
    * ``repetition_gates`` — Gopher-style repetition ceilings, e.g.
      ``{"dup_line_frac": 0.3, "dup_2gram_frac": 0.2,
      "top_2gram_char_frac": 0.2}`` (keys = repetition_stats columns).
      Row-local expressions in the same scan; NULL signals (empty docs)
      pass, matching the "filter only on evidence" convention.
    * ``benchmark`` — drop documents sharing any ``decontaminate_n``-gram
      with the benchmark corpus (GPT-3-style decontamination; n=13
      default there and here). One extra scan of the kept slice + a
      broadcast of the benchmark digest set.
    * ``dedup_against`` (round 8) — path of a
      `publish_minhash_signatures` artifact: additionally drop documents
      whose LSH band keys collide with the PUBLISHED corpus (the
      incremental corpus-prep shape — prepare a daily delta against the
      canonical corpus without re-tokenizing it; see
      `dedup_incremental`). The band keys derive from the annotate
      pass's signature column, so this adds a band projection + one
      SEMI-join against the artifact, no extra tokenize. Divergence
      from the in-delta near-dedup, documented: corpus hits drop on
      band collision alone (the artifact holds no text to Jaccard-
      verify against), the same policy the streaming path applies.
    """
    # per-row annotate work is the pipeline's heaviest expression chain;
    # make sure a narrow input (one small file) doesn't serialize it
    docs = widen_if_narrow(docs)
    held_frames: list[DataFrame] = []  # optional stages' cached frames
    kept = annotate_and_gate(
        docs, id_col, text_col, langs=langs, min_quality=min_quality,
        scrub_pii=scrub_pii, repetition_gates=repetition_gates,
    )
    if scrub_pii:
        # downstream stages (LM training, decontamination) must see the
        # scrubbed corpus too
        from .operators.corpus_ops import pii_redact

        docs = docs.withColumn(text_col, pii_redact(text_col))
    if min_avg_logprob is not None:
        # optional unigram-LM filter (the perplexity-style signal): drop
        # documents whose corpus-trained average token log-probability
        # falls below the floor. The LM trains on the RAW corpus (one
        # extra count shuffle + vocabulary broadcast), so the signal is
        # independent of which docs the other gates keep.
        from .operators.text_ops import lm_unigram_scores

        lm_scores = lm_unigram_scores(
            docs, id_col, text_col, include_empty_docs=False
        )
        lm = lm_scores.where(
            F.col("avg_logprob") >= F.lit(float(min_avg_logprob))
        ).select(id_col)
        kept = kept.join(lm, on=id_col, how="leftsemi")
        held_frames.append(lm_scores)  # carries the persisted count table

    if benchmark is not None:
        # contamination check over the kept slice only (column pruning
        # drops the annotate struct from the explode branch)
        from .operators.corpus_ops import ngram_decontaminate

        flagged = ngram_decontaminate(
            kept.select(id_col, text_col), id_col, text_col,
            benchmark, benchmark_text_col, n=decontaminate_n,
        ).select(id_col)
        kept = kept.join(flagged, on=id_col, how="anti")

    # statically known (== kept.columns minus _fp): touching .columns
    # would force a full Catalyst analysis of the annotate tree mid-build
    keep_cols = [id_col, text_col, "n_chars", "n_tokens", "quality_score",
                 "lang_pred"]
    uniq = (
        kept.groupBy("_fp")
        .agg(
            # _sig rides along so near-dedup reuses the annotate pass's
            # signature instead of re-tokenizing the cleaned corpus
            F.min_by(F.struct(*keep_cols, "_sig"), F.col(id_col)).alias("_r")
        )
        .select("_r.*")
    )
    # uniq fans out to the near-dup detector AND the final anti-join:
    # persist it so the annotate scan + dedup window run once, not once
    # per consumer. At cluster scale this is the standard "materialize
    # the cleaned working set" checkpoint (MEMORY_AND_DISK, evictable) —
    # re-deriving it per consumer would re-read the raw corpus each time.
    uniq = uniq.persist()

    # uniq sits downstream of the dedup agg's exchange, so it is already
    # wide — widen=False skips a redundant plan-compile probe
    # cache_sigs=False: the cache lives upstream (uniq, persisted above);
    # the signature projection re-reads those cached blocks cheaply
    pairs = ngram_jaccard_pairs(
        uniq.select(id_col, text_col, "_sig"), id_col, text_col,
        threshold=near_dup_threshold, widen=False, sig_col="_sig",
        cache_sigs=False,
    )
    drops = pairs.select(F.col("id_b").alias(id_col))
    if dedup_against is not None:
        from .operators.dedup import (
            band_keys_from_signatures,
            published_band_keys,
        )

        bands_new = band_keys_from_signatures(
            uniq.select(F.col(id_col), F.col("_sig").alias("sig")), id_col
        )
        corpus_hits = bands_new.join(
            published_band_keys(docs.sparkSession, dedup_against).select(
                "band", "bkey"
            ),
            on=["band", "bkey"], how="leftsemi",
        ).select(id_col)
        drops = drops.unionByName(corpus_hits)
    drops = drops.distinct()
    # every persisted block the returned plan references rides on the
    # output: `release_caches(out)` after materializing frees them all
    # (long-session discipline; releasing is always safe — lineage
    # recomputes — it only forfeits reuse on a re-materialization)
    return track_caches(
        uniq.join(drops, on=id_col, how="anti")
        .select(id_col, text_col, "n_chars", "n_tokens", "quality_score",
                "lang_pred"),
        uniq, pairs, *held_frames,
    )
