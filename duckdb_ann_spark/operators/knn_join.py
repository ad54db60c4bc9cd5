"""Distributed k-NN join: every row of a QUERY DataFrame gets its k
nearest rows from a BASE DataFrame — no driver collect, no crossJoin.

This is the operator shape the reference cannot express at scale: its
`ann_search_table` (`/root/reference/src/ann_search.cpp:397-691`)
streams the query table through one in-process index; here BOTH sides
may be arbitrarily large DataFrames.

Plan (IVF-style cell co-partitioning):

1. train `nlist` centroids from a bounded, deterministic sample of the
   base side (driver numpy k-means — O(cap·dim) memory regardless of
   table size);
2. one narrow pass assigns each base row to its nearest cell and each
   query row to its `nprobe` nearest cells (queries explode ×nprobe);
3. score within cells:
   * fast path (default): COGROUP both sides on `cell`
     (`applyInPandas`) — the only exchange moves each base row once and
     each query row `nprobe` times; every cell scores as ONE
     (|q_cell|, |b_cell|) BLAS GEMM + tie-safe partial top-k. Candidate
     pairs are never materialized as rows.
   * exact path (`method='exact'`): equi-join on `cell` + the JVM
     sequential-fold distance — bit-exact vs the DuckDB LATERAL oracle
     (this is the hash-compared driver entry at `nprobe >= nlist`).
4. a per-query window merges cell-local top-k into the global top-k.

`nprobe >= nlist` degenerates to the exact k-NN join (every pair
scored). Cells are the unit of parallelism on the fast path — pick
`nlist` at least the cluster parallelism so no task owns too much of
the corpus, and `salt=s` to sub-split skewed cells (the one shuffle
AQE's skew-join cannot touch) into s tasks each.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.distance import (
    index_distance,
    np_index_distances,
    np_stack_vectors,
    np_topk_frame,
)
from ..index.ivf import _kmeans, auto_nlist, auto_nprobe
from ..local import local_df

DISTANCE_COL = "_distance"
CELL_COL = "__cell"


def _assign_cells(df: DataFrame, vec_col: str, centroids: np.ndarray,
                  metric: str, nprobe: int, out_cols: list[str]) -> DataFrame:
    """Narrow pass: nearest `nprobe` cells per row (exploded)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def assign(batches):
        cm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np_stack_vectors(pdf[vec_col])
            d = np_index_distances(metric, mat, cm)  # (nlist, n)
            cells = np.argsort(d, axis=0, kind="stable")[:nprobe]  # (p, n)
            out = pdf[out_cols].iloc[
                np.tile(np.arange(len(pdf)), nprobe)
            ].copy()
            out[CELL_COL] = cells.reshape(-1).astype(np.int32)
            yield out

    schema_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name in out_cols
    )
    return df.mapInPandas(assign, schema=f"{schema_fields}, {CELL_COL} int")


def knn_join(
    queries_df: DataFrame,
    query_id_col: str,
    query_vec_col: str,
    base_df: DataFrame,
    base_id_col: str,
    base_vec_col: str,
    k: int,
    metric: str = "l2",
    nlist: int = 64,
    nprobe: int = 8,
    method: str = "blas",
    n_rows: int | None = None,
    salt: int = 1,
) -> DataFrame:
    """→ DataFrame(<query_id_col>, <base_id_col>, _distance), the k
    nearest base rows per query row (ties on base id ascending).

    Exact when `nprobe >= nlist`; otherwise approximate with IVF-probe
    recall characteristics. Pass `n_rows` (the base row count) when
    known to skip the counting pass over the base side.

    `salt` handles CELL SKEW on the cogroup fast path — the one shuffle
    AQE's skew-join cannot split (a whole cell is one task). With
    salt=s, each base row lands in sub-bucket (cell, hash(id) mod s)
    and each query replicates to all s sub-buckets of its probed cells,
    so the largest task is 1/s of the hottest cell by construction; the
    per-query window merge already unions partial top-k correctly.
    Exchange cost: base x1 (unchanged), queries x(nprobe*s).
    """
    spark = base_df.sparkSession
    if query_vec_col == base_vec_col:
        queries_df = queries_df.withColumnRenamed(
            query_vec_col, f"_q_{query_vec_col}"
        )
        query_vec_col = f"_q_{query_vec_col}"
    if query_id_col == base_id_col:
        queries_df = queries_df.withColumnRenamed(
            query_id_col, f"_q_{query_id_col}"
        )
        query_id_col = f"_q_{query_id_col}"

    # bounded deterministic train sample from the base side
    n = base_df.count() if n_rows is None else int(n_rows)
    if nlist == 0:
        nlist = auto_nlist(n)  # shared sqrt-N rule, same as ivf_nlist=0
    cap = min(max(50 * nlist, 10_000), 200_000)
    sample = base_df.select(base_vec_col)
    if n > cap:
        modulus = max(1, n // cap)
        sample = base_df.where(
            F.pmod(F.abs(F.hash(F.col(base_id_col))), F.lit(modulus)) == 0
        ).select(base_vec_col)
    train = np_stack_vectors(sample.limit(cap).toPandas()[base_vec_col])
    centroids = _kmeans(train, min(nlist, max(1, len(train))))
    nlist_eff = centroids.shape[0]
    if nprobe == 0:
        # nprobe=0 = AUTO: the same recall-calibrated rule as
        # ivf_nlist=0/nprobe=0 index search (see ivf.auto_nprobe)
        nprobe = auto_nprobe(nlist_eff, int(centroids.shape[1]))
    nprobe = min(max(1, nprobe), nlist_eff)

    b = _assign_cells(
        base_df.select(base_id_col, base_vec_col), base_vec_col, centroids,
        metric, 1, [base_id_col, base_vec_col],
    )
    q = _assign_cells(
        queries_df.select(query_id_col, query_vec_col), query_vec_col,
        centroids, metric, nprobe, [query_id_col, query_vec_col],
    )

    out_schema = (
        f"{query_id_col} long, {base_id_col} long, {DISTANCE_COL} double"
    )
    if method == "exact":
        # bit-exact JVM fold over materialized candidate pairs — the
        # oracle path (hash-compared against DuckDB's LATERAL join)
        cand = q.join(b, on=CELL_COL)  # ONLY wide exchange: cell equi-join
        scored = cand.withColumn(
            DISTANCE_COL,
            index_distance(
                metric, base_vec_col,
                F.col(query_vec_col).cast("array<double>"),
            ),
        )
    else:
        # fast path: COGROUP both sides by cell instead of materializing
        # candidate pairs. The exchange then carries each base row once
        # and each query row nprobe times — never |q_cell| x |b_cell|
        # pair rows with two vectors aboard — and each cell scores as
        # ONE (nq, nb) GEMM + tie-safe partial top-k. Cells are the unit
        # of parallelism: pick nlist >= cluster parallelism so no single
        # task owns too much of the corpus.

        def score_cell(qpdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
            if not len(qpdf) or not len(bpdf):
                return pd.DataFrame(
                    {query_id_col: np.array([], dtype=np.int64),
                     base_id_col: np.array([], dtype=np.int64),
                     DISTANCE_COL: np.array([], dtype=np.float64)}
                )
            qm = np_stack_vectors(qpdf[query_vec_col])
            bm = np_stack_vectors(bpdf[base_vec_col])
            d = np_index_distances(metric, bm, qm)  # (nq, nb)
            kk = min(k, bm.shape[0])
            return np_topk_frame(
                d, bpdf[base_id_col].to_numpy(),
                qpdf[query_id_col].to_numpy(), kk, base_id_col,
                DISTANCE_COL, qidx_col=query_id_col, qidx_dtype=np.int64,
            )

        salt = max(1, int(salt))
        if salt > 1:
            # deterministic sub-split: base by id hash, queries to all
            # sub-buckets (see docstring; exactness per (cell, salt)
            # pair is preserved — every (q, b) candidate pair still
            # meets in exactly one group)
            b = b.withColumn(
                "_salt", F.pmod(F.abs(F.hash(F.col(base_id_col))), F.lit(salt))
            )
            q = q.withColumn(
                "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
            )
            group_cols = [CELL_COL, "_salt"]
        else:
            group_cols = [CELL_COL]
        scored = (
            q.groupby(*group_cols)
            .cogroup(b.groupby(*group_cols))
            .applyInPandas(score_cell, schema=out_schema)
        )

    w = Window.partitionBy(query_id_col).orderBy(
        F.col(DISTANCE_COL).asc_nulls_last(), F.col(base_id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(query_id_col, base_id_col, DISTANCE_COL)
    )
