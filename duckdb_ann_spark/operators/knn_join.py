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
    """Narrow pass: nearest `nprobe` cells per row (exploded).

    mapInArrow (round 12, same fix as the IVF build assignment): the
    vector matrix reshapes zero-copy from the Arrow buffer and the
    nprobe-fold row explosion is one vectorized `RecordBatch.take`
    instead of a pandas `.iloc` on an object-Series frame."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def assign(batches):
        import pyarrow as pa

        from ..functions.distance import np_from_arrow_list

        cm = bc.value
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            col = b.column(b.schema.get_field_index(vec_col))
            mat = np_from_arrow_list(col, cm.shape[1])
            if mat is None:
                mat = np_stack_vectors(
                    b.select([vec_col]).to_pandas()[vec_col]
                )
            d = np_index_distances(metric, mat, cm)  # (nlist, n)
            cells = np.argsort(d, axis=0, kind="stable")[:nprobe]  # (p, n)
            taken = b.select(out_cols).take(
                pa.array(np.tile(np.arange(n, dtype=np.int64), nprobe))
            )
            yield pa.RecordBatch.from_arrays(
                [taken.column(i) for i in range(taken.num_columns)]
                + [pa.array(cells.reshape(-1).astype(np.int32), type=pa.int32())],
                names=[*out_cols, CELL_COL],
            )

    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema_fields = ", ".join(f"{c} {types[c]}" for c in out_cols)
    return df.mapInArrow(assign, schema=f"{schema_fields}, {CELL_COL} int")


def knn_join(
    queries_df: DataFrame,
    query_id_col: str,
    query_vec_col: str,
    base_df: DataFrame,
    base_id_col: str,
    base_vec_col: str,
    k: int,
    metric: str = "l2",
    nlist: int = 0,
    nprobe: int = 0,
    method: str = "blas",
    n_rows: int | None = None,
    salt: int = 1,
    calibration_queries: int = 64,
    target_recall: float | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """→ DataFrame(<query_id_col>, <base_id_col>, _distance), the k
    nearest base rows per query row (ties on base id ascending).

    Exact when `nprobe >= nlist`; otherwise approximate with IVF-probe
    recall characteristics. The DEFAULT (`nlist=0, nprobe=0`) trains
    auto-sized cells (`ivf.auto_nlist`, the sqrt-N rule) and — round
    10 — MEASURES the probe→recall curve of those freshly-trained
    cells on a held-out sample of the base side
    (`calibration.measure_probe_calibration`, the same pass a CREATE
    INDEX runs), probing what THIS data measurably needs instead of
    the static uniform-worst-case `auto_nprobe` guess: on clustered
    real data the static rule over-probes by ~an order of magnitude
    (bench: measured frac 0.009 vs 0.354 at 100k/clustered), and the
    fresh-build path is the operator's default face. The measurement
    is one extra narrow scan of the base side (the join already pays
    two: train sample + assignment); `calibration_queries=0` skips it
    and falls back to the static rule, which still holds the
    reference's 0.70 floor with margin even on uniform vectors
    (bench-asserted at 100k: `scale100k_knn_join_auto`).

    `target_recall` (round 10, same contract as
    `index_scan(target_recall=)`): resolve the probe count for THIS
    call from the freshly measured curve instead of the floor target —
    requires the measurement (errors loud with `calibration_queries=0`
    or a degenerate curve), mutually exclusive with an explicit
    `nprobe`. Cell-level recall: cells are scanned exactly, so the
    target is end recall modulo the sample noise.

    Pinning a small fixed `nprobe` buys latency at UNCHARACTERIZED
    recall (the 100k bench measures 0.264 at nprobe=4/nlist=512) — do
    that only with your own recall measurement in hand; for the least
    probe work that still clears the 0.70 floor, pass
    `nprobe=ivf.floor_nprobe(ivf.auto_nlist(n), dim)` (the measured
    0.7x rule — sweep table in its docstring). Pass `n_rows`
    (the base row count) when known to skip the counting pass over the
    base side.

    `stats`: pass a dict to observe the resolved configuration — the
    call records `nlist` (effective trained cells), `nprobe` (resolved
    probe count) and `measured` (whether the in-call calibration
    produced it) before returning. Observability only; results don't
    depend on it.

    `salt` handles CELL SKEW on the cogroup fast path — the one shuffle
    AQE's skew-join cannot split (a whole cell is one task). With
    salt=s, each base row lands in sub-bucket (cell, hash(id) mod s)
    and each query replicates to all s sub-buckets of its probed cells,
    so the largest task is 1/s of the hottest cell by construction; the
    per-query window merge already unions partial top-k correctly.
    Exchange cost: base x1 (unchanged), queries x(nprobe*s).
    """
    spark = base_df.sparkSession
    # argument-only validation fires BEFORE the count/train/kmeans work
    # (round-10 review: a bad target_recall must not cost a pass over a
    # 100M-row base first)
    if target_recall is not None:
        if nprobe:
            raise ValueError(
                "pass either nprobe (an explicit probe count) or "
                "target_recall, not both"
            )
        if not (0.0 < float(target_recall) <= 1.0):
            raise ValueError("target_recall must be in (0, 1]")
        if int(calibration_queries) <= 0:
            raise ValueError(
                "target_recall needs the in-call probe measurement — "
                "don't pass calibration_queries=0 with it"
            )
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
    # Arrow-pass dtype normalization (round-13 advice): the assignment
    # mapInArrow, the applyInArrow cogroup, and the in-call calibration
    # scan all declare long/array<float> schemas and do not coerce —
    # cast BOTH sides once here (no-op for already-typed frames)
    from ..functions.distance import cast_id_vec

    base_df = cast_id_vec(base_df, base_id_col, base_vec_col)
    queries_df = cast_id_vec(queries_df, query_id_col, query_vec_col)

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
    measured = False
    if nprobe == 0 and int(calibration_queries) > 0 and nlist_eff > 1:
        # nprobe=0 = AUTO (round 10): measure THIS join's freshly
        # trained cells on a held-out base sample — the same build-time
        # pass a CREATE INDEX runs — so clustered data gets the small
        # probe count it actually needs instead of the static
        # uniform-worst-case rule (see docstring)
        from ..index.calibration import (
            IVF_TARGET,
            measure_probe_calibration,
            nprobe_for_target,
        )

        cal = measure_probe_calibration(
            base_df.select(base_id_col, base_vec_col), base_id_col,
            base_vec_col, centroids, metric, n, IVF_TARGET,
            n_queries=int(calibration_queries),
        )
        if target_recall is not None:
            nprobe = nprobe_for_target({"calibration": cal}, target_recall)
            if nprobe <= 0:
                raise ValueError(
                    "knn_join: the in-call probe measurement came back "
                    "degenerate (too few rows/cells) — target_recall "
                    "cannot be honored; drop target_recall and pass an "
                    "explicit nprobe"
                )
            measured = True
        elif cal is not None:
            nprobe = int(cal["nprobe"])
            measured = True
    elif target_recall is not None:
        raise ValueError(
            "knn_join: target_recall needs >1 trained cell to measure "
            "a curve; drop target_recall and pass an explicit nprobe"
        )
    if nprobe == 0:
        # static fallback: calibration disabled or degenerate — the
        # uniform-worst-case rule, same as ivf_nlist=0/nprobe=0 search
        nprobe = auto_nprobe(nlist_eff, int(centroids.shape[1]))
    nprobe = min(max(1, nprobe), nlist_eff)
    if stats is not None:
        stats.update(
            nlist=int(nlist_eff), nprobe=int(nprobe), measured=bool(measured)
        )

    b = _assign_cells(
        base_df.select(base_id_col, base_vec_col), base_vec_col, centroids,
        metric, 1, [base_id_col, base_vec_col],
    )
    q = _assign_cells(
        queries_df.select(query_id_col, query_vec_col), query_vec_col,
        centroids, metric, nprobe, [query_id_col, query_vec_col],
    )

    return _cell_scored_topk(
        q, b, query_id_col, query_vec_col, base_id_col, base_vec_col,
        k, metric, method, salt,
    )


def _cell_scored_topk(
    q: DataFrame,
    b: DataFrame,
    query_id_col: str,
    query_vec_col: str,
    base_id_col: str,
    base_vec_col: str,
    k: int,
    metric: str,
    method: str,
    salt: int,
) -> DataFrame:
    """Scoring stage shared by `knn_join` (freshly-trained cells) and
    `index_knn_join` (cells of a published IVF index): both sides arrive
    already carrying `__cell`; score within cells, merge per-query
    top-k."""
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

        def score_cell(qtab, btab):
            # applyInArrow (round 12, same fix as the scan paths): both
            # sides' vector matrices reshape zero-copy from the Arrow
            # buffers instead of round-tripping pandas object Series
            import pyarrow as pa

            from ..functions.distance import np_from_arrow_list

            empty = pa.table(
                {query_id_col: pa.array([], type=pa.int64()),
                 base_id_col: pa.array([], type=pa.int64()),
                 DISTANCE_COL: pa.array([], type=pa.float64())}
            )
            if qtab.num_rows == 0 or btab.num_rows == 0:
                return empty

            qcol = qtab.column(qtab.schema.get_field_index(query_vec_col))
            bcol = btab.column(btab.schema.get_field_index(base_vec_col))
            qdim = len(qcol[0].as_py() or [])
            bdim = len(bcol[0].as_py() or [])
            qm = np_from_arrow_list(qcol, qdim)
            if qm is None:
                qm = np_stack_vectors(qcol.to_pandas())
            bm = np_from_arrow_list(bcol, bdim)
            if bm is None:
                bm = np_stack_vectors(bcol.to_pandas())
            d = np_index_distances(metric, bm, qm)  # (nq, nb)
            kk = min(k, bm.shape[0])
            qids = qtab.column(
                qtab.schema.get_field_index(query_id_col)
            ).to_numpy(zero_copy_only=False)
            bids = btab.column(
                btab.schema.get_field_index(base_id_col)
            ).to_numpy(zero_copy_only=False)
            frame = np_topk_frame(
                d, bids, qids, kk, base_id_col,
                DISTANCE_COL, qidx_col=query_id_col, qidx_dtype=np.int64,
            )
            return pa.Table.from_pandas(frame, preserve_index=False)

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
            .applyInArrow(score_cell, schema=out_schema)
        )

    w = Window.partitionBy(query_id_col).orderBy(
        F.col(DISTANCE_COL).asc_nulls_last(), F.col(base_id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(query_id_col, base_id_col, DISTANCE_COL)
    )


def index_knn_join(
    spark,
    index_name: str,
    queries_df: DataFrame,
    query_id_col: str,
    query_vec_col: str,
    k: int,
    nprobe: int = 0,
    method: str = "blas",
    catalog=None,
    salt: int = 1,
    target_recall: float | None = None,
) -> DataFrame:
    """k-NN join against a PUBLISHED IVFFlat index instead of freshly
    trained cells → (query_id, <index id col>, _distance).

    `target_recall` (round 10, the `index_scan` contract on the join
    surface): resolve the probe count for THIS call from the index's
    measured build-time curve — mutually exclusive with an explicit
    `nprobe`, loud failure on artifacts without a measurement.

    `knn_join` pays, on every call, a kmeans train (driver), a full
    assignment pass over the base side, and the base-side exchange into
    cells. A table that is joined against repeatedly should pay those
    once — at CREATE INDEX time. This operator reuses the index
    artifact the IVF engine already maintains (beyond-reference: the
    reference's `ann_search_table` streams a query table through one
    in-process index, `src/ann_search.cpp:397-691`; here the query side
    is an arbitrary DataFrame and the scoring is distributed):

    * centroids: the tiny driver-side table (`ivf._centroids`);
    * base side: the cell-PARTITIONED vectors parquet read as-is — no
      assignment pass, no exchange; pruned to the union of probed cells
      (partition pruning, same as index search);
    * query side: one narrow assignment pass to its `nprobe` nearest
      cells, then the same cogroup-GEMM / exact scoring as `knn_join`.
      `nprobe=0` resolves exactly like `index_scan` on this index
      (round 9): the index's own PINNED build nprobe when one was set
      (reference semantics — FAISS defaults nprobe=1, and the join
      must score the same cells a search of that index would), else
      the index's measured build-time calibration, else the static
      `auto_nprobe` rule. To force full-probe regardless of the pin,
      pass `nprobe >= nlist`.

    Tombstoned ids are anti-joined off the base side before scoring, so
    results match a vacuumed index. `nprobe >= nlist` degenerates to
    the exact k-NN join (`method='exact'` for bit-exact distances).
    """
    from ..index.api import _deleted_ids, _load
    from ..index.ivf import CELL_COL as IVF_CELL_COL
    from ..index.ivf import VECTORS_DIR, IvfFlatEngine, auto_nprobe

    cat, manifest, d, impl = _load(index_name, "", catalog)
    if not isinstance(impl, IvfFlatEngine):
        raise ValueError(
            f"index_knn_join needs an IVFFlat index; '{index_name}' is "
            f"{manifest['engine']}/{manifest.get('subtype', '')} (graph "
            "engines have no cell layout to join against — use knn_join, "
            "or ann_search_table for a small query side)"
        )
    base_id_col = manifest["id_col"]
    base_vec_col = manifest["vec_col"]
    metric = manifest["params"]["metric"]
    centroids = impl._centroids(spark, d)
    nlist_eff = centroids.shape[0]
    if nlist_eff == 0:
        raise ValueError(f"index '{index_name}' is empty (no trained cells)")
    if target_recall is not None:
        if nprobe:
            raise ValueError(
                "pass either nprobe (an explicit probe count) or "
                "target_recall, not both"
            )
        if not (0.0 < float(target_recall) <= 1.0):
            raise ValueError("target_recall must be in (0, 1]")
        from ..index.calibration import nprobe_for_target

        nprobe = nprobe_for_target(manifest, target_recall)
        if nprobe <= 0:
            raise ValueError(
                f"index '{index_name}' carries no measured recall curve "
                "(built with a pinned nprobe or calibration_queries=0, "
                "or pre-dates build-time calibration) — rebuild with "
                "nprobe=0 to measure, or pass an explicit nprobe"
            )
    elif nprobe == 0:
        # mirror index_scan's resolution exactly (round-9 fix — the old
        # jump straight to the static rule diverged from index_scan on
        # indexes with a PINNED build nprobe): the manifest's own
        # nprobe when pinned > the index's measured floor-clearing
        # count (build-time calibration) > the static worst-case rule
        from ..index.calibration import calibrated_nprobe

        nprobe = (
            int(manifest["params"].get("nprobe", 0) or 0)
            or calibrated_nprobe(manifest)
            or auto_nprobe(nlist_eff, int(manifest["dim"]))
        )
    nprobe = min(max(1, nprobe), nlist_eff)

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

    b = spark.read.parquet(f"{d}/{VECTORS_DIR}")
    if IVF_CELL_COL != CELL_COL:  # pragma: no cover - same constant today
        b = b.withColumnRenamed(IVF_CELL_COL, CELL_COL)
    deleted = _deleted_ids(spark, d, manifest)
    if deleted is not None:
        b = b.join(F.broadcast(deleted), on=base_id_col, how="anti")
    sq8 = impl._sq8_params(manifest)
    from ..functions.distance import cast_id_vec

    q = _assign_cells(
        cast_id_vec(queries_df, query_id_col, query_vec_col),
        query_vec_col, centroids, metric, nprobe,
        [query_id_col, query_vec_col],
    )
    if nprobe < nlist_eff:
        # partition pruning: only cells some query probes are scanned.
        # Collecting the distinct probed cells re-runs the (narrow,
        # cheap) query assignment pass once more — worth it whenever the
        # base outweighs the query side, which is this operator's use
        # case: it converts the base-side read+cogroup from ALL cells to
        # the probed union (a query workload with locality probes far
        # fewer than nlist cells). The collect is bounded by nlist_eff
        # ints. Cells probed by nobody would only cogroup against empty
        # query groups — pruning is a scan optimization, not a
        # correctness requirement.
        probed = [
            int(r[CELL_COL])
            for r in q.select(CELL_COL).distinct().collect()
        ]
        if len(probed) < nlist_eff:
            b = b.where(F.col(CELL_COL).isin(probed))
    if sq8 is not None:
        # dequantize AFTER the cell pruning so the parquet scan still
        # reads only the probed cells' (1/4-size) code files
        from ..index.ivf import _decode_cells_df

        b = _decode_cells_df(b, base_id_col, base_vec_col, sq8,
                             with_cell=True)
    return _cell_scored_topk(
        q, b, query_id_col, query_vec_col, base_id_col, base_vec_col,
        k, metric, method, salt,
    )
