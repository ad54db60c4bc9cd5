"""Index parameter sets with the reference's defaults and validation.

DiskANN: `/root/reference/src/include/diskann_index.hpp:20-59`
(metric=L2, max_degree=64, build_complexity=128, alpha=1.2,
quantization='sq8' opt-in). FAISS:
`/root/reference/src/include/faiss_index.hpp:37-113` (metric=L2,
type=Flat, hnsw_m=32, ivf_nlist=100, nprobe=1 clamped >=1,
train_sample=0, description, mode cpu/gpu/auto).

Engine metrics are L2 and IP only — cosine is recognized by the
optimizer but no engine can be created with it
(`rust_lib/src/ffi.rs:202-209`, SURVEY §1.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

ENGINE_METRICS = ("l2", "ip")


def _norm_metric(metric: str) -> str:
    m = metric.lower()
    if m not in ENGINE_METRICS:
        # reference wording: rust_lib/src/ffi.rs:202-209
        raise ValueError(f"Unknown metric '{metric}'. Supported: L2, IP")
    return m


@dataclass
class DiskannParams:
    metric: str = "l2"
    max_degree: int = 64
    build_complexity: int = 128
    alpha: float = 1.2
    quantization: str = ""  # 'sq8' to enable
    # entry-point strategy (start_point.rs:19-41): 'first' = FirstVector
    # (the reference's engine default), 'medoid' = Medoid, 'random' =
    # RandomSamples, 'latin_hypercube' = LatinHyperCube (snapped to
    # nearest dataset rows — see vamana_core.select_entry_points)
    start_strategy: str = "first"
    # sample count + seed for the sampling strategies (random /
    # latin_hypercube); ignored by first/medoid like the reference's
    # per-variant params
    start_nsamples: int = 1
    start_seed: int = 42
    # Spark extension (not in the reference): number of independent graph
    # shards built in parallel; 1 = reference-parity sequential build,
    # 0 = AUTO: one graph up to `auto_shard_rows()` rows, then one shard
    # per that budget. The budget is DEGREE-AWARE since round 9 — at the
    # reference-default degree 64 it is the historical 25k threshold
    # (default builds keep the reference's single-graph layout exactly),
    # but a degree-16 graph on uniform 64-dim holds ~0.8 local recall@10
    # (at the default L=build_complexity) only to ~1.5k rows; capacity
    # grows ~degree^3 (measured 0.811 at 1.5k / 0.483 at 12k / 0.336 at
    # 25k for degree 16, 0.872 at 12k for degree 32). The old flat 25k
    # budget was a silent recall cliff whenever the user lowered
    # max_degree for cheap builds — the 1M gated smoke measured end
    # recall 0.422 at degree 16 with 25k-row shards. Explicit `shards=N`
    # is always honored as-is.
    shards: int = 0
    # Spark extension: how rows map to graph shards.
    # 'hash' = uniform hash of the id — perfectly balanced, but every
    # query must search EVERY shard (per-query work grows linearly with
    # the corpus). 'cells' = kmeans cells (the SPANN/clustered-DiskANN
    # shape): shards are spatial, a search probes only the
    # `route_nprobe` nearest shards — per-query work stays ~constant as
    # the corpus grows; at the 100k/128-shard bench config routed
    # search holds 0.87 recall@10 at ~0.6x the full fan-out wall.
    # 'auto' (default since round 8): resolve at build time — 'cells'
    # past 8 shards (the scale regime, where linear fan-out is the
    # wrong default at 100 TB), 'hash' at <=8 (full fan-out is the
    # recall ceiling there and routing would resolve to near-full
    # fan-out anyway). The RESOLVED value is recorded in the manifest,
    # so artifacts stay self-describing and vacuum/merge rebuilds keep
    # the layout they were created with.
    shard_by: str = "auto"
    # probed shard count for shard_by='cells' search; 0 = AUTO: prefer
    # the PER-INDEX measured floor-clearing probe count the build
    # recorded in the manifest (`route_calibration` — see
    # index/calibration.py, round 9), falling back to the static
    # uniform-worst-case ivf.auto_route_nprobe rule for artifacts
    # without a measurement
    route_nprobe: int = 0
    # held-out query sample size for the build-time probe calibration
    # (Spark extension, round 9): the build measures recall-vs-probed-
    # shards on this many hash-sampled queries and stores the
    # floor-clearing count in the manifest. 0 disables (manifest carries
    # no measurement; route_nprobe=0 then rides the static rule). Only
    # consulted by shard_by='cells' builds.
    calibration_queries: int = 64

    AUTO_SHARD_ROWS = 25_000

    def auto_shard_rows(self) -> int:
        """Per-shard row budget (and single-graph threshold) for
        `shards=0` resolution: what a graph of THIS degree can serve at
        ~0.8 local recall@10 with the default L=build_complexity,
        measured on uniform 64-dim vectors (the worst case — see the
        `shards` field comment). Capacity ~d^3, anchored at degree 16 →
        1.5k rows; the reference-default degree 64 lands above the 25k
        cap, so default builds keep the historical layout exactly.
        The degree-64 AT-CAP point is MEASURED, not extrapolated
        (round 10): 25k uniform 64-dim rows, degree 64 / L 128 →
        local recall@10 = 1.000 (50 queries; single-shard build wall
        ~29 min of CPU — the d^3 rule's 96k extrapolated capacity is
        far above the cap, and the measurement agrees with room to
        spare). The cap therefore stays an OPERATIONAL bound (append
        rewrite cost, task memory), not a recall bound, at default
        degrees.

        Round-9 shard-budget sweep (100k x 128-dim uniform, degree 16 /
        build_complexity 32, 50 queries, k=10, local[32]; canaries
        cal_gemm 0.087 / cal_py 0.70 / cal_spark 0.095):

            shards  rows/shard  hash build/recall   cells build/recall (rnp)
            4       25,000      105.3s / 0.264      226.9s / 0.242  (4=all)
            9       11,112       39.9s / 0.426      173.1s / 0.374  (8)
            13       7,693       39.1s / 0.514       63.1s / 0.436  (10)
            32       3,125       18.4s / 0.674       35.1s / 0.610  (23)
            67       1,493       17.9s / 0.864       26.6s / 0.720  (46)

        Search walls were flat (0.67-1.0s) across the whole sweep. At a
        fixed low degree, MORE shards are strictly better on both axes
        that matter — the old flat 25k budget (4 shards here) was the
        slowest build AND the worst recall, and 67 (this rule) is the
        only row clearing the reference's 0.70 floor. The routing
        (cells) column pays kmeans+assignment+calibration at build and
        probes 0.69x of shards at this tiny tier; its payoff is
        query-work ~constant in corpus size — at 1M the gated smoke
        measures 188/667 shards probed (0.28, vs the 0.72 static rule)
        at end recall 0.823 for degree-16 Vamana, and 74/167 (0.44) at
        0.829 for m=16 HNSW."""
        cap = max(1_000, int(1_500 * (int(self.max_degree) / 16) ** 3))
        return min(int(self.AUTO_SHARD_ROWS), cap)

    def __post_init__(self) -> None:
        self.metric = _norm_metric(self.metric)
        if self.max_degree <= 0:
            raise ValueError("max_degree must be positive")
        if self.build_complexity <= 0:
            raise ValueError("build_complexity must be positive")
        if self.shards < 0:
            raise ValueError("shards must be >= 1 (or 0 for auto)")
        self.shard_by = str(self.shard_by).lower()
        if self.shard_by not in ("auto", "hash", "cells"):
            raise ValueError(
                f"Unknown shard_by '{self.shard_by}'. "
                "Supported: auto, hash, cells"
            )
        if int(self.route_nprobe) < 0:
            raise ValueError("route_nprobe must be >= 1 (or 0 for auto)")
        if self.quantization and self.quantization.lower() != "sq8":
            raise ValueError(
                f"Unknown quantization '{self.quantization}'. Supported: sq8"
            )
        self.start_strategy = (self.start_strategy or "first").lower()
        from .vamana_core import START_STRATEGIES

        if self.start_strategy not in START_STRATEGIES:
            raise ValueError(
                f"Unknown start_strategy '{self.start_strategy}'. "
                f"Supported: {', '.join(START_STRATEGIES)}"
            )
        if int(self.start_nsamples) < 1:
            raise ValueError("start_nsamples must be >= 1")
        if int(self.calibration_queries) < 0:
            raise ValueError("calibration_queries must be >= 0 (0 disables)")

    @property
    def quantize_sq8(self) -> bool:
        return self.quantization.lower() == "sq8"

    def to_manifest(self) -> dict:
        return {
            "metric": self.metric,
            "max_degree": self.max_degree,
            "build_complexity": self.build_complexity,
            "alpha": self.alpha,
            "quantization": self.quantization,
            "shards": self.shards,
            "shard_by": self.shard_by,
            "route_nprobe": self.route_nprobe,
            "calibration_queries": self.calibration_queries,
            "start_strategy": self.start_strategy,
            "start_nsamples": self.start_nsamples,
            "start_seed": self.start_seed,
        }


FAISS_TYPES = ("flat", "hnsw", "ivfflat")


@dataclass
class FaissParams:
    metric: str = "l2"
    type: str = "Flat"
    hnsw_m: int = 32
    # reference default 100; 0 = AUTO (Spark extension): nlist =
    # clamp(floor(sqrt(N)), 16, 65536) at build time, the README's
    # "cells stay ~sqrt(N) rows" sizing rule applied automatically
    ivf_nlist: int = 100
    # reference default 1; 0 = AUTO (Spark extension): prefer the
    # PER-INDEX measured floor-clearing probe count the build recorded
    # in the manifest (`calibration`, round 9 — index/calibration.py),
    # falling back to the static uniform-worst-case ivf.auto_nprobe
    # rule for artifacts without a measurement
    nprobe: int = 1
    train_sample: int = 0
    description: str = field(default="")
    # Spark extension (not in the reference): HNSW graph shards built in
    # parallel executors; 0 = AUTO (single graph up to `auto_shard_rows()`
    # — structurally identical to the reference's one-HNSW-per-index —
    # then one shard per that budget; degree-aware since round 9: ~m^3
    # capacity, the historical 25k at the default m=32 but 6k at m=16 —
    # so a big CREATE INDEX never collects the table to the driver AND
    # a low-m build gets shards its graphs can actually serve); 1 =
    # forced reference-parity single graph (kept for byte-stable
    # single-graph tests)
    shards: int = 0
    # shard routing for type='HNSW' (see DiskannParams.shard_by):
    # 'hash' = search all shards, 'cells' = kmeans-routed shards probed
    # via route_nprobe (0 = auto), 'auto' (default) = 'cells' past 8
    # shards, 'hash' otherwise, resolved at build time into the
    # manifest. Ignored by Flat/IVFFlat.
    shard_by: str = "auto"
    route_nprobe: int = 0
    # build-time probe-calibration sample size (round 9, same contract
    # as DiskannParams.calibration_queries): consulted by IVFFlat
    # builds (cell-level recall curve → manifest `calibration`) and by
    # HNSW shard_by='cells' builds (routing curve →
    # `route_calibration`). 0 disables.
    calibration_queries: int = 64
    AUTO_SHARD_ROWS = 25_000

    def auto_shard_rows(self) -> int:
        """Degree-aware per-shard budget for HNSW `shards=0` resolution
        past the single-graph threshold (same contract as
        `DiskannParams.auto_shard_rows`). Layered HNSW navigates better
        than a flat graph at equal m — measured local recall@10 on
        uniform 64-dim at the default ef=ef_construction: m=16 holds
        0.949 at 1.5k / 0.792 at 6k / 0.572 at 25k rows — so the anchor
        is m=16 → 6k rows, capacity ~m^3. The default m=32 lands above
        the 25k cap (layout unchanged). Flat/IVFFlat don't graph-shard.
        The m=32 AT-CAP point is MEASURED, not extrapolated (round 10):
        25k uniform 64-dim rows, m=32 / ef=ef_construction=64 → local
        recall@10 = 0.956 (0.986 at ef 128; 50 queries, 51s build) —
        at the default m the cap is an operational bound, not a recall
        bound."""
        if self.type.lower() != "hnsw":
            return int(self.AUTO_SHARD_ROWS)
        cap = max(1_000, int(6_000 * (int(self.hnsw_m) / 16) ** 3))
        return min(int(self.AUTO_SHARD_ROWS), cap)

    # GPU placement (`src/faiss_index.cpp:84-152`): cpu / gpu / auto.
    # This engine's kernels are numpy/BLAS — there is never a GPU
    # backend (faiss_gpu_info reports available=false), so mode='gpu'
    # raises the reference's no-backend error and 'auto' silently runs
    # on CPU (its documented fallback). `gpu` is the legacy alias:
    # gpu='false' → cpu, gpu='true' → gpu (faiss_gpu.test:55-69).
    mode: str = "auto"
    gpu: object = None
    # SQ8 scalar quantization for the IVFFlat cell layout (round 13 —
    # the reference serves quantized vectors from its live index,
    # rust_lib/src/provider.rs:161-231; FAISS's own ScalarQuantizer
    # trains its per-dim min/scale on the TRAIN SAMPLE, which is the
    # semantics the distributed tier adopts). '' = fp32 (default),
    # 'sq8' = cells store u8 codes at 1/4 the scan bytes; search
    # dequantizes rows inside the Arrow scorer.
    quantization: str = ""
    # SQ8 envelope source (round 15 — r14 verdict item 6). 'train'
    # (default, faiss ScalarQuantizer semantics): per-dim min/scale from
    # the bounded train sample — values outside the sample's envelope
    # CLIP (observable via ann_index_info.sq8_clip_count, the
    # heavy-tailed-data hole). 'full': one extra distributed narrow
    # min/max pass over the WHOLE frame before encoding — clip count 0
    # by construction, at the cost of that one scan (measured at 1M x
    # 64d: +0.8s on a 21s build; see test_ivf_sq8_envelope_full).
    sq8_envelope: str = "train"

    def __post_init__(self) -> None:
        self.metric = _norm_metric(self.metric)
        if self.description:
            self._apply_description(self.description)
        if not self.type:
            self.type = "Flat"
        if self.type.lower() not in FAISS_TYPES:
            raise ValueError(
                f"Unknown FAISS index type '{self.type}'. Supported: Flat, HNSW, IVFFlat"
            )
        q = (self.quantization or "").lower()
        if q and q != "sq8":
            raise ValueError(
                f"Unknown quantization '{self.quantization}'. Supported: sq8"
            )
        if q and self.type.lower() != "ivfflat":
            raise ValueError(
                "quantization='sq8' applies to type='IVFFlat' (Flat is the "
                "exact engine; HNSW shards quantize via the DISKANN "
                "engine's quantization option)"
            )
        self.quantization = q
        self.sq8_envelope = str(self.sq8_envelope or "train").lower()
        if self.sq8_envelope not in ("train", "full"):
            raise ValueError(
                f"Unknown sq8_envelope '{self.sq8_envelope}'. "
                "Supported: train (sample envelope, faiss semantics), "
                "full (one distributed min/max pass, clip-free)"
            )
        # reference clamps nprobe to >= 1 (faiss_index.hpp:60-61);
        # nprobe=0 is OUR extension: AUTO — resolve a recall-calibrated
        # probe count at search time (ivf.auto_nprobe; pairs with
        # ivf_nlist=0). Negative keeps the reference clamp-to-1.
        self.nprobe = int(self.nprobe)
        if self.nprobe < 0:
            self.nprobe = 1
        if int(self.hnsw_m) < 1:
            # m=0 would build an edgeless graph whose every search
            # silently returns only the entry point
            raise ValueError("hnsw_m must be >= 1")
        if int(self.ivf_nlist) < 0:
            raise ValueError("ivf_nlist must be >= 1 (or 0 for auto)")
        if int(self.shards) < 0:
            raise ValueError("shards must be >= 1 (or 0 for auto)")
        self.shard_by = str(self.shard_by).lower()
        if self.shard_by not in ("auto", "hash", "cells"):
            raise ValueError(
                f"Unknown shard_by '{self.shard_by}'. "
                "Supported: auto, hash, cells"
            )
        if int(self.route_nprobe) < 0:
            raise ValueError("route_nprobe must be >= 1 (or 0 for auto)")
        if int(self.calibration_queries) < 0:
            raise ValueError("calibration_queries must be >= 0 (0 disables)")
        if self.gpu is not None:
            if (self.mode or "auto").lower() != "auto":
                raise ValueError(
                    "Specify either mode= or the legacy gpu= option, not both"
                )
            # DuckDB boolean cast vocabulary — anything else is an error,
            # not a silent fallback to cpu
            s = str(self.gpu).lower()
            if s in ("true", "1", "yes", "t", "y", "on"):
                self.mode = "gpu"
            elif s in ("false", "0", "no", "f", "n", "off"):
                self.mode = "cpu"
            else:
                raise ValueError(f"Invalid boolean for gpu option: '{self.gpu}'")
            self.gpu = None
        self.mode = (self.mode or "auto").lower()
        if self.mode not in ("cpu", "gpu", "auto"):
            raise ValueError(
                f"Unknown mode '{self.mode}'. Supported: cpu, gpu, auto"
            )
        if self.mode == "gpu":
            # reference wording, src/faiss_index.cpp:118
            raise ValueError(
                "mode='gpu' requested but no GPU backend available"
            )

    def _apply_description(self, desc: str) -> None:
        """faiss `index_factory` strings (the reference passes `description`
        straight to faiss, `src/faiss_index.cpp:38-44`); we support the
        subset our engines cover: "Flat", "IVF<nlist>,Flat", "HNSW<m>"."""
        import re

        head = desc.split(",")[0].strip()
        if head.lower() == "flat":
            self.type = "Flat"
            return
        m = re.fullmatch(r"IVF(\d+)", head, re.IGNORECASE)
        if m:
            self.type = "IVFFlat"
            self.ivf_nlist = int(m.group(1))
            return
        m = re.fullmatch(r"HNSW(\d*)", head, re.IGNORECASE)
        if m:
            self.type = "HNSW"
            if m.group(1):
                self.hnsw_m = int(m.group(1))
            return
        raise ValueError(
            f"Unsupported FAISS factory description '{desc}'. "
            "Supported: Flat, IVF<nlist>,Flat, HNSW<m>"
        )

    @property
    def type_norm(self) -> str:
        return self.type.lower()

    def to_manifest(self) -> dict:
        return {
            "metric": self.metric,
            "type": self.type,
            "hnsw_m": self.hnsw_m,
            "ivf_nlist": self.ivf_nlist,
            "nprobe": self.nprobe,
            "train_sample": self.train_sample,
            "description": self.description,
            "mode": self.mode,
            "shards": self.shards,
            "shard_by": self.shard_by,
            "route_nprobe": self.route_nprobe,
            "calibration_queries": self.calibration_queries,
            "quantization": self.quantization,
            "sq8_envelope": self.sq8_envelope,
        }

    @property
    def quantize_sq8(self) -> bool:
        return self.quantization == "sq8"


def _known_options(cls, options: dict) -> dict:
    """Reference parity (`diskann_index.hpp:27-45`): WITH-options are a
    case-insensitive map and unknown keys are silently ignored — the
    reference's Parse loop has no else branch."""
    from dataclasses import fields

    known = {f.name.lower(): f.name for f in fields(cls)}
    return {
        known[k.lower()]: v for k, v in options.items() if k.lower() in known
    }


def parse_params(engine: str, options: dict):
    e = engine.lower()
    if e == "diskann":
        return DiskannParams(**_known_options(DiskannParams, options))
    if e == "faiss":
        return FaissParams(**_known_options(FaissParams, options))
    raise ValueError(f"Unknown ANN engine '{engine}'. Supported: DISKANN, FAISS")
