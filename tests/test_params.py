"""Parameter parsing parity (diskann_index.hpp / faiss_index.hpp)."""

import pytest

from duckdb_ann_spark.index.params import DiskannParams, FaissParams, parse_params


def test_diskann_defaults():
    p = DiskannParams()
    assert (p.metric, p.max_degree, p.build_complexity, p.alpha) == \
        ("l2", 64, 128, 1.2)
    assert not p.quantize_sq8


def test_faiss_defaults():
    p = FaissParams()
    assert (p.type, p.hnsw_m, p.ivf_nlist, p.nprobe, p.train_sample) == \
        ("Flat", 32, 100, 1, 0)


def test_nprobe_clamped_to_one():
    assert FaissParams(nprobe=-5).nprobe == 1  # faiss_index.hpp:60-61


def test_metric_validation():
    with pytest.raises(ValueError, match="Supported: L2, IP"):
        DiskannParams(metric="cosine")
    assert DiskannParams(metric="IP").metric == "ip"


def test_quantization_validation():
    assert DiskannParams(quantization="SQ8").quantize_sq8
    with pytest.raises(ValueError, match="Supported: sq8"):
        DiskannParams(quantization="pq4")


@pytest.mark.parametrize("desc,typ,extra", [
    ("Flat", "Flat", {}),
    ("IVF64,Flat", "IVFFlat", {"ivf_nlist": 64}),
    ("IVF256,Flat", "IVFFlat", {"ivf_nlist": 256}),
    ("HNSW48", "HNSW", {"hnsw_m": 48}),
    ("HNSW", "HNSW", {"hnsw_m": 32}),
])
def test_factory_description(desc, typ, extra):
    """index_factory strings (faiss_index.cpp:38-44 passes description
    through; we parse the subset our engines cover)."""
    p = FaissParams(description=desc)
    assert p.type == typ
    for k, v in extra.items():
        assert getattr(p, k) == v


def test_factory_description_unsupported():
    with pytest.raises(ValueError, match="Unsupported FAISS factory"):
        FaissParams(description="PQ16")


def test_unknown_engine():
    with pytest.raises(ValueError, match="Supported: DISKANN, FAISS"):
        parse_params("annoy", {})


def test_faiss_mode_options():
    """mode=cpu/auto accepted and persisted; mode='gpu' raises the
    reference's no-backend error; gpu= legacy alias maps through
    (faiss_gpu.test:29-93, src/faiss_index.cpp:84-152,118)."""
    import pytest
    from duckdb_ann_spark.index.params import parse_params

    assert parse_params("faiss", dict(mode="cpu")).mode == "cpu"
    assert parse_params("faiss", dict()).mode == "auto"  # default
    assert parse_params("faiss", dict(mode="AUTO")).mode == "auto"
    assert parse_params("faiss", dict(gpu="false")).mode == "cpu"
    assert "mode" in parse_params("faiss", dict(mode="cpu")).to_manifest()
    with pytest.raises(ValueError, match="no GPU backend available"):
        parse_params("faiss", dict(mode="gpu"))
    with pytest.raises(ValueError, match="no GPU backend available"):
        parse_params("faiss", dict(gpu="true"))
    with pytest.raises(ValueError, match="Unknown mode"):
        parse_params("faiss", dict(mode="tpu"))


def test_options_case_insensitive_and_unknown_ignored():
    """WITH-options are a case-insensitive map and unknown keys are
    silently ignored (diskann_index.hpp:27-45: the Parse loop has no
    else branch)."""
    from duckdb_ann_spark.index.params import parse_params

    p = parse_params("diskann", dict(MAX_DEGREE=8, Alpha=1.1, bogus_opt=7))
    assert p.max_degree == 8 and p.alpha == 1.1
    q = parse_params("faiss", dict(TYPE="IVFFlat", IVF_NLIST=32, wat="x"))
    assert q.type_norm == "ivfflat" and q.ivf_nlist == 32


def test_auto_shard_rows_degree_aware():
    """Round-9 degree-aware auto shard budget: what a graph of the
    requested degree can serve at ~0.8 local recall@10 with the default
    L=build_complexity, measured on uniform 64-dim (see the docstrings
    for the measurement table). Capacity ~degree^3; the reference
    defaults (max_degree=64, hnsw_m=32) land on the 25k cap so their
    layouts are unchanged; low-degree builds get small shards instead
    of the flat 25k budget that measurably failed the 0.70 floor."""
    from duckdb_ann_spark.index.params import parse_params

    d = lambda deg: parse_params(
        "diskann", dict(max_degree=deg)
    ).auto_shard_rows()
    assert d(16) == 1_500
    assert d(32) == 12_000
    assert d(64) == 25_000  # reference default: cap, layout unchanged
    assert d(8) == 1_000  # floor
    h = lambda m: parse_params(
        "faiss", dict(type="HNSW", hnsw_m=m)
    ).auto_shard_rows()
    assert h(16) == 6_000
    assert h(32) == 25_000  # reference default: cap
    assert h(8) == 1_000
    # non-graph FAISS types never graph-shard: budget is the flat cap
    assert parse_params("faiss", dict(type="Flat")).auto_shard_rows() == 25_000
