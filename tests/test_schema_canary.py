"""Testdata-schema canary.

The driver regenerates the parquet testdata between rounds; a silent schema
change (e.g. `events.ts` flipping between TIMESTAMP(NANOS) and plain
timestamp[us], which happened between rounds 2 and 3) otherwise surfaces as a
scatter of analysis errors deep inside unrelated queries. This test fails
loudly, at one obvious place, naming the table and column that drifted —
update `sources/tables.py` (or this expectation) when it fires.
"""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from duckdb_ann_spark.sources import read_table

EXPECTED = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_columns_present(spark, sf_dir, table):
    df = read_table(spark, sf_dir, table)
    missing = EXPECTED[table] - set(df.columns)
    assert not missing, (
        f"{table}.parquet at {sf_dir} lost columns {sorted(missing)}; "
        f"has {df.columns}"
    )


def test_events_ts_dtype_branch(spark, sf_dir):
    """Pin the `events.ts` physical type AND the dtype branch taken.

    The reader accepts either epoch-ns-as-long (legacy NANOS files) or a
    native µs timestamp, always surfacing TimestampType. If the physical
    type becomes anything else, fail here with the actual type so the
    branch in sources/tables.py:read_table can be extended deliberately.
    """
    raw = pq.read_schema(os.path.join(sf_dir, "events.parquet"))
    ts_type = str(raw.field("ts").type)
    assert ts_type in ("timestamp[us]", "timestamp[ns]", "int64"), (
        f"events.ts physical type drifted to {ts_type}; "
        "extend read_table's dtype branch"
    )
    got = read_table(spark, sf_dir, "events").schema["ts"].dataType
    assert isinstance(got, T.TimestampType), (
        f"read_table normalized events.ts to {got}, expected TimestampType"
    )


def test_embeddings_vector_column(spark, sf_dir):
    """ANN paths require array<float>-compatible embeddings."""
    dt = read_table(spark, sf_dir, "embeddings").schema["embedding"].dataType
    assert isinstance(dt, T.ArrayType) and isinstance(
        dt.elementType, (T.FloatType, T.DoubleType)
    ), f"embeddings.embedding drifted to {dt}"


def test_read_table_nanos_branch(spark, tmp_path):
    """The TIMESTAMP(NANOS) branch of read_table (ns-epoch LongType →
    µs timestamp, DuckDB semantics) — exercised with a synthetic NANOS
    file since the current testdata stores µs; pins both the dtype
    branch and the conf save/restore (the session flag must be back to
    its prior value after the read, and the plan must still collect)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    d = tmp_path / "sfx"
    d.mkdir()
    ns = np.array(
        [1_700_000_000_123_456_789, 1_700_000_001_000_000_000], dtype="int64"
    )
    t = pa.table({
        "event_id": pa.array([0, 1], type=pa.int64()),
        "ts": pa.array(ns, type=pa.timestamp("ns")),
        "user_id": pa.array([1, 2], type=pa.int64()),
        "event_type": pa.array(["a", "b"]),
        "value": pa.array([1.0, 2.0]),
        "props": pa.array(["", ""]),
    })
    pq.write_table(t, str(d / "events.parquet"), version="2.6",
                   coerce_timestamps=None)

    key = "spark.sql.legacy.parquet.nanosAsLong"

    def conf_state():
        # mirror read_table's guarded get: some Spark builds raise for
        # an unset legacy key
        try:
            return spark.conf.get(key)
        except Exception:
            return None

    before = conf_state()
    df = read_table(spark, str(d), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    assert conf_state() == before  # no session-level side effect
    rows = {r.event_id: r.ts for r in df.collect()}
    # ns → µs truncation, integer div (not float: epoch-ns exceeds f64's
    # exact-integer range)
    assert rows[0].microsecond == 123456
    assert rows[1].microsecond == 0
