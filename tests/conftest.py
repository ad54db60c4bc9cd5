import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_ann_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def assert_df_matches_oracle(sdf, duck_con, oracle_sql, sort_cols=None, rtol=0.0):
    """Mini replica of the driver's compare: row count, column names, values."""
    import math

    pdf = sdf.toPandas()
    odf = duck_con.execute(oracle_sql).df()
    assert sorted(pdf.columns) == sorted(odf.columns), (
        f"schema mismatch: {sorted(pdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(pdf) == len(odf), f"rowcount {len(pdf)} vs {len(odf)}"
    cols = sorted(pdf.columns)
    a = pdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            # int-vs-float drift (e.g. DuckDB HUGEINT → float64) breaks the
            # driver's value hash even when == holds; catch it here too.
            assert isinstance(x, float) == isinstance(y, float), (
                f"col {c} row {i}: dtype drift {type(x).__name__} vs {type(y).__name__}"
            )
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if rtol:
                    assert math.isclose(x, y, rel_tol=rtol), (c, i, x, y)
                else:
                    assert x == y, f"col {c} row {i}: {x!r} != {y!r}"
            else:
                assert x == y, f"col {c} row {i}: {x!r} != {y!r}"
