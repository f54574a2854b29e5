"""Shared fixtures: one local SparkSession per test run + oracle helpers."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_training_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # keep unit tests light
    # wholeStage codegen OFF for the test session only (r15 suite-time
    # fix): at sf0.001 nearly every query is dominated by janino
    # compilation of its generated stage classes, not by data — measured
    # ~21% off a 40-query registry slice (95.2s -> 75.1s, same box).
    # Execution semantics are identical by Spark's contract (codegen is
    # an execution strategy, not a semantic switch); the production
    # session (session.py) keeps codegen on.
    spark = get_spark(
        shuffle_partitions=8,
        extra_conf={"spark.sql.codegen.wholeStage": "false"},
    )
    yield spark


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def assert_df_matches_oracle(spark_df, ddb_con, sql: str, *, atol: float = 1e-9):
    """Mimic the driver's compare: same columns, order-insensitive values."""
    import math  # noqa: F811

    sp = spark_df.toPandas()
    du = ddb_con.execute(sql).df()
    assert sorted(sp.columns) == sorted(du.columns), (
        f"column mismatch: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
    )
    cols = sorted(sp.columns)
    sp = sp[cols]
    du = du[cols]
    assert len(sp) == len(du), f"row count: spark={len(sp)} duckdb={len(du)}"

    def norm(df):
        rows = []
        for row in df.itertuples(index=False):
            vals = []
            for v in row:
                if isinstance(v, float):
                    vals.append(None if math.isnan(v) else round(v, 9))
                elif hasattr(v, "isoformat"):
                    vals.append(v.isoformat())
                elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                    vals.append(tuple(round(x, 6) if isinstance(x, float) else x for x in v))
                else:
                    vals.append(v)
            rows.append(tuple(vals))
        return sorted(rows, key=repr)

    a, b = norm(sp), norm(du)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    # allow tiny float drift row-by-row
    real = []
    for x, y in mismatches:
        ok = len(x) == len(y) and all(
            (isinstance(i, float) and isinstance(j, float) and math.isclose(i, j, rel_tol=1e-9, abs_tol=atol))
            or i == j
            for i, j in zip(x, y)
        )
        if not ok:
            real.append((x, y))
    assert not real, f"value mismatch, first: {real[0] if real else None} ({len(real)} rows)"
