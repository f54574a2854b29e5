"""Sweep the full driver contract: every registered query runs, and every
oracle-paired query value-matches DuckDB at the test scale factor."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from llm_training_data_pipeline_spark.plans.queries import registry
from tests.conftest import SF_DIR, assert_df_matches_oracle

REG = registry()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"detected_lang", "reason", "n_docs", "avg_len"}


def test_contract_shape():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(osql) <= set(qs)


@pytest.mark.parametrize("name", sorted(REG))
def test_query_against_oracle(name, spark, ddb):
    fn, sql = REG[name]
    df = fn(spark, SF_DIR)
    if sql is None:
        rows = df.limit(5).collect()  # rows-only smoke: runs, stable schema
        assert df.columns
    else:
        assert_df_matches_oracle(df, ddb, sql)
