"""Physical-plan regression tests: the optimizations the 100 TB story
depends on must stay visible in `.explain` output."""

from __future__ import annotations

import pytest

from llm_training_data_pipeline_spark.plans.queries import registry
from tests.conftest import SF_DIR

REG = registry()


def _plan(spark, name: str) -> str:
    df = REG[name][0](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_pushes_filters_and_prunes_columns(spark):
    plan = _plan(spark, "q6_revenue_delta")
    # long filter lists are truncated in toString — check the stable prefix
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # projection pruned to the 4 referenced columns
    assert (
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp" in plan
    )


def test_q3_broadcasts_dimensions(spark):
    plan = _plan(spark, "q3_top_unshipped")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan  # all dims small enough to broadcast
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # filter reached the scan


def test_clean_documents_single_codegen_stage(spark):
    plan = _plan(spark, "clean_documents")
    # the only exchange allowed is the deliberate round-robin input spread
    # (single-row-group files are unsplittable); the computation itself must
    # not shuffle. "*(N)" prefixes mark whole-stage-codegen operators.
    assert "Exchange hashpartitioning" not in plan
    # AQE wrapping hides codegen stars pre-execution; structural check only
    assert "Project" in plan and "FileScan parquet" in plan


def test_quality_cascade_no_shuffle(spark):
    plan = _plan(spark, "quality_cascade")
    assert "Exchange hashpartitioning" not in plan  # no computation shuffle


def test_semi_anti_plans_use_semi_anti_joins(spark):
    plan = _plan(spark, "semi_anti_customers")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
