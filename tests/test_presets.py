"""Preset configs: every shipped preset loads and drives the pipeline."""

from __future__ import annotations

import glob
import os

import pytest

from llm_training_data_pipeline_spark.plans.config import PipelineConfig
from llm_training_data_pipeline_spark.plans.pipeline import run_pipeline

PRESETS = sorted(glob.glob(os.path.join("configs", "*.yaml")))


def test_presets_exist():
    names = {os.path.basename(p) for p in PRESETS}
    assert {"c4_preset.yaml", "gopher_preset.yaml", "fineweb_preset.yaml"} <= names


@pytest.mark.parametrize("path", PRESETS, ids=[os.path.basename(p) for p in PRESETS])
def test_preset_loads_and_runs(spark, path):
    cfg = PipelineConfig.load(path)
    # the preset must override, not replace, the default tree
    assert cfg.get("tokenization.vocab_size") == 32000
    # 120 docs exercise every gated stage; the full-corpus pipeline run
    # is already covered by test_pipeline_plan / pipeline_e2e_exact
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(120)
    summary = run_pipeline(spark, docs, cfg, None)
    stages = summary["stages"]
    assert stages["ingest"]["rows"] > 0
    # every preset's gated stages show up in the observed stage list
    name = os.path.basename(path)
    if name in ("c4_preset.yaml", "fineweb_preset.yaml"):
        assert "paragraph_dedup" in stages
    if name in ("gopher_preset.yaml", "fineweb_preset.yaml"):
        assert "ngram_repetition" in stages or "ngram_repetition_filter" in stages
    if name == "fineweb_preset.yaml":
        assert "script_mix" in stages and "pii" in stages
