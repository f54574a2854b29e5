"""Multimodal plumbing tests: binary columns, header parsing, batch shapes."""

from __future__ import annotations

import pytest

from llm_training_data_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image_meta,
    extract_features,
    resize_image,
    sample_frames,
    synthetic_assets,
)


def test_decode_image_meta(spark):
    assets = synthetic_assets(spark, n=20)
    rows = {r["asset_id"]: r for r in decode_image_meta(assets).collect()}
    assert len(rows) == 20
    for i, r in rows.items():
        assert r["format"] == ("png" if i % 2 == 0 else "gif")
        assert r["width"] == 16 + (i % 8)
        assert r["height"] == 16 + (i % 5)
        assert r["n_bytes"] > 0


def test_extract_features_deterministic(spark):
    assets = synthetic_assets(spark, n=10)
    a = {r["asset_id"]: r["features"] for r in extract_features(assets).collect()}
    b = {r["asset_id"]: r["features"] for r in extract_features(assets).collect()}
    assert a == b
    assert all(len(v) == FEATURE_DIM for v in a.values())
    assert all(-1.0 <= x <= 1.0 for v in a.values() for x in v)


def test_stubs_raise(spark):
    assets = synthetic_assets(spark, n=2)
    with pytest.raises(NotImplementedError):
        resize_image(assets, 8, 8)
    with pytest.raises(NotImplementedError):
        sample_frames(assets)
