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


def test_wav_meta_parses_real_riff_header(spark):
    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_audio_meta,
        synthetic_audio_assets,
    )

    out = {r["asset_id"]: r for r in decode_audio_meta(synthetic_audio_assets(spark, 8)).collect()}
    assert len(out) == 8
    r0 = out[0]  # rate 8000, 1 channel, 16-bit, 0.1 s
    assert (r0["sample_rate"], r0["channels"], r0["bits_per_sample"]) == (8000, 1, 16)
    assert abs(r0["duration_s"] - 0.1) < 1e-6
    r2 = out[2]  # rate 44100, 1 channel, 0.3 s
    assert r2["sample_rate"] == 44100
    assert abs(r2["duration_s"] - 0.3) < 2e-2  # byte_rate//10 truncation


def test_wav_meta_rejects_non_wav(spark):
    from llm_training_data_pipeline_spark.operators.multimodal import (
        decode_audio_meta,
        synthetic_assets,
    )

    out = decode_audio_meta(synthetic_assets(spark, 4)).collect()
    assert all(r["sample_rate"] is None for r in out)
    assert all(r["n_bytes"] > 0 for r in out)


def test_extract_features_is_byte_histogram(spark):
    """Features are the normalized 16-bin high-nibble byte histogram —
    verified against a driver-side recomputation on a known payload."""
    import numpy as np

    from llm_training_data_pipeline_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
    )

    payload = bytes(range(256)) * 3 + b"\x00" * 16
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "asset_id long, modality string, payload binary",
    )
    got = extract_features(df).collect()[0]["features"]
    arr = np.frombuffer(payload, dtype=np.uint8)
    want = (
        (np.bincount(arr >> 4, minlength=FEATURE_DIM) / np.float64(arr.size))
        .astype(np.float32)
        .tolist()
    )
    assert got == want
    assert abs(sum(got) - 1.0) < 1e-6


def test_extract_features_empty_payload(spark):
    from llm_training_data_pipeline_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
    )

    df = spark.createDataFrame(
        [(1, "image", bytearray(b""))],
        "asset_id long, modality string, payload binary",
    )
    assert extract_features(df).collect()[0]["features"] == [0.0] * FEATURE_DIM
