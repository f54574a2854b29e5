"""Embedding PCA vs full numpy PCA + operator invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.operators.pca import (
    embedding_moments,
    fit_pca,
    pca_project,
)


@pytest.fixture(scope="module")
def fixture_vecs(spark):
    rng = np.random.default_rng(7)
    # anisotropic cloud: PC1 variance >> PC2 >> rest
    base = rng.normal(size=(300, 8)) * np.array([6, 3, 1, 1, 1, 1, 1, 1])
    rot, _ = np.linalg.qr(rng.normal(size=(8, 8)))
    data = base @ rot.T + rng.normal(size=8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        ["vec_id", "embedding"],
    ).repartition(5)
    return df, data


def test_moments_match_numpy(spark, fixture_vecs):
    df, data = fixture_vecs
    n, s, g = embedding_moments(df)
    assert n == 300
    np.testing.assert_allclose(s, data.sum(axis=0), rtol=1e-9)
    np.testing.assert_allclose(g, data.T @ data, rtol=1e-9)


def test_components_match_numpy_pca(spark, fixture_vecs):
    df, data = fixture_vecs
    comps, mean, ratio = fit_pca(df, k=2)
    np.testing.assert_allclose(mean, data.mean(axis=0), rtol=1e-9)
    cov = np.cov(data, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, np.argsort(evals)[::-1][:2]].T
    for i in range(2):  # same subspace, sign-insensitive
        cos = abs(float(comps[i] @ top[i]))
        assert cos > 1 - 1e-9
    np.testing.assert_allclose(
        ratio, np.sort(evals)[::-1][:2] / evals.sum(), rtol=1e-9
    )
    # orthonormal rows
    np.testing.assert_allclose(comps @ comps.T, np.eye(2), atol=1e-9)


def test_projection_variance_equals_eigenvalues(spark, fixture_vecs):
    df, data = fixture_vecs
    comps, mean, _ = fit_pca(df, k=2)
    scores = np.array(
        [r.scores for r in pca_project(df, comps, mean).orderBy("vec_id").collect()]
    )
    expected = (data - data.mean(axis=0)) @ comps.T
    np.testing.assert_allclose(scores, expected, atol=1e-8)


def test_projection_stays_jvm_side(spark, fixture_vecs):
    df, _ = fixture_vecs
    comps, mean, _ = fit_pca(df, k=2)
    plan = pca_project(df, comps, mean)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_null_vectors_skipped_and_empty_raises(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0]), (4, [5.0, 6.0])],
        "vec_id long, embedding array<double>",
    )
    n, _, _ = embedding_moments(df)
    assert n == 3
    empty = df.filter(F.col("vec_id") < 0)
    with pytest.raises(Exception):
        embedding_moments(empty)
