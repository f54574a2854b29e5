"""Embedding PCA: distributed moments, driver eigensolve, distributed
projection.

The classic dimensionality-reduction / whitening step before clustering
or coarse-quantizing an embedding table (e.g. building an IVF-PQ index,
OPQ rotation, or drift dashboards). The split of work is the one that
survives 100 TB:

- **Moments** (the only pass over the data): each partition reduces to
  ONE row — (count, Σv, Σvvᵀ flattened) — via ``mapInPandas`` with
  numpy doing the per-batch ``Vᵀ·V``. Driver traffic is
  O(num_partitions · d²) floats (d=64 → 32 KB/partition), independent
  of row count. Partials are summed on the driver in partition order,
  so results are deterministic for a fixed input layout (float sums
  are order-sensitive; MLlib's treeAggregate is not even that).
- **Eigensolve** on the d×d covariance is O(d³) on the driver — trivial
  next to the scan. Component signs are canonicalized (largest-|loading|
  entry positive) so downstream projections are reproducible.
- **Projection** broadcasts the k×d components as plan literals and
  reuses the fused one-traversal fold of ``similarity.lsh_bucket`` —
  all k dots accumulate in a single pass over the vector, JVM-side, no
  UDF in the per-row hot path.

Not SQL-replayable (the eigensolver), so the registered query is
rows-only; tests pin agreement with a full numpy PCA on fixtures.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def embedding_moments(df: DataFrame, vec_col: str = "embedding") -> tuple[int, np.ndarray, np.ndarray]:
    """One scan → (n, Σv, Σvvᵀ) as numpy. Vectors must share one dim;
    rows with NULL vectors are skipped."""
    vecs = df.select(F.col(vec_col).alias("_v")).filter(F.col("_v").isNotNull())

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(pdf["_v"].tolist(), dtype=np.float64)
            n += m.shape[0]
            s = m.sum(axis=0) if s is None else s + m.sum(axis=0)
            gg = m.T @ m
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
            )

    parts = vecs.mapInPandas(
        partial, schema="n long, s array<double>, g array<double>"
    ).collect()
    if not parts:
        raise ValueError("embedding_moments: no non-null vectors")
    dim = len(parts[0]["s"])
    n = sum(p["n"] for p in parts)
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    for p in parts:  # driver fold in collect order — deterministic per layout
        s += np.asarray(p["s"])
        g += np.asarray(p["g"]).reshape(dim, dim)
    return n, s, g


def fit_pca(
    df: DataFrame, k: int, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (components k×d, mean d, explained_variance_ratio k).
    Components are unit-norm rows with canonical sign."""
    n, s, g = embedding_moments(df, vec_col)
    if n < 2:
        raise ValueError("fit_pca: need at least 2 vectors")
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    comps = evecs[:, :k].T.copy()
    for i in range(comps.shape[0]):  # canonical sign
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total = float(evals.sum())
    ratio = evals[:k] / total if total > 0 else np.zeros(k)
    return comps, mean, ratio


def _project_expr(vec: Column, comps: np.ndarray, mean: np.ndarray) -> Column:
    """ARRAY<DOUBLE> of k principal scores — ONE traversal of the
    centered vector, all k component dots folded together (the
    lsh_bucket pattern; components/mean are plan literals)."""
    k, dim = comps.shape
    comps_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in comps]
    )
    mean_lit = F.array(*[F.lit(float(x)) for x in mean])
    init = F.array_repeat(F.lit(0.0), k)
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(dim)),
        init,
        lambda acc, i: F.zip_with(
            acc,
            comps_lit,
            lambda a, c: a
            + F.element_at(c, i)
            * (F.element_at(vec, i).cast("double") - F.element_at(mean_lit, i)),
        ),
    )


def pca_project(
    df: DataFrame,
    comps: np.ndarray,
    mean: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, scores ARRAY<DOUBLE>[k]) — JVM-side expression, no UDF."""
    return df.select(
        F.col(id_col), _project_expr(F.col(vec_col), comps, mean).alias("scores")
    )


def pca_topk_query(
    df: DataFrame,
    k: int = 4,
    top: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Fit + project + rank: the ``top`` most extreme documents along
    PC1 with their first two scores and the fitted explained-variance
    ratios (constant columns). Drives the full operator path."""
    if k < 2:
        raise ValueError("pca_topk_query reports pc1+pc2; need k >= 2")
    comps, mean, ratio = fit_pca(df, k, vec_col)
    proj = pca_project(df, comps, mean, vec_col, id_col)
    return (
        proj.select(
            id_col,
            F.round(F.element_at("scores", 1), 6).alias("pc1"),
            F.round(F.element_at("scores", 2), 6).alias("pc2"),
            F.round(F.lit(float(ratio[0])), 6).alias("evr1"),
            F.round(F.lit(float(ratio[1])), 6).alias("evr2"),
        )
        .orderBy(F.abs(F.col("pc1")).desc(), F.col(id_col))
        .limit(top)
    )
