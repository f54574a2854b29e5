"""Skew-robustness pins (r6 verdict #5).

AQE's skew-join split only covers JOINS; these tests prove the
window/aggregate paths too: for each skew-sensitive operator, a skewed
corpus (one stratum = 50% of rows, one hot LSH bucket, one hot join
key) must run within a small factor of a uniform corpus of EQUAL
volume, and the plan shapes that make that true (WindowGroupLimit
map-side prune, per-bucket band join, salt spreading) must be present.

Timing pins use min-of-3 after a warm-up run and a generous bound
(2.5x + 0.75s absolute slack): the claim is "skew does not change the
complexity class", not a ±10% benchmark — BENCH_NOTES.md records the
actual measured numbers per round.
"""

from __future__ import annotations

import random
import time

import pytest
from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.operators import corpus, dedup, scale

N_DOCS = 12_000
VOCAB = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega one two three four"
).split()
HOT_TEXT = "identical hot bucket document text shared by the whole clique"


def _texts(seed_salt: int, hot_every: int | None) -> list[tuple[int, str, str, int]]:
    """(doc_id, text, source, join_key) rows. ``hot_every``: every k-th
    doc gets the identical HOT_TEXT (a genuinely hot LSH bucket) and the
    hot join key / stratum; None → fully uniform."""
    rows = []
    for i in range(N_DOCS):
        rng = random.Random(i * 2654435761 + seed_salt)
        if hot_every is not None and i % hot_every == 0:
            text = HOT_TEXT
        else:
            text = " ".join(rng.choice(VOCAB) for _ in range(15)) + f" uniq{i}"
        if hot_every is not None and i < N_DOCS // 2:
            source, key = "hot_source", 0
        else:
            source = f"src{i % 19}"
            key = i % 600
        rows.append((i, text, source, key))
    return rows


@pytest.fixture(scope="module")
def skew_dfs(spark):
    schema = "doc_id long, text string, source string, join_key long"
    uniform = spark.createDataFrame(_texts(1, None), schema).localCheckpoint(
        eager=True
    )
    # hot bucket: every 50th doc identical -> 240-member clique
    skewed = spark.createDataFrame(_texts(2, 50), schema).localCheckpoint(eager=True)
    return uniform, skewed


def _best_of(fn, n: int = 3) -> float:
    fn()  # warm: codegen + page cache out of the measurement
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _assert_robust(name: str, t_uniform: float, t_skewed: float) -> None:
    bound = 2.5 * t_uniform + 0.75
    assert t_skewed <= bound, (
        f"{name}: skewed {t_skewed:.2f}s vs uniform {t_uniform:.2f}s "
        f"(bound {bound:.2f}s) — skew changed the complexity class"
    )


def test_cap_per_stratum_skew_robust(skew_dfs):
    """The 50%-of-corpus stratum must not serialize through one window
    partition: InferWindowGroupLimit prunes to cap rows per key
    map-side (plan pin), so runtime stays flat under skew."""
    uniform, skewed = skew_dfs
    plan = cap_per_stratum_plan = corpus.cap_per_stratum(
        skewed, stratum_col="source", cap=50
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, "map-side group-limit prune lost"
    t_u = _best_of(lambda: corpus.cap_per_stratum(uniform, "source", 50).count())
    t_s = _best_of(lambda: corpus.cap_per_stratum(skewed, "source", 50).count())
    _assert_robust("cap_per_stratum", t_u, t_s)


def test_minhash_candidate_pairs_skew_robust(skew_dfs):
    """A 240-member identical-text bucket produces a bounded clique
    (~29k pairs), not a corpus-wide blowup: the band join stays
    per-bucket (never all-pairs), so the hot bucket costs its own
    clique and nothing more."""
    uniform, skewed = skew_dfs
    cfg = dedup.MinHashConfig(num_perm=16, threshold=0.5, shingle_size=5, num_bands=4)
    t_u = _best_of(lambda: dedup.minhash_candidate_pairs(uniform, cfg=cfg).count())
    t_s = _best_of(lambda: dedup.minhash_candidate_pairs(skewed, cfg=cfg).count())
    # sanity: the hot clique really exists (C(240,2) pairs minimum)
    n_hot = dedup.minhash_candidate_pairs(skewed, cfg=cfg).count()
    assert n_hot >= 240 * 239 // 2
    _assert_robust("minhash_candidate_pairs", t_u, t_s)


def test_salted_join_skew_robust(skew_dfs):
    """One key owning 50% of the left side: salting spreads it over
    num_salts partitions, so the skewed join stays within the bound and
    returns exactly the plain-join row count."""
    uniform, skewed = skew_dfs
    spark = uniform.sparkSession
    dim = spark.range(600).select(
        F.col("id").alias("join_key"), (F.col("id") * 7).alias("dim_val")
    ).localCheckpoint(eager=True)
    n_plain = skewed.join(dim, on="join_key").count()
    n_salted = scale.salted_join(skewed, dim, on="join_key").count()
    assert n_salted == n_plain
    t_u = _best_of(lambda: scale.salted_join(uniform, dim, on="join_key").count())
    t_s = _best_of(lambda: scale.salted_join(skewed, dim, on="join_key").count())
    _assert_robust("salted_join", t_u, t_s)


def test_select_token_budget_skew_robust(skew_dfs):
    """The bucket-prune keeps the half-corpus stratum from funnelling
    through one sort partition: only budget-sized candidates enter the
    exact window, so skewed strata cost what uniform strata cost."""
    uniform, skewed = skew_dfs
    t_u = _best_of(
        lambda: corpus.select_token_budget(
            uniform, budget_tokens=5_000, strata_col="source"
        ).count()
    )
    t_s = _best_of(
        lambda: corpus.select_token_budget(
            skewed, budget_tokens=5_000, strata_col="source"
        ).count()
    )
    _assert_robust("select_token_budget", t_u, t_s)


def test_exact_soft_weights_skew_robust(skew_dfs):
    """The 240-copy hot digest group concentrates in one window
    partition; the shuffle carries only (id, digest) and the unordered
    count frame does no per-row ranking work, so runtime stays flat and
    the weights stay exact."""
    uniform, skewed = skew_dfs
    t_u = _best_of(lambda: dedup.exact_soft_dedup_weights(uniform).count())
    t_s = _best_of(lambda: dedup.exact_soft_dedup_weights(skewed).count())
    _assert_robust("exact_soft_dedup_weights", t_u, t_s)
    hot = (
        dedup.exact_soft_dedup_weights(skewed)
        .filter(F.col("n_copies") > 1)
        .collect()
    )
    assert len(hot) == 240
    assert all(r["n_copies"] == 240 and r["soft_weight_ppm"] == 4166 for r in hot)
