"""Interval overlap join: semantics pins + plan shape.

The registered ``interval_overlap_stats`` query is hash-checked against
the definitional quadratic form by the oracle sweep; these tests pin
the tricky semantics on hand fixtures.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.operators.interval import (
    interval_overlap_pairs,
)

W = 100  # tiny bin width so fixtures span bins


def _iv(spark, rows):
    return spark.createDataFrame(rows, ["k", "id", "s", "e"])


def _pairs(spark, rows):
    df = interval_overlap_pairs(
        _iv(spark, rows), ["k"], "id", "s", "e", bin_width_us=W
    )
    return sorted((r.a_id, r.b_id, r.overlap_us) for r in df.collect())


def test_multi_bin_overlap_counted_once(spark):
    # Both intervals span bins 0..3 and overlap throughout -> exactly
    # one pair despite 4 shared bins (overlap-start attribution).
    rows = [("u", 1, 0, 350), ("u", 2, 10, 360)]
    assert _pairs(spark, rows) == [(1, 2, 340)]


def test_touching_intervals_do_not_overlap(spark):
    # Half-open: [0,100) and [100,200) share a boundary, not time.
    rows = [("u", 1, 0, 100), ("u", 2, 100, 200)]
    assert _pairs(spark, rows) == []


def test_overlap_start_in_later_bin(spark):
    # a spans bins 0-2, b starts in bin 2 -> the pair is attributed to
    # bin 2 (not bin 0) and still emitted exactly once.
    rows = [("u", 1, 0, 250), ("u", 2, 220, 400)]
    assert _pairs(spark, rows) == [(1, 2, 30)]


def test_keys_partition_the_join(spark):
    rows = [("u", 1, 0, 50), ("v", 2, 0, 50)]
    assert _pairs(spark, rows) == []


def test_empty_and_negative_intervals_drop(spark):
    rows = [("u", 1, 10, 10), ("u", 2, 20, 5), ("u", 3, 0, 30)]
    assert _pairs(spark, rows) == []


def test_containment_and_identical(spark):
    rows = [("u", 1, 0, 1000), ("u", 2, 400, 500), ("u", 3, 400, 500)]
    assert _pairs(spark, rows) == [(1, 2, 100), (1, 3, 100), (2, 3, 100)]


def test_plan_is_equi_join_no_cartesian(spark):
    df = interval_overlap_pairs(
        _iv(spark, [("u", 1, 0, 50)]), ["k"], "id", "s", "e", bin_width_us=W
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_random_intervals_match_brute_force(spark):
    """Property check: the binned equi-join equals the definitional
    quadratic join on randomized fixtures spanning many bins, multiple
    keys, and degenerate intervals."""
    import random

    rng = random.Random(20240814)
    rows = []
    for i in range(200):
        k = rng.choice(["a", "b", "c"])
        s = rng.randrange(-2000, 5000)  # negative starts: floor-div bins
        e = s + rng.randrange(-50, 400)  # some empty/negative
        rows.append((k, i, s, e))
    df = _iv(spark, rows)
    got = sorted(
        (r.k, r.a_id, r.b_id, r.overlap_us)
        for r in interval_overlap_pairs(
            df, ["k"], "id", "s", "e", bin_width_us=W
        ).collect()
    )
    live = [(k, i, s, e) for k, i, s, e in rows if e > s]
    expected = sorted(
        (ka, ia, ib, min(ea, eb) - max(sa, sb))
        for ka, ia, sa, ea in live
        for kb, ib, sb, eb in live
        if ka == kb and ia < ib and sa < eb and sb < ea
    )
    assert got == expected and expected
