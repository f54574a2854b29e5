"""Broadcast Bloom filter incremental dedup (operators/bloom.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.operators import bloom


def _keyed(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "digest string")


def test_no_false_negatives(spark):
    corpus = _keyed(spark, [f"k{i}" for i in range(500)])
    bf = bloom.build_bloom_filter(corpus, "digest", num_bits=8192)
    flagged = bloom.with_bloom_maybe_contains(corpus, "digest", bf)
    assert flagged.filter(~F.col("maybe_dup")).count() == 0, (
        "a present key must never be reported definitely-absent"
    )


def test_false_positive_rate_in_expected_band(spark):
    n = 1000
    corpus = _keyed(spark, [f"k{i}" for i in range(n)])
    m = bloom.optimal_num_bits(n, fpr=0.01)
    bf = bloom.build_bloom_filter(corpus, "digest", num_bits=m, expected_keys=n)
    fresh = _keyed(spark, [f"fresh{i}" for i in range(4000)])
    fp = (
        bloom.with_bloom_maybe_contains(fresh, "digest", bf)
        .filter(F.col("maybe_dup"))
        .count()
    )
    # target 1%; allow generous slack for hash variance on 4k probes
    assert fp / 4000 < 0.05, f"false positive rate {fp / 4000:.3f} way over target"


def test_incremental_dedup_equals_plain_anti_join(spark):
    corpus = _keyed(spark, [f"k{i}" for i in range(300)])
    new = _keyed(spark, [f"k{i}" for i in range(250, 400)] + ["dup", "dup"])
    got = sorted(
        r["digest"]
        for r in bloom.bloom_incremental_new_docs(new, corpus, "digest").collect()
    )
    want = sorted(
        r["digest"]
        for r in new.join(corpus, on="digest", how="left_anti").collect()
    )
    assert got == want


def test_positions_stay_jvm_side(spark):
    """The k hash positions must be xxhash64 codegen expressions — the
    only Python in the probe is the bitmap gather."""
    df = _keyed(spark, ["a"])
    plan = df.select(
        bloom._positions(F.col("digest"), 1024, 3).alias("pos")
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "xxhash64" in plan


def test_sizing_helpers():
    m = bloom.optimal_num_bits(1_000_000, 0.01)
    # ~9.6 bits/key at 1%
    assert 9_000_000 < m < 10_500_000
    k = bloom.optimal_num_hashes(m, 1_000_000)
    assert 5 <= k <= 9


def test_broadcast_cache_is_bounded(spark):
    from llm_training_data_pipeline_spark.operators import bloom as B

    filt = B.BloomFilter(bits=bytes(16), num_bits=128, num_hashes=2)
    before = dict(B._BC_CACHE)
    try:
        holders = [
            B.BloomFilter(bits=bytes(16), num_bits=128, num_hashes=2)
            for _ in range(B._BC_CACHE_MAX + 4)
        ]
        for f in holders:  # distinct live objects -> distinct id() keys
            B._broadcast_once(spark, f)
        assert len(B._BC_CACHE) <= B._BC_CACHE_MAX
        # same filter re-probed returns the SAME broadcast (cache hit)
        a = B._broadcast_once(spark, filt)
        b = B._broadcast_once(spark, filt)
        assert a is b
    finally:
        B._BC_CACHE.clear()
        B._BC_CACHE.update(before)
