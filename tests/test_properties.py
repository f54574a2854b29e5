"""Property-based tests (hypothesis) — semantics the fixtures can't cover:
random inputs pin cleaning idempotence, Python-parity of tokenization
counts, dedup winner determinism, and BPE round-trips.

Each hypothesis example ships a BATCH of strings through one Spark job to
keep the job count tractable.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.operators.cleaning import (
    CleanerConfig,
    with_cleaned,
)
from llm_training_data_pipeline_spark.functions.text import word_count

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=200,
)


@given(st.lists(texts, min_size=1, max_size=20))
@SETTINGS
def test_cleaning_idempotent(spark, batch):
    """clean(clean(x)) == clean(x) for the SQL-only chain."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(batch)], "id long, text string")
    once = with_cleaned(df, "text", CleanerConfig(), sql_only=True).select(
        "id", F.col("cleaned_text").alias("text")
    )
    twice = with_cleaned(once, "text", CleanerConfig(), sql_only=True).select(
        "id", F.col("cleaned_text").alias("t2")
    )
    joined = once.join(twice, "id")
    bad = joined.filter(F.col("text") != F.col("t2")).collect()
    assert not bad, bad[:3]


@given(st.lists(texts, min_size=1, max_size=20))
@SETTINGS
def test_word_count_matches_python(spark, batch):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(batch)], "id long, text string")
    got = {
        r["id"]: r["wc"]
        for r in df.select("id", word_count("text").alias("wc")).collect()
    }
    for i, t in enumerate(batch):
        assert got[i] == len(t.split()), (t, got[i], len(t.split()))


@given(
    st.lists(
        st.tuples(st.integers(0, 1_000_000), st.sampled_from(["aaa", "bbb", "Aaa ", " bbb"])),
        min_size=1,
        max_size=25,
    )
)
@SETTINGS
def test_exact_dedup_min_id_winner(spark, rows):
    """Winner per normalized-content group is always the minimum id."""
    from llm_training_data_pipeline_spark.operators.dedup import exact_dedup

    uniq = {}
    for i, t in rows:
        uniq[i] = t
    df = spark.createDataFrame(list(uniq.items()), "doc_id long, text string")
    kept = {r["doc_id"] for r in exact_dedup(df).select("doc_id").collect()}
    groups: dict[str, list[int]] = {}
    for i, t in uniq.items():
        groups.setdefault(t.strip().lower(), []).append(i)
    expected = {min(ids) for ids in groups.values()}
    assert kept == expected


@given(st.lists(st.sampled_from("the quick brown fox jumps over lazy dog pack my box".split()), min_size=1, max_size=12))
@SETTINGS
def test_bpe_roundtrip_known_vocab(words):
    """encode→decode is identity for text made of trained-on words."""
    from llm_training_data_pipeline_spark.operators.tokenize import (
        train_bpe_from_word_counts,
    )

    wc = [(w, 10) for w in "the quick brown fox jumps over lazy dog pack my box".split()]
    tok = train_bpe_from_word_counts(wc, vocab_size=500, min_frequency=1)
    text = " ".join(words)
    assert tok.decode(tok.encode(text)) == text
