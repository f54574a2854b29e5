"""Preference-pair diagnostics: degenerate pairs, length bias, adapter."""

from __future__ import annotations

from llm_training_data_pipeline_spark.operators import preference


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_adapter_pairs_even_chosen_and_drops_trailing_odd(spark):
    docs = _docs(
        spark,
        [
            (0, "a b c", "en", "s"),
            (1, "x", "en", "s"),
            (2, "d", "en", "s"),  # no partner doc 3 -> dropped
        ],
    )
    pairs = preference.preference_pairs_from_documents(docs).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert p.pair_id == 0 and p.chosen == "a b c" and p.rejected == "x"


def test_stats_degenerate_and_length_bias(spark):
    docs = _docs(
        spark,
        [
            (0, "same text", "en", "s1"),
            (1, "same text", "en", "s1"),  # degenerate pair
            (2, "one two three four", "en", "s1"),
            (3, "one", "en", "s1"),  # chosen longer by 3
            (4, "short", "en", "s2"),
            (5, "much longer rejected answer", "en", "s2"),  # gap -3
        ],
    )
    stats = {
        r.source: r
        for r in preference.preference_pair_stats(
            preference.preference_pairs_from_documents(docs)
        ).collect()
    }
    s1 = stats["s1"]
    assert s1.n_pairs == 2 and s1.degenerate_pairs == 1
    assert s1.chosen_longer_ppm == 500000  # 1 of 2
    assert s1.mean_word_gap == 1.5  # (0 + 3) / 2
    s2 = stats["s2"]
    assert s2.degenerate_pairs == 0 and s2.chosen_longer_ppm == 0
    assert s2.mean_word_gap == -3.0  # negative gap survives exactly
