"""Quality-filter tests — one pin per FilterReason (FIXTURES.md §A4) plus
DuckDB-oracle parity of the full cascade on the documents table."""

from __future__ import annotations

from llm_training_data_pipeline_spark.operators.quality import (
    QualityConfig,
    with_quality,
)

GOOD = (
    "The development of reliable software systems requires careful attention to design "
    "principles and testing practices. Engineers should consider maintainability and "
    "clarity when writing their programs. Documentation helps future readers understand "
    "the reasoning behind decisions, and code review improves overall quality across teams. "
    "Thoughtful naming makes intent obvious to everyone involved in the project today."
)


def _check(spark, text: str, cfg: QualityConfig = QualityConfig()) -> tuple[bool, str]:
    df = spark.createDataFrame([(text,)], "text string")
    row = with_quality(df, "text", cfg).select("passed", "reason").collect()[0]
    return row["passed"], row["reason"]


def test_good_text_passes(spark):
    assert _check(spark, GOOD) == (True, "passed")


def test_too_short(spark):
    assert _check(spark, "Hello world.") == (False, "too_short")


def test_too_long(spark):
    passed, reason = _check(spark, "word " * 100, QualityConfig(min_words=1, max_words=10))
    assert (passed, reason) == (False, "too_long")


def test_low_alpha_ratio_precedes_digit(spark):
    # digits-heavy text fails alpha first (reference precedence,
    # quality_filter.py:203-207)
    text = " ".join(["12345 678"] * 40) + " abc def"
    assert _check(spark, text, QualityConfig(min_words=10)) == (False, "low_alpha_ratio")


def test_high_symbol_ratio(spark):
    words = ["ab@#$%"] * 60
    text = " ".join(words)
    passed, reason = _check(spark, text, QualityConfig(min_words=10, min_alpha_ratio=0.3))
    assert (passed, reason) == (False, "high_symbol_ratio")


def test_short_avg_word(spark):
    text = " ".join(["a b c d e"] * 20)
    assert _check(spark, text, QualityConfig(min_words=10)) == (False, "short_avg_word_length")


def test_long_avg_word(spark):
    text = " ".join(["pneumonoultramicroscopics"] * 60)
    assert _check(spark, text, QualityConfig(min_words=10)) == (False, "long_avg_word_length")


def test_high_repetition(spark):
    text = "This is repeated content here.\n" * 20
    assert _check(spark, text, QualityConfig(min_words=10)) == (False, "high_repetition")


def test_bullet_list(spark):
    text = "• Item number one in this list\n" * 25
    passed, reason = _check(
        spark, text, QualityConfig(min_words=10, max_repetition_ratio=1.1)
    )
    assert (passed, reason) == (False, "mostly_bullet_list")


def test_boilerplate(spark):
    filler = (
        "This page describes various interesting things about software and machines. "
    ) * 4
    text = (
        filler
        + "Copyright 2024 Example Corp. All rights reserved. Review our terms of service "
        + "and privacy policy along with the cookie policy before you continue reading."
    )
    assert _check(spark, text, QualityConfig(min_words=10)) == (False, "boilerplate_content")


def test_wrong_language_via_lang_col(spark):
    cfg = QualityConfig(min_words=2, allowed_languages=("en",))
    df = spark.createDataFrame(
        [("bonjour le monde entier aujourd'hui mes amis", "fr"),
         ("hello wide world today my friends", "en")],
        "text string, lang string",
    )
    rows = {r["lang"]: (r["passed"], r["reason"])
            for r in with_quality(df, "text", cfg, lang_col="lang")
            .select("lang", "passed", "reason").collect()}
    assert rows["fr"] == (False, "wrong_language")
    assert rows["en"] == (True, "passed")


def test_cascade_matches_oracle_on_documents(spark, ddb):
    from tests.conftest import SF_DIR, assert_df_matches_oracle

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cfg = QualityConfig(min_words=20)
    out = with_quality(docs, "text", cfg).select(
        "doc_id", "word_count", "avg_word_length", "alpha_ratio", "digit_ratio",
        "symbol_ratio", "repetition_ratio", "bullet_ratio", "boilerplate_matches",
        "reason", "passed",
    )
    from llm_training_data_pipeline_spark.plans.oracle import quality_oracle_sql

    assert_df_matches_oracle(out, ddb, quality_oracle_sql(min_words=20))


# --------------------- Gopher rules (engine extension) ---------------------


def _gopher(spark, text):
    from llm_training_data_pipeline_spark.operators.quality import with_gopher_quality

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return with_gopher_quality(df).collect()[0]


def test_gopher_good_prose_passes(spark):
    text = (
        "The development of reliable software requires that teams have careful "
        "attention to design principles and be willing to iterate with the "
        "feedback of users over time. " * 3
    )
    r = _gopher(spark, text)
    assert r["gopher_pass"] is True, dict(r.asDict())


def test_gopher_symbol_ratio_rule(spark):
    text = "# " * 60 + "the be to of and that have with words here"
    r = _gopher(spark, text)
    assert r["ok_symbol_ratio"] is False
    assert r["gopher_pass"] is False


def test_gopher_stopword_rule(spark):
    # 60 words, zero English stopwords
    text = " ".join(["datum", "kernel", "vector"] * 20)
    r = _gopher(spark, text)
    assert r["ok_stopwords"] is False
    assert r["ok_word_count"] is True


def test_gopher_ellipsis_lines_rule(spark):
    lines = ["the quick brown fox continues..." for _ in range(10)]
    text = "\n".join(lines) + "\n" + "the be to of and that have with plain words"
    r = _gopher(spark, text)
    assert r["ok_ellipsis_lines"] is False


def test_gopher_alpha_word_rule(spark):
    text = " ".join(["12345"] * 50) + " the be to of and that have with"
    r = _gopher(spark, text)
    assert r["ok_alpha_words"] is False


def _c4(spark, text):
    from llm_training_data_pipeline_spark.operators.quality import with_c4_quality

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return with_c4_quality(df).collect()[0]


def test_c4_good_prose_passes(spark):
    r = _c4(spark, "First sentence here. Second one follows! A third, asking?\nAnother line ends too.")
    assert r["c4_pass"] is True, dict(r.asDict())


def test_c4_lorem_and_braces_rules(spark):
    assert _c4(spark, "Some Lorem Ipsum dolor sit. Filler text. More filler.")["ok_no_lorem"] is False
    assert _c4(spark, "function f() { return 1; } Done. Yes. Ok.")["ok_no_braces"] is False


def test_c4_terminal_punct_fraction(spark):
    text = "\n".join(["no punctuation line here"] * 8 + ["This one ends properly."])
    r = _c4(spark, text)
    assert r["ok_terminal_punct"] is False


def test_c4_min_sentences(spark):
    r = _c4(spark, "only one sentence here.")
    assert r["ok_sentences"] is False


def test_repetition_stats_pins(spark):
    from llm_training_data_pipeline_spark.operators.quality import with_repetition_stats

    df = spark.createDataFrame(
        [
            # 4 non-empty lines, "dup me" twice → dup_line_frac 1/4;
            # line chars: 6+6+10+8=30, distinct 6+10+8=24 → char frac 6/30
            (1, "dup me\ndup me\nunique one\n\nlast one"),
            # "a b a b a" → 2-grams: [a b, b a, a b, b a]; best cover
            # = 2 occurrences x len('a b')=3 → 6 / len(text)=9
            (2, "a b a b a"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    assert abs(rows[1]["dup_line_frac"] - 0.25) < 1e-9
    assert abs(rows[1]["dup_line_char_frac"] - 6 / 30) < 1e-9
    assert abs(rows[2]["top_2gram_char_frac"] - 6 / 9) < 1e-9
    assert rows[3]["dup_line_frac"] == 0.0
    assert rows[3]["top_2gram_char_frac"] == 0.0


def test_repetition_stats_explode_fallback_matches_hof(spark):
    """Docs over hof_max_words take the explode+groupBy path; values must
    equal the HOF path, and a 100k-word doc must complete (the quadratic
    HOF would scan distinct x n ≈ 10^10 gram comparisons)."""
    from llm_training_data_pipeline_spark.operators.quality import with_repetition_stats

    big_unique = " ".join(f"w{i}" for i in range(100_000))
    big_repeat = "spam ham " * 50_000
    df = spark.createDataFrame(
        [(1, big_unique), (2, big_repeat.strip()), (3, "a b a b a")],
        "doc_id long, text string",
    )
    # force ALL docs through each path by moving the threshold
    via_explode = {
        r["doc_id"]: r
        for r in with_repetition_stats(df, hof_max_words=0).collect()
    }
    hof_small = {
        r["doc_id"]: r
        for r in with_repetition_stats(
            df.filter("doc_id = 3"), hof_max_words=10**9
        ).collect()
    }
    assert abs(via_explode[3]["top_2gram_char_frac"] - hof_small[3]["top_2gram_char_frac"]) < 1e-9
    # 100k unique words → best 2-gram occurs once: cover = len longest gram pair
    assert via_explode[1]["top_2gram_char_frac"] < 0.001
    # 'spam ham' doc: gram 'spam ham' (or 'ham spam') covers ~half the chars
    assert via_explode[2]["top_2gram_char_frac"] > 0.4
    # default threshold routes the big docs through explode, small through HOF
    mixed = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    for k in (1, 2, 3):
        assert abs(mixed[k]["top_2gram_char_frac"] - via_explode[k]["top_2gram_char_frac"]) < 1e-9


def test_dup_ngram_stats_hand_computed(spark):
    from llm_training_data_pipeline_spark.operators.quality import (
        with_dup_ngram_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),
            (2, "one two three four five one two three four five"),
            (3, ""),
            (4, "x"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in with_dup_ngram_stats(df).collect()
    }
    # doc 1 (11 chars): top2 "a b" 3x3=9/11; top3 "a b a" 2x5=10/11;
    # top4 "a b a b" 2x7=14/11 -> overlap overcount capped at 1
    assert rows[1]["top_2gram_char_frac"] == 0.818182
    assert rows[1]["top_3gram_char_frac"] == 0.909091
    assert rows[1]["top_4gram_char_frac"] == 1.0
    assert rows[1]["dup_5gram_char_frac"] == 0.0
    assert rows[1]["ngram_repetition_pass"] is False
    # doc 2 (47 chars): top2 "three four" 2x10=20/47; the 5-gram
    # "one two three four five" repeats once -> 23/47 non-first chars
    assert rows[2]["top_2gram_char_frac"] == 0.425532
    assert rows[2]["dup_5gram_char_frac"] == 0.489362
    assert rows[2]["dup_6gram_char_frac"] == 0.0
    assert rows[2]["ngram_repetition_pass"] is False
    # empty / single-word docs: zero everywhere, pass
    for d in (3, 4):
        assert rows[d]["top_2gram_char_frac"] == 0.0
        assert rows[d]["dup_10gram_char_frac"] == 0.0
        assert rows[d]["ngram_repetition_pass"] is True


def test_dup_ngram_clean_prose_passes(spark):
    from llm_training_data_pipeline_spark.operators.quality import (
        with_dup_ngram_stats,
    )

    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    row = with_dup_ngram_stats(df).collect()[0]
    assert row["ngram_repetition_pass"] is True
    assert row["dup_5gram_char_frac"] == 0.0


def test_dup_ngram_overlapping_n_builds_both_columns(spark):
    # regression (r15): an n present in BOTH max_top_ngram_frac and
    # max_dup_ngram_frac must yield both top_{n}gram and dup_{n}gram
    # columns (the r14 fold built one or the other -> UNRESOLVED_COLUMN)
    from llm_training_data_pipeline_spark.operators.quality import (
        GopherRepetitionConfig,
        with_dup_ngram_stats,
    )

    cfg = GopherRepetitionConfig(
        max_top_ngram_frac=((2, 0.20), (3, 0.18)),
        max_dup_ngram_frac=((3, 0.15), (5, 0.15)),
    )
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "one two three four five one two three four five")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in with_dup_ngram_stats(df, cfg=cfg).collect()}
    # doc 1 (11 chars): top3 "a b a" 2x5=10/11; dup3: grams are
    # [aba,bab,aba,bab] lens [5,5,5,5] sum 20, distinct sum 10 -> 10/11
    assert rows[1]["top_3gram_char_frac"] == 0.909091
    assert rows[1]["dup_3gram_char_frac"] == 0.909091
    # doc 2: no repeated 3-gram-free doc — "one two three" etc. each appear
    # twice: all 6 distinct 3-grams repeat once; dup3 > 0, top3 > 0
    assert rows[2]["dup_3gram_char_frac"] > 0.0
    assert rows[2]["top_3gram_char_frac"] > 0.0
    assert rows[2]["dup_5gram_char_frac"] == 0.489362


def test_chat_markup_contamination_flags_leaked_markers(spark):
    from llm_training_data_pipeline_spark.operators.quality import (
        chat_markup_contamination,
    )

    docs = spark.createDataFrame(
        [
            (0, "normal prose here", "en", "s1"),
            (1, "leaked <|im_start|>assistant reply", "en", "s1"),
            (2, "fine text", "en", "s2"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    rows = {
        (r.source, r.marker): r
        for r in chat_markup_contamination(docs, markers=("<|im_start|>", "<s>")).collect()
    }
    assert rows[("s1", "<|im_start|>")].contaminated == 1
    assert rows[("s1", "<|im_start|>")].contaminated_ppm == 500000
    # "<s>" is substring-contained nowhere (plain containment, no regex)
    assert rows[("s1", "<s>")].contaminated == 0
    assert rows[("s2", "<|im_start|>")].contaminated == 0
    assert len(rows) == 4  # full source x marker grid
