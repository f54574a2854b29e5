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


@given(st.text(max_size=300))
@SETTINGS
def test_byte_bpe_roundtrip_any_text(text):
    """Byte-level BPE round-trips ARBITRARY unicode text exactly —
    whitespace, emoji, control chars, unseen scripts — because every
    byte has a vocab symbol. (The whitespace-BPE variant only guarantees
    round-trip modulo whitespace normalization; this one is identity.)"""
    from llm_training_data_pipeline_spark.operators.tokenize import (
        train_byte_bpe_from_pretoken_counts,
    )

    tok = train_byte_bpe_from_pretoken_counts(
        [("the", 10), ("quick", 8), (" fox", 5)], vocab_size=300, min_frequency=1
    )
    assert tok.decode(tok.encode(text)) == text


@given(
    st.dictionaries(
        st.sampled_from(["en", "fr", "zz"]), st.floats(0.0, 1.0), min_size=1
    ),
    st.integers(1, 500),
)
@SETTINGS
def test_stratified_sample_subset_and_monotone(spark, rates, n):
    """Sample is a subset of the input; rate 1.0 keeps every row of the
    stratum; rate 0.0 keeps none."""
    from llm_training_data_pipeline_spark.operators.corpus import stratified_sample

    rows = [(i, f"t {i}", ["en", "fr", "zz"][i % 3], "s0") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {r["doc_id"] for r in stratified_sample(df, "lang", rates, 0.0).collect()}
    assert got <= {i for i, *_ in rows}
    for i, _t, lang, _s in rows:
        if rates.get(lang) == 1.0:
            assert i in got
        if rates.get(lang, 0.0) == 0.0:
            assert i not in got


@given(st.lists(st.integers(1, 400), min_size=1, max_size=30), st.integers(50, 1000))
@SETTINGS
def test_pack_sequences_conservation_and_bounds(spark, token_counts, budget):
    """Packing conserves tokens and every doc starts inside its pack's
    token range: pack_id == floor(preceding_tokens / budget)."""
    from llm_training_data_pipeline_spark.operators.corpus import (
        PackConfig,
        pack_sequences,
    )

    rows = [(i, " ".join(["w"] * c), "en", "s0") for i, c in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = sorted(
        pack_sequences(df, PackConfig(budget_tokens=budget)).collect(),
        key=lambda r: r["doc_id"],
    )
    assert sum(r["n_tokens"] for r in out) == sum(token_counts)
    preceding = 0
    for r in out:
        assert r["pack_id"] == preceding // budget, (r, preceding)
        preceding += r["n_tokens"]


@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
            min_size=0,
            max_size=120,
        ),
        min_size=1,
        max_size=30,
    )
)
@SETTINGS
def test_mojibake_repair_idempotent_any_text(batch):
    """fix(fix(x)) == fix(x) for arbitrary (incl. non-ASCII) strings —
    the per-run segmentation must never oscillate (pure Python, no job)."""
    from llm_training_data_pipeline_spark.operators.cleaning import _fix_mojibake

    for s in batch:
        once = _fix_mojibake(s)
        assert _fix_mojibake(once) == once, repr(s)


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=0,
        max_size=60,
    )
)
@SETTINGS
def test_union_find_equals_propagation_random_graphs(spark, edges):
    """Driver union-find and distributed min-label propagation agree on
    arbitrary random pair sets (self-loops and duplicates included)."""
    from llm_training_data_pipeline_spark.operators.dedup import dedup_clusters

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges] or [(0, 0)],
        "id_a long, id_b long",
    )
    fast = sorted(map(tuple, dedup_clusters(df).collect()))
    slow = sorted(map(tuple, dedup_clusters(df, driver_cc_max_edges=0).collect()))
    assert fast == slow


@given(
    st.lists(
        st.lists(st.integers(0, 999), min_size=0, max_size=17),
        min_size=0,
        max_size=25,
    ),
    st.integers(2, 16),
)
@SETTINGS
def test_pack_token_ids_stream_roundtrip(spark, docs, seq_len):
    """Concatenating the packed sequences in seq_id order reproduces the
    doc-order token stream exactly, for any doc sizes and seq_len."""
    from llm_training_data_pipeline_spark.operators.corpus import pack_token_ids

    df = spark.createDataFrame(
        [(i, [int(x) for x in d]) for i, d in enumerate(docs)] or [(0, [])],
        "doc_id long, tokens array<int>",
    )
    packed = {r["seq_id"]: r for r in pack_token_ids(df, seq_len).collect()}
    got = []
    for s in sorted(packed):
        ids = packed[s]["input_ids"]
        if s != max(packed):
            assert len(ids) == seq_len, (s, len(ids))
        got.extend(ids)
    want = [x for d in (docs or [[]]) for x in d]
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["sA", "sB", "sC"]),
            st.lists(st.sampled_from("aa bb cc dd ee ff gg".split()), min_size=1, max_size=12),
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=60),
    st.sampled_from([1_000, 10_000, 200_000]),
)
@SETTINGS
def test_token_budget_prune_always_equals_definitional(spark, docs, budget, width):
    """The bucket-pruned token-budget selection must be bit-identical to
    the definitional single-window form for ANY corpus, budget, and
    bucket width — the prune's correctness proof, fuzzed."""
    from llm_training_data_pipeline_spark.operators import corpus

    rows = [(i, " ".join(words), "en", src) for i, (src, words) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    pruned = sorted(
        map(tuple, corpus.select_token_budget(df, budget, prune_bucket_units=width).collect())
    )
    plain = sorted(
        map(tuple, corpus.select_token_budget(df, budget, prune_bucket_units=None).collect())
    )
    assert pruned == plain


@given(st.lists(texts, min_size=1, max_size=15))
@SETTINGS
def test_char_entropy_bounds_and_python_parity(spark, batch):
    """0 <= H <= ln(37) for any input, and the Spark value matches a
    direct Python computation of the same definition (including the
    exact 1e-8 unit truncation)."""
    import math
    from collections import Counter

    from llm_training_data_pipeline_spark.operators.textstats import (
        ENTROPY_ALPHABET,
        with_char_entropy,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in with_char_entropy(df).collect()}
    for i, t in enumerate(batch):
        proj = [c for c in t.lower() if c in ENTROPY_ALPHABET]
        n = len(proj)
        assert got[i]["alpha_chars"] == n
        h = got[i]["char_entropy"]
        # the floor-truncated unit sum can inflate H by up to
        # |alphabet|/1e8/n above the true value — allow that headroom
        assert 0.0 <= h <= math.log(len(ENTROPY_ALPHABET)) + 1e-6
        if n > 1:
            s_units = sum(
                c * math.floor(math.log(c) * 1e8)
                for c in Counter(proj).values()
                if c > 0
            )
            want = round(math.log(n) - s_units / 1e8 / n, 6)
            assert abs(h - want) < 1e-9, (t, h, want)
        else:
            assert h == 0.0


@given(
    st.lists(st.integers(min_value=-(10**6), max_value=10**6), min_size=1, max_size=60, unique=True),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=2, max_value=4),
)
@SETTINGS
def test_cap_per_stratum_cap_and_subset(spark, ids, cap, n_strata):
    """Output is a subset of the input, every stratum's count is
    min(cap, stratum size), and the selection is stable under re-run."""
    from llm_training_data_pipeline_spark.operators.corpus import cap_per_stratum

    rows = [(i, "t", "en", f"s{abs(i) % n_strata}") for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = cap_per_stratum(df, cap=cap).collect()
    per: dict[str, int] = {}
    for r in out:
        per[r["source"]] = per.get(r["source"], 0) + 1
        assert r["doc_id"] in set(ids)
    sizes: dict[str, int] = {}
    for i in ids:
        s = f"s{abs(i) % n_strata}"
        sizes[s] = sizes.get(s, 0) + 1
    for s, size in sizes.items():
        assert per.get(s, 0) == min(cap, size), (s, cap, sizes, per)


@given(
    st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
                min_size=0, max_size=120),
        min_size=1, max_size=12,
    ),
    st.integers(min_value=2, max_value=12),
)
@SETTINGS
def test_span_corrupt_reconstructs_any_text(spark, batch, span_len):
    """For arbitrary unicode text and span lengths: corrupted rows
    splice back to the original exactly; short rows pass through."""
    import re

    from llm_training_data_pipeline_spark.operators.corpus import span_corrupt

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in span_corrupt(df, rate=1.0, span_len=span_len).collect()}
    for i, t in enumerate(batch):
        r = out[i]
        if len(t) < 2 * span_len:
            assert not r["corrupted"] and r["inputs"] == t and r["targets"] == ""
            continue
        assert r["corrupted"]
        m = re.fullmatch(
            "<extra_id_0>(.*)<extra_id_1>(.*)<extra_id_2>", r["targets"], re.S
        )
        assert m, r["targets"]
        rebuilt = (
            r["inputs"]
            .replace("<extra_id_0>", m.group(1), 1)
            .replace("<extra_id_1>", m.group(2), 1)
        )
        assert rebuilt == t, (i, span_len)
        assert len(m.group(1)) == span_len and len(m.group(2)) == span_len


@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(min_codepoint=97, max_codepoint=122),
                min_size=1,
                max_size=8,
            ),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=0, max_value=40),
)
@SETTINGS
def test_prune_merges_prefix_is_exact_retraining(wc, m):
    """For ANY word-count table: prefix-pruning a large BPE training to
    m merges equals training with vocab budget base+m outright — merge
    learning is sequential, so later merges can't rewrite earlier ones.
    (Driver-side property — no Spark job per example.)"""
    from llm_training_data_pipeline_spark.operators.tokenize import (
        prune_merges,
        train_bpe_from_word_counts,
    )

    big = train_bpe_from_word_counts(wc, vocab_size=100_000, min_frequency=1)
    base = len(big.vocab) - len(big.merges)
    m = min(m, len(big.merges))
    small = train_bpe_from_word_counts(
        wc, vocab_size=base + m, min_frequency=1
    )
    pruned = prune_merges(big, m)
    assert pruned.merges == small.merges
    assert pruned.vocab == small.vocab
    for w, _ in wc[:5]:
        assert pruned.encode(w) == small.encode(w)
