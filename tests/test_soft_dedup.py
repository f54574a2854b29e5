"""Soft dedup (downweight-not-drop) + distinct-n diversity pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.operators.corpus import ngram_diversity
from llm_training_data_pipeline_spark.operators.dedup import (
    cluster_soft_dedup_weights,
    dedup_clusters,
    exact_soft_dedup_weights,
    soft_dedup_mass,
)

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog.", "a"),
    (2, "The quick brown fox jumps over the lazy dog.", "a"),
    (3, "the quick brown fox jumps over the lazy dog.  ", "b"),  # case/ws-normalized dup
    (4, "Python is a great programming language.", "a"),
    (6, "Machine learning is transforming technology.", "b"),
]


def _df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_soft_weights_are_reciprocal_counts(spark):
    out = {
        r["doc_id"]: (r["n_copies"], r["soft_weight_ppm"])
        for r in exact_soft_dedup_weights(_df(spark)).collect()
    }
    # docs 1,2,3 share one normalized digest (strip+lower) -> 1/3
    assert out[1] == (3, 333333)
    assert out[2] == (3, 333333)
    assert out[3] == (3, 333333)
    assert out[4] == (1, 1000000)
    assert out[6] == (1, 1000000)


def test_exact_soft_weights_preserve_every_row(spark):
    df = _df(spark)
    assert exact_soft_dedup_weights(df).count() == df.count()


def test_cluster_soft_weights_singletons_keep_full_weight(spark):
    df = _df(spark)
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    clusters = dedup_clusters(pairs)
    out = {
        r["doc_id"]: (r["cluster_size"], r["soft_weight_ppm"])
        for r in cluster_soft_dedup_weights(df, clusters).collect()
    }
    assert out[1] == (3, 333333)
    assert out[2] == (3, 333333)
    assert out[3] == (3, 333333)
    assert out[4] == (1, 1000000)  # never appears in the pair graph
    assert out[6] == (1, 1000000)


def test_soft_dedup_mass_effective_counts(spark):
    df = _df(spark)
    weights = exact_soft_dedup_weights(df)
    out = {r["source"]: r.asDict() for r in soft_dedup_mass(df, weights).collect()}
    # source a: docs 1,2 at 1/3 each + doc 4 at 1 -> 1_666_666 ppm
    assert out["a"]["n_docs"] == 3
    assert out["a"]["effective_docs_ppm"] == 333333 + 333333 + 1000000
    assert out["a"]["downweighted_docs"] == 2
    # source b: doc 3 at 1/3 + doc 6 at 1
    assert out["b"]["n_docs"] == 2
    assert out["b"]["effective_docs_ppm"] == 333333 + 1000000
    assert out["b"]["downweighted_docs"] == 1


def test_ngram_diversity_pinned_tiny_corpus(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b", "s"),  # unigrams: a,b x2 each; bigrams: "a b"x2,"b a"
            (2, "a", "s"),  # short doc: whole text is its one unigram AND bigram
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r["n"]: (r["distinct_grams"], r["total_grams"], r["diversity_ppm"])
        for r in ngram_diversity(df, ns=(1, 2)).collect()
    }
    # n=1: grams a,b,a,b + a -> distinct {a,b}=2, total 5
    assert out[1] == (2, 5, 400000)
    # n=2: doc1 "a b","b a","a b" (3 total, 2 distinct); doc2 short -> "a" (1)
    # distinct {"a b","b a","a"}=3, total 4
    assert out[2] == (3, 4, 750000)


def test_ngram_diversity_repetitive_source_scores_lower(spark):
    rows = [(i, "spam spam spam spam spam", "dup") for i in range(10)] + [
        (100 + i, t, "var")
        for i, t in enumerate(
            ["alpha beta gamma", "delta epsilon zeta", "eta theta iota"]
        )
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["n"], r["source"]): r["diversity_ppm"]
        for r in ngram_diversity(df, ns=(2,)).collect()
    }
    assert out[(2, "dup")] < out[(2, "var")]


def test_soft_weight_group_mass_bounds(spark):
    """Invariant: each duplicate group's total weight is 1e6 minus at
    most (n-1) ppm of floor loss — downweighting conserves content mass
    up to integer rounding, on a corpus with 1/2/3/7-copy groups."""
    rows = []
    doc_id = 0
    for copies, text in ((1, "alpha"), (2, "beta"), (3, "gamma"), (7, "delta")):
        for _ in range(copies):
            rows.append((doc_id, f"unique words {text} " * 10, "s"))
            doc_id += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = exact_soft_dedup_weights(df).groupBy("n_copies").agg(
        F.sum("soft_weight_ppm").alias("group_mass"),
        F.count(F.lit(1)).alias("n"),
    )
    for r in out.collect():
        n = r["n_copies"]
        assert r["n"] == n
        assert 1000000 - (n - 1) <= r["group_mass"] <= 1000000, r


def test_zipf_slope_flat_vs_natural(spark):
    """A templated source (few types, near-uniform frequencies) fits a
    flatter slope than a Zipf-ish source on the same volume."""
    import itertools

    from llm_training_data_pipeline_spark.operators.corpus import zipf_slope

    # zipf-ish: type i appears ~60/i times
    zipf_words = list(
        itertools.chain.from_iterable(
            [f"w{i}"] * max(60 // i, 1) for i in range(1, 40)
        )
    )
    # templated: 12 types, all equally frequent
    flat_words = [f"t{i % 12}" for i in range(len(zipf_words))]
    rows = [
        (1, " ".join(zipf_words), "zipfish"),
        (2, " ".join(flat_words), "flat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r["slope"] for r in zipf_slope(df, min_types=5).collect()}
    assert out["zipfish"] < -0.5, out
    assert out["flat"] > out["zipfish"] + 0.3, out


def test_novelty_weights_graded(spark):
    from llm_training_data_pipeline_spark.operators.dedup import novelty_weights

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2, 0.9375), (1, 3, 0.5), (2, 3, 0.25)],
        "id_a long, id_b long, est_jaccard double",
    )
    out = {
        r["doc_id"]: (r["max_dup_ppm"], r["novelty_ppm"])
        for r in novelty_weights(df, pairs).collect()
    }
    assert out[1] == (0, 1000000)  # never an id_b: first copy, full weight
    assert out[2] == (937500, 62500)
    assert out[3] == (500000, 500000)  # max(0.5, 0.25) against smaller ids
    assert out[4] == (0, 1000000)  # in no pair


def test_ngram_diversity_matches_python_model(spark):
    """Model pin: distinct/total per (n, source) == a transparent Python
    computation over 60 seeded random docs (including empty and
    single-word shorts that exercise the whole-text-gram rule)."""
    import random

    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    rows = []
    for d in range(60):
        n_words = rng.choice([0, 1, 2, rng.randrange(3, 25)])
        text = " ".join(rng.choice(vocab) for _ in range(n_words))
        rows.append((d, text, f"s{d % 3}"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    def model(n):
        tot: dict[str, int] = {}
        dist: dict[str, set] = {}
        for _, text, src in rows:
            toks = text.lower().split()
            if len(toks) < n:
                grams = [" ".join(toks)]
            else:
                grams = list(
                    {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
                )
            tot[src] = tot.get(src, 0) + (
                1 if len(toks) < n else len(toks) - n + 1
            )
            dist.setdefault(src, set()).update(grams)
        return {
            s: (len(dist[s]), tot[s], 1_000_000 * len(dist[s]) // tot[s])
            for s in tot
        }

    got = {
        (r["n"], r["source"]): (
            r["distinct_grams"],
            r["total_grams"],
            r["diversity_ppm"],
        )
        for r in ngram_diversity(df, ns=(1, 2, 3)).collect()
    }
    for n in (1, 2, 3):
        want = model(n)
        for s, vals in want.items():
            assert got[(n, s)] == vals, (n, s, got[(n, s)], vals)


def test_zipf_slope_matches_numpy_fit(spark):
    """The exact-integer-unit regression agrees with a float numpy
    polyfit over ln(rank)/ln(freq) to ~1e-3 (the 1e-6 ln-unit floor is
    the only divergence source)."""
    import math
    import random

    import numpy as np

    from llm_training_data_pipeline_spark.operators.corpus import zipf_slope

    rng = random.Random(3)
    words = []
    for i in range(1, 80):
        words += [f"w{i}"] * max(1, int(200 / i))
    rng.shuffle(words)
    df = spark.createDataFrame(
        [(1, " ".join(words), "s")], "doc_id long, text string, source string"
    )
    got = zipf_slope(df).collect()[0]["slope"]
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    freqs = sorted(counts.values(), reverse=True)
    xs = [math.log(r + 1) for r in range(len(freqs))]
    ys = [math.log(f) for f in freqs]
    want = np.polyfit(xs, ys, 1)[0]
    assert abs(got - want) < 1e-3, (got, want)
