"""Count-Min Sketch pins: the two CMS invariants (never undercounts;
collision-free at ample width) plus mergeability and the saturated-width
worst case."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.operators import sketch

DOCS = [
    (1, "alpha beta gamma alpha"),
    (2, "beta beta delta"),
    (3, "alpha epsilon"),
]
# exact: alpha 3, beta 3, gamma 1, delta 1, epsilon 1


def _report(spark, width):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["word"]: r
        for r in sketch.heavy_hitters_report(df, width=width, top_k=10).collect()
    }


def test_cms_never_undercounts_and_exact_when_wide(spark):
    rows = _report(spark, width=1024)
    assert rows["alpha"]["exact_cnt"] == 3 and rows["beta"]["exact_cnt"] == 3
    for r in rows.values():
        assert r["est_cnt"] >= r["exact_cnt"]
        assert r["bound_ok"] is True
    # 5 words into 1024 buckets x 4 rows: a shared bucket in EVERY row is
    # ~(5/1024)^4 — if this ever trips, the hash lane changed
    assert all(r["overestimate_cnt"] == 0 for r in rows.values())


def test_cms_width_one_estimates_total(spark):
    # one bucket per row: every cell is N, so every estimate is N=9
    rows = _report(spark, width=1)
    for r in rows.values():
        assert r["est_cnt"] == 9
        assert r["est_cnt"] >= r["exact_cnt"]


def test_cms_sketch_merges_by_addition(spark):
    full = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = full.filter(F.col("doc_id") <= 1)
    b = full.filter(F.col("doc_id") > 1)
    s_full = sketch.cms_sketch(sketch.word_counts(full), width=16)
    merged = (
        sketch.cms_sketch(sketch.word_counts(a), width=16)
        .unionByName(sketch.cms_sketch(sketch.word_counts(b), width=16))
        .groupBy("row_j", "bucket")
        .agg(F.sum("cell").alias("cell"))
    )
    assert sorted(map(tuple, s_full.collect())) == sorted(map(tuple, merged.collect()))
