"""Dataset card generator — the HF-style corpus summary artifact.

Composes the engine's own oracle-checked operators (mix report, lang-id
histogram, exact-dedup stats, quality cascade, char entropy, length
percentiles) into ONE markdown document a dataset release would ship.
Every number is computed by the same code paths the driver hash-checks,
so the card can't drift from the engine's answers.

Scale: one aggregate job per section, each a single hash aggregate or
percentile pass over natural keys; nothing driver-side except the final
small collects (top-k rows per section, bounded by ``top_k``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fmt_pct(x: float) -> str:
    return f"{100.0 * x:.1f}%"


def dataset_card(
    df: DataFrame,
    name: str = "corpus",
    text_col: str = "text",
    top_k: int = 10,
) -> str:
    """Render a markdown dataset card for a documents DataFrame.

    Handles the all-filtered case (0 rows → zeros and n/a, no crash).
    The input is persisted around the five section jobs so an expensive
    upstream chain (caps, entropy gates, dedup) executes once, not per
    section.
    """
    from llm_training_data_pipeline_spark.operators.dedup import exact_dedup_stats
    from llm_training_data_pipeline_spark.operators.quality import with_quality
    from llm_training_data_pipeline_spark.operators.textstats import (
        with_char_entropy,
        with_lang_id,
    )

    df = df.persist()
    totals = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length(text_col)).cast("long").alias("n_chars"),
        F.round(F.percentile(F.length(text_col), F.lit(0.5)), 1).alias("p50_chars"),
        F.round(F.percentile(F.length(text_col), F.lit(0.9)), 1).alias("p90_chars"),
    ).collect()[0]

    sources = (
        df.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("source"))
        .limit(top_k)
        .collect()
        if "source" in df.columns
        else []
    )
    langs = (
        with_lang_id(df, text_col)
        .groupBy("detected_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("detected_lang"))
        .limit(top_k)
        .collect()
    )
    dd = exact_dedup_stats(df, text_col).collect()[0]
    q = (
        with_quality(df, text_col, include_scores=False)
        .agg(
            F.sum(F.when(F.col("passed"), 1).otherwise(0))
            .cast("long")
            .alias("passed"),
            F.count(F.lit(1)).cast("long").alias("total"),
        )
        .collect()[0]
    )
    ent = (
        with_char_entropy(df, text_col)
        .agg(
            F.round(F.percentile("char_entropy", F.lit(0.1)), 3).alias("p10"),
            F.round(F.percentile("char_entropy", F.lit(0.5)), 3).alias("p50"),
        )
        .collect()[0]
    )
    df.unpersist()

    # zero-row corpus: sums/percentiles come back NULL — render zeros/n-a
    n_docs = totals["n_docs"] or 0
    n_chars = totals["n_chars"] or 0
    na = lambda v: "n/a" if v is None else v  # noqa: E731

    lines = [
        f"# Dataset card — {name}",
        "",
        "## Size",
        f"- documents: {n_docs:,}",
        f"- characters: {n_chars:,}",
        f"- doc length (chars): p50 {na(totals['p50_chars'])},"
        f" p90 {na(totals['p90_chars'])}",
        "",
        "## Source mix",
    ]
    for r in sources:
        lines.append(
            f"- {r['source']}: {r['n_docs']:,} ({_fmt_pct(r['n_docs'] / n_docs)})"
        )
    lines += ["", "## Language mix (detected)"]
    for r in langs:
        lines.append(
            f"- {r['detected_lang']}: {r['n_docs']:,} ({_fmt_pct(r['n_docs'] / n_docs)})"
        )
    uniq = dd["unique_documents"] or 0
    dups = dd["duplicate_documents"] or 0
    clusters = dd["duplicate_clusters"] or 0
    dup_rate = dups / dd["total_documents"] if dd["total_documents"] else 0.0
    passed = q["passed"] or 0
    total_q = q["total"] or 0
    lines += [
        "",
        "## Duplication (exact)",
        f"- unique documents: {uniq:,}",
        f"- exact duplicates: {dups:,} ({_fmt_pct(dup_rate)})",
        f"- duplicate clusters: {clusters:,}",
        "",
        "## Quality",
        f"- battery pass rate: {_fmt_pct(passed / total_q if total_q else 0.0)}"
        f" ({passed:,} of {total_q:,})",
        f"- char-entropy p10/p50 (nats): {na(ent['p10'])} / {na(ent['p50'])}",
        "",
    ]
    return "\n".join(lines)


def write_dataset_card(df: DataFrame, path: str, **kwargs) -> str:
    """Render and write the card; returns the markdown."""
    md = dataset_card(df, **kwargs)
    with open(path, "w", encoding="utf-8") as f:
        f.write(md)
    return md
