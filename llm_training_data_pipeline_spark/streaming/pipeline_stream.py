"""Streaming variant of the clean → quality pipeline front-end.

The cleaning chain (C3-C8) and quality cascade (Q1-Q8) are pure
projections and filters — STATELESS operators that Structured Streaming
runs unchanged, micro-batch by micro-batch, with no watermark, no state
store, and no shuffle. This module wires them onto a ``readStream``
source so a corpus landing continuously (e.g. crawler output dropping
parquet files into a directory) is cleaned and quality-gated
incrementally instead of in nightly batch reruns.

Stateful streaming pieces live in ``dedup_stream`` (exact/near-dup with
TTL'd state, windowed counts); compose them downstream of this
front-end when end-to-end streaming ingestion needs dedup too.

At scale: each micro-batch plans exactly like the batch pipeline (one
codegen'd stage over the new files), so throughput is bounded by file
listing + scan, and ``maxFilesPerTrigger`` is the backpressure knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.operators import cleaning, quality


def clean_quality_stream(
    stream: DataFrame,
    text_col: str = "text",
    cleaner_cfg: cleaning.CleanerConfig | None = None,
    quality_cfg: quality.QualityConfig | None = None,
) -> DataFrame:
    """Apply cleaning (C3-C8) + the quality cascade (Q1-Q8) to a
    streaming DataFrame; returns the passing rows with cleaned text.

    Identical operator code to the batch pipeline — the functions are
    stateless column expressions, so the SAME plan fragments run in both
    modes (this is asserted by tests, not just claimed).
    """
    ccfg = cleaner_cfg or cleaning.CleanerConfig()
    qcfg = quality_cfg or quality.QualityConfig()
    df = cleaning.clean_documents(stream, text_col, ccfg, sql_only=True)
    df = df.drop(text_col).withColumnRenamed("cleaned_text", text_col)
    df = quality.with_quality(df, text_col, qcfg, include_scores=False)
    return df.filter(F.col("passed")).drop("passed", "reason")


def stream_documents_dir(
    spark,
    input_dir: str,
    schema,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over a landing directory of parquet files."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)
