"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``llm_training_data_pipeline_spark``; this module
only adapts the registry to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from llm_training_data_pipeline_spark.plans.queries import registry  # noqa: E402
from llm_training_data_pipeline_spark.session import tune_for_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core
    pipeline as one lazy plan — clean → quality cascade → reason histogram
    per detected language."""
    from pyspark.sql import functions as F

    from llm_training_data_pipeline_spark.operators import cleaning, quality, textstats

    tune_for_session(spark)
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    cleaned = cleaning.clean_documents(
        docs, "text", cleaning.CleanerConfig(min_length_chars=100), sql_only=True
    )
    labeled = textstats.with_lang_id(cleaned, "cleaned_text")
    judged = quality.with_quality(
        labeled, "cleaned_text", quality.QualityConfig(min_words=20), include_scores=False
    )
    return judged.groupBy("detected_lang", "reason").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("cleaned_length"), 2).alias("avg_len"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; omitted keys
    (MinHash/SimHash/BPE/ANN/approx sketches) get the driver's rows-only
    check, as documented in their docstrings."""
    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
