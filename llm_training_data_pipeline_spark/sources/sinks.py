"""Output sinks (SURVEY.md §2.1 S6-S10).

Reference: /root/reference/src/main.py:353-420 — pandas→parquet, JSONL,
tokens JSONL, JSON summary. Spark-first: distributed ``df.write`` (each
format writes in parallel, one file per partition; at 100 TB this is the
only possible shape). The summary sink stays a driver-side json.dump of
collected aggregates, as in the reference.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUTPUT_COLUMNS = ["id", "title", "text", "token_count"]  # main.py:374-381


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """S6: snappy parquet (Spark default codec is snappy, as the reference
    requests explicitly). ``partition_by`` produces hive-style directory
    partitioning — the layout that makes downstream partition pruning free
    at corpus scale (e.g. partition by lang or source)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7: one JSON object per line; Spark's json sink IS jsonl."""
    df.write.mode(mode).json(path)


def write_tokens_jsonl(df: DataFrame, path: str, tokens_col: str = "tokens", mode: str = "overwrite") -> None:
    """S8: {"tokens": [...]} per document (main.py:401-405)."""
    df.select(F.col(tokens_col).alias("tokens")).write.mode(mode).json(path)


def write_summary(summary: dict, path: str) -> None:
    """S9: JSON summary of collected aggregates (main.py:407-420)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(summary, f, indent=2, default=str)


def read_pipeline_output(spark, path: str) -> DataFrame:
    """S11: read the pipeline's parquet output back for analysis."""
    return spark.read.parquet(path)
