"""Incremental batch ingestion: process only files not yet in a manifest.

Continuous corpora land as new files in a directory (a crawl snapshot a
day, a dump a week). Reprocessing the whole directory per run is
O(corpus); the standard fix is a durable manifest of (path, bytes)
already processed and an anti-join against the current listing — the
batch cousin of Structured Streaming's file-source checkpoint, usable
when the processing itself is a batch pipeline run.

The manifest is an epoch-partitioned parquet table (the same
append-only discipline as the streaming signature store): each
successful run appends its file set under ``epoch=N``; nothing is ever
rewritten, so a crashed run before ``commit_manifest`` simply
reprocesses its files (at-least-once, idempotent when the downstream
pipeline dedups by content — which this engine's dedup stages do).

Listing happens driver-side (``glob``): a directory listing is a
metadata operation, and the manifest anti-join is a Spark job over two
slim (path, bytes) tables. A file that changes SIZE under the same
path re-qualifies as new (recrawl-in-place); same-size content edits
need the content-level dedup downstream, which is cheaper than hashing
every file at listing time.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA = "path string, bytes long"


def list_files(spark: SparkSession, input_dir: str, pattern: str = "*") -> DataFrame:
    """Current (path, bytes) listing of ``input_dir`` as a DataFrame."""
    rows = [
        (p, os.path.getsize(p))
        for p in sorted(_glob.glob(os.path.join(input_dir, pattern)))
        if os.path.isfile(p)
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def new_files_frame(listed: DataFrame, seen: DataFrame | None) -> DataFrame:
    """Relational core of ``new_files``: the (path, bytes) anti-join.
    A path whose byte size changed is ABSENT from the join key match and
    so re-qualifies as new — recrawl-in-place semantics. ``seen=None``
    (no manifest yet) returns the full listing. Factored out so the
    registry can oracle-pair the work-list derivation over fixture
    tables while the filesystem-touching wrapper stays pytest-only
    (r8 verdict #3)."""
    if seen is None:
        return listed
    return listed.join(
        seen.select("path", "bytes"), on=["path", "bytes"], how="left_anti"
    )


def new_files(
    spark: SparkSession, input_dir: str, manifest_path: str, pattern: str = "*"
) -> DataFrame:
    """Files in ``input_dir`` not yet recorded in the manifest:
    the work list for this run. First run (no manifest) = everything."""
    listed = list_files(spark, input_dir, pattern)
    if not os.path.exists(manifest_path):
        return new_files_frame(listed, None)
    seen = spark.read.parquet(manifest_path).select("path", "bytes")
    return new_files_frame(listed, seen)


def commit_manifest(
    spark: SparkSession, manifest_path: str, processed: DataFrame, epoch: int
) -> None:
    """Append this run's processed file set under ``epoch=N``. Call
    AFTER the run's outputs are durably written — crash before the
    commit reprocesses, never skips."""
    (
        processed.select("path", "bytes")
        .withColumn("epoch", F.lit(int(epoch)).cast("long"))
        .write.mode("append")
        .partitionBy("epoch")
        .parquet(manifest_path)
    )
