"""Streaming Count-Min Sketch: the bounded-state frequency summary of an
unbounded document stream.

The online complement of ``operators/sketch.py``: each micro-batch folds
its word counts into a per-epoch partial sketch and persists it as an
``epoch=N`` parquet partition under ``state_dir`` (the dedup_stream
signature-store discipline). Because a CMS merges by cell-wise addition,
the authoritative sketch at any moment is one ``(row_j, bucket)`` sum
over the store — and a stream processed in ANY batching equals the batch
``cms_sketch`` of the concatenated input bit-for-bit (pinned in tests).

Replay safety: an epoch partition is OVERWRITTEN on checkpoint-restart
replay, never double-added — idempotent by construction, no read-back
or dedup logic needed (contrast the near-dup store, whose probe must
self-exclude).

State size is depth x width cells per epoch ceiling; compact epochs into
one partition offline whenever the partition count grows (same sum, one
``read_sketch().write`` pass).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.operators.sketch import (
    cms_sketch,
    word_counts,
)


def streaming_cms(
    stream: DataFrame,
    *,
    state_dir: str,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
):
    """foreachBatch writer folding each micro-batch into the sketch store.

    Returns the configured ``DataStreamWriter`` — caller adds options and
    ``.start()``. The per-batch plan is the batch operator verbatim
    (explode → count → depth x vocab bucket explode → (row_j, bucket)
    sum), scoped to a handful of shuffle partitions like the near-dup
    stream's micro-batches."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        prev = sess.conf.get("spark.sql.shuffle.partitions")
        sess.conf.set("spark.sql.shuffle.partitions", "2")
        try:
            partial = cms_sketch(word_counts(batch_df, text_col), depth, width)
            partial.write.mode("overwrite").parquet(
                os.path.join(state_dir, f"epoch={epoch_id}")
            )
        finally:
            sess.conf.set("spark.sql.shuffle.partitions", prev)

    return stream.writeStream.foreachBatch(handle)


def read_sketch(spark: SparkSession, state_dir: str) -> DataFrame:
    """The authoritative merged sketch: cell-wise sum over every epoch
    partition. ``(row_j, bucket, cell)`` — feed to ``cms_estimate``."""
    return (
        spark.read.parquet(state_dir)
        .groupBy("row_j", "bucket")
        .agg(F.sum("cell").cast("long").alias("cell"))
    )
