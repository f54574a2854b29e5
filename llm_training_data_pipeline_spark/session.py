"""SparkSession factory tuned for the LLM-training-data workload.

Local mode mirrors the driver harness (``local[$SPARK_GRAFT_CPUS]``); on a
real cluster the same confs apply, only ``master`` changes. Every conf here
is scale-motivated:

- AQE on: runtime coalescing of post-shuffle partitions, skew-join splitting
  (text corpora are skewed: a few giant documents / hot LSH buckets).
- ``spark.sql.shuffle.partitions`` sized to ~2x cores locally; at 100 TB a
  cluster run would raise this (or let AQE coalesce from a high initial).
- Arrow enabled: every pandas UDF transfer is columnar, not pickled rows.
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle regardless of host TZ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "llm-training-data-pipeline-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with pipeline-appropriate confs.

    Confs that require a fresh JVM (driver memory) are only effective when no
    session exists yet; everything else is safe to set on a live session.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    # A/B knob (r15, guide §3.1): when set, let the planner pick shuffled
    # hash join over sort-merge ("false" enables SHJ when its size
    # conditions fit). Unset = Spark default (prefer sort-merge). Kept as
    # an env knob so the suite-wide A/B is reproducible; see
    # OPTIMIZATION_r15.md for the measured verdict.
    psm = os.environ.get("SPARK_GRAFT_PREFER_SMJ")
    if psm is not None:
        builder = builder.config("spark.sql.join.preferSortMergeJoin", psm)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally provided session.

    The driver harness hands us its own SparkSession; this applies the subset
    of our tuning that is legal post-startup.
    """
    runtime_confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }
    for k, v in runtime_confs.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked by the hosting harness — keep going
    return spark
