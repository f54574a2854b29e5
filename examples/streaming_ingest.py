"""Streaming ingest with incremental near-dup dedup + shard planning.

The live-ingest shape (round-7 tour): documents arrive as files in a
landing directory and flow through

1. `streaming_minhash_dedup_incremental` — all-JVM per-micro-batch
   MinHash dedup against a durable epoch-partitioned signature store
   (survives restarts; single-batch replay equals the batch operator);
2. script-mixing + quality screens on each accepted batch;
3. `shard_assignment` over the accumulated accepted corpus — the
   size-balanced output layout a 100 TB sink needs.

Usage: python examples/streaming_ingest.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from llm_training_data_pipeline_spark.operators import corpus
    from llm_training_data_pipeline_spark.operators.dedup import MinHashConfig
    from llm_training_data_pipeline_spark.operators.textstats import (
        with_script_mix,
    )
    from llm_training_data_pipeline_spark.schemas import load_table
    from llm_training_data_pipeline_spark.session import get_spark
    from llm_training_data_pipeline_spark.streaming.dedup_stream import (
        streaming_minhash_dedup_incremental,
    )

    spark = get_spark(app_name="streaming-ingest")
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    n_in = docs.count()

    # stage the corpus as 4 landing files → 4 micro-batches
    landing = tempfile.mkdtemp(prefix="ingest_landing_")
    state = tempfile.mkdtemp(prefix="ingest_sigstore_")
    out_dir = tempfile.mkdtemp(prefix="ingest_accepted_")
    docs.repartition(4).write.mode("overwrite").parquet(landing)

    accepted_total = {"n": 0}

    def sink(batch_df, epoch_id):
        screened = with_script_mix(batch_df, "text").filter(
            ~F.col("script_mixed")
        )
        kept = screened.drop(
            "n_scripts", "dominant_script", "dominant_permille", "script_mixed"
        )
        kept.write.mode("append").parquet(out_dir)
        accepted_total["n"] += kept.count()
        print(f"  epoch {epoch_id}: accepted so far {accepted_total['n']}")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = streaming_minhash_dedup_incremental(
        stream,
        state_dir=state,
        sink=sink,
        cfg=MinHashConfig(num_perm=32, num_bands=8),
    ).start()
    q.processAllAvailable()
    q.stop()

    accepted = spark.read.parquet(out_dir)
    plan = corpus.shard_assignment(accepted, target_chars=50_000)
    shards = (
        plan.groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars"))
        .orderBy("shard_id")
        .collect()
    )
    print(f"ingested {n_in} docs -> accepted {accepted.count()}")
    for r in shards:
        print(f"  shard {r['shard_id']}: {r['n_docs']} docs, {r['chars']} chars")

    for d in (landing, state, out_dir):
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
