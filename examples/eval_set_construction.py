"""Clean eval-set construction tour (round 10).

The evaluation-hygiene end of corpus curation — the workflow run before
any benchmark number is trusted:

1. build a deterministic per-source quota holdout with exact-digest
   decontamination (corpus.eval_holdout — eval/train digest sets
   disjoint by construction, rebuild-stable across incremental runs);
2. audit the PARAPHRASE tier the exact digests cannot see: MinHash
   near-dup pairs crossing the split (dedup.split_leakage_stats —
   untagged docs surface as '(untagged)' rather than silently
   vanishing);
3. drive the same thing through the pipeline runner's gated holdout
   stage (holdout.enabled), which writes the decontaminated eval rows
   to their own parquet sink.

Usage: python examples/eval_set_construction.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("eval-set-construction")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from llm_training_data_pipeline_spark.operators.corpus import eval_holdout
    from llm_training_data_pipeline_spark.operators.dedup import (
        MinHashConfig,
        minhash_candidate_pairs,
        split_leakage_stats,
    )
    from llm_training_data_pipeline_spark.schemas import load_table

    docs = load_table(spark, "documents", sf_dir)

    print("== 1. quota holdout with exact decontamination ==")
    tagged = eval_holdout(docs, per_source=5)
    tagged.groupBy("split").count().orderBy("split").show()
    rejected = tagged.filter(F.col("reject_reason").isNotNull())
    print(f"candidates rejected (verbatim twin in train): {rejected.count()}")

    print("== 2. paraphrase-tier leakage audit over the tagged split ==")
    pairs = minhash_candidate_pairs(
        docs, cfg=MinHashConfig(num_perm=16, num_bands=4, threshold=0.5)
    )
    split_leakage_stats(
        pairs, tagged.select("doc_id", "split")
    ).show(truncate=False)

    print("== 3. the pipeline's gated holdout stage ==")
    from llm_training_data_pipeline_spark.plans.config import PipelineConfig
    from llm_training_data_pipeline_spark.plans.pipeline import run_pipeline

    cfg = PipelineConfig(
        {
            "cleaning": {"min_length_chars": 50},
            "deduplication": {"enabled": False},
            "quality": {"min_words": 10},
            "tokenization": {"enabled": False},
            "holdout": {"enabled": True, "per_source": 3},
        }
    )
    out_dir = tempfile.mkdtemp(prefix="eval_set_")
    summary = run_pipeline(spark, docs, cfg, out_dir)
    h = summary["stages"]["holdout"]
    print(
        f"holdout stage: {h['rows']} rows, {h['eval_rows']} eval, "
        f"{h['rejected_rows']} rejected -> {summary['holdout_path']}"
    )

    spark.stop()


if __name__ == "__main__":
    main()
