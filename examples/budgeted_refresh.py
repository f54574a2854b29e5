"""Incremental corpus refresh under a token budget (second-wave tour).

The nightly-refresh shape a production training-data pipeline runs:

1. new shard arrives → Bloom pre-filter against the corpus history
   (definitely-new rows never touch the anti-join);
2. quality signals on the survivors (bigram-LM surprisal, compression
   ratio, blocklist);
3. greedy token-budget selection of the best survivors per source;
4. mixture/epoch plan toward target source weights;
5. deterministic train/val/test tagging of the final selection.

Usage: python examples/budgeted_refresh.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from llm_training_data_pipeline_spark.functions.text import strip_ws
    from llm_training_data_pipeline_spark.operators import bloom, corpus
    from llm_training_data_pipeline_spark.operators.textstats import (
        with_compression_ratio,
    )
    from llm_training_data_pipeline_spark.schemas import load_table
    from llm_training_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="budgeted-refresh")
    docs = load_table(spark, "documents", sf_dir).withColumn(
        "digest", F.md5(F.lower(strip_ws(F.col("text"))))
    )

    # ---- 1. incremental dedup: new shard vs history, Bloom-prefiltered
    history = docs.filter(F.col("doc_id") < 250)
    shard = docs.filter(F.col("doc_id") >= 250)
    bf = bloom.build_bloom_filter(
        history, "digest", num_bits=bloom.optimal_num_bits(history.count())
    )
    fresh = bloom.bloom_incremental_new_docs(shard, history, "digest", bloom=bf)
    print(f"shard {shard.count()} rows -> {fresh.count()} new after Bloom+anti-join")

    # ---- 2. quality signals
    scored = with_compression_ratio(fresh)
    surprisal = corpus.bigram_surprisal(fresh).select("doc_id", "avg_bigram_surprisal")
    scored = scored.join(surprisal, on="doc_id", how="left")
    blocked = corpus.with_blocklist_hits(scored, ["error", "null"]).filter(
        ~F.col("blocked")
    )
    print(f"after blocklist: {blocked.count()} docs")

    # ---- 3. greedy token-budget selection per source
    picked = corpus.select_token_budget(blocked, budget_tokens=400)
    print(f"token budget kept {picked.count()} docs")

    # ---- 4. mixture/epoch plan toward target weights
    plan = corpus.mixture_epoch_plan(
        blocked, {"src0": 2.0}, budget_tokens=20_000
    )
    plan.orderBy(F.desc("epochs")).show(5)

    # ---- 5. deterministic split of the selection
    chosen = blocked.join(picked.select(F.col("doc_id")), on="doc_id")
    split = corpus.dataset_split(chosen)
    split.groupBy("split").count().show()

    spark.stop()


if __name__ == "__main__":
    main()
