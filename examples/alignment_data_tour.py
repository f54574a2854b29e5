"""Alignment-data tour (round-8 fourth wave): retrieval, SFT, preference.

The post-pretraining end of the data pipeline:

1. retrieve topical seed documents with BM25, then fuse the keyword
   ranking with the cosine vector ranking by Reciprocal Rank Fusion —
   the hybrid-search recipe that catches what either signal misses;
2. screen the corpus for leaked chat-template control tokens (model
   output that found its way back into the data);
3. render conversations to ChatML-style training strings and compute
   the assistant-only loss spans (the mask arithmetic, not text search);
4. report RLHF/DPO preference-pair health: degenerate pairs and length
   bias, the two classic reward-hacking seeds.

Usage: python examples/alignment_data_tour.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from llm_training_data_pipeline_spark.operators import preference, sft
    from llm_training_data_pipeline_spark.operators.corpus import bm25_topk
    from llm_training_data_pipeline_spark.operators.quality import (
        chat_markup_contamination,
    )
    from llm_training_data_pipeline_spark.operators.similarity import (
        hybrid_rrf_topk,
    )
    from llm_training_data_pipeline_spark.schemas import load_table
    from llm_training_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="alignment-data-tour")
    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    terms = ["vector", "stream", "window"]

    print(f"== BM25 top-5 for {terms} ==")
    bm25_topk(docs, terms=terms, k=5).show(truncate=False)

    print("== Hybrid RRF top-5 (BM25 + cosine to vec 0) ==")
    hybrid_rrf_topk(docs, emb, terms=terms, query_id=0, k=5).show(truncate=False)

    print("== Chat-marker leakage screen ==")
    chat_markup_contamination(docs).show(truncate=False)

    conv = sft.conversations_from_documents(docs)
    rendered = sft.render_chat(conv)
    spans = sft.assistant_loss_spans(conv)
    print(
        f"== SFT: {rendered.count()} conversations rendered, "
        f"{spans.count()} assistant loss spans =="
    )
    rendered.select("conv_id", "n_turns", "n_chars").show(5)
    spans.show(5)

    print("== Preference-pair health (length bias / degenerate pairs) ==")
    preference.preference_pair_stats(
        preference.preference_pairs_from_documents(docs)
    ).show(truncate=False)


if __name__ == "__main__":
    main()
