"""Retrieval-stack tour (round 9): BM25 → hybrid RRF → PQ/IVFPQ → mining.

The retrieval end of corpus curation, smallest-to-largest index:

1. keyword relevance with exact-rational BM25 (seed a topic slice out of
   the raw corpus);
2. fuse it with dense cosine ranks by Reciprocal Rank Fusion (the
   production hybrid default);
3. compress the dense side: product-quantize the embedding table to an
   m-byte-per-vector code index and run asymmetric-distance top-k, then
   the composed IVF+PQ index (coarse lists route the query, codes score
   it) with its recall vs brute force;
4. mine hard negatives for contrastive training off the exact ranking.

Usage: python examples/retrieval_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from llm_training_data_pipeline_spark.operators.corpus import bm25_topk
    from llm_training_data_pipeline_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        hard_negatives,
        hybrid_rrf_topk,
        ivfpq_topk,
        pq_codes,
        pq_topk,
    )
    from llm_training_data_pipeline_spark.schemas import load_table
    from llm_training_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="retrieval-curation")
    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)

    print("== 1. BM25 top-5 for ['spark', 'query'] ==")
    bm25_topk(docs, ["spark", "query"], k=5).show(truncate=False)

    print("== 2. hybrid RRF (BM25 rank x cosine rank) ==")
    hybrid_rrf_topk(docs, emb, ["spark", "query"], k=5).show(truncate=False)

    queries = emb.filter(F.col("vec_id") < 3)

    print("== 3a. PQ code index (m-byte vectors) ==")
    pq_codes(emb, m=8, ks=16).orderBy("vec_id").show(5, truncate=False)

    print("== 3b. PQ/ADC top-5 ==")
    pq_topk(emb, queries, k=5).show(truncate=False)

    print("== 3c. IVF+PQ top-5 + recall vs brute force ==")
    approx = ivfpq_topk(emb, queries, k=5, n_clusters=8, n_probe=3)
    approx.show(truncate=False)
    exact = brute_force_topk(emb, queries, k=5).select("q_id", "vec_id")
    ann_recall(exact, approx.select("q_id", "vec_id")).show()

    print("== 3d. Lloyd-refined codebook (r10): recall upgrade, still replay-exact ==")
    from llm_training_data_pipeline_spark.operators.similarity import (
        collect_pq_codebook,
        pq_codebook_refine,
        pq_encode_expr,
    )

    cb1 = pq_codebook_refine(emb, m=8, ks=16, iters=1)
    pq_topk(emb, queries, k=5, codebook=cb1).show(5, truncate=False)

    print("== 3e. streaming encode shape: row-local codes off the driver-literal codebook ==")
    lit_cb = collect_pq_codebook(cb1)
    emb.select(
        "vec_id",
        pq_encode_expr(
            F.transform("embedding", lambda x: x.cast("double")), lit_cb
        ).alias("codes"),
    ).orderBy("vec_id").show(5, truncate=False)

    print("== 3f. unified recall audit: every index family, one ground truth ==")
    from llm_training_data_pipeline_spark.plans.queries import registry

    registry()["ann_recall_unified"][0](spark, sf_dir).show(truncate=False)

    print("== 4. hard negatives (close but not near-dup) ==")
    hard_negatives(emb, queries, k=3, dup_ceiling=0.95).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
