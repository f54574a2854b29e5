"""End-to-end corpus curation walk-through (round-6 feature tour).

Demonstrates the intended 100 TB workflow on the local test tables:
one MinHash signature pass feeding every dedup consumer, document- and
span-level deduplication, quality + readability signals, an ANN recall
audit, and GPT-style token packing.

Usage: python examples/corpus_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from llm_training_data_pipeline_spark.operators import corpus, dedup
    from llm_training_data_pipeline_spark.operators.similarity import (
        ann_lsh_topk,
        ann_recall,
        brute_force_topk,
    )
    from llm_training_data_pipeline_spark.operators.textstats import (
        with_readability,
    )
    from llm_training_data_pipeline_spark.schemas import load_table
    from llm_training_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="corpus-curation")
    docs = load_table(spark, "documents", sf_dir)

    # --- ONE signature pass, many consumers -------------------------------
    cfg = dedup.MinHashConfig(
        num_perm=16, threshold=0.5, shingle_size=5, num_bands=4, hash_family="md5"
    )
    sigs = dedup.cached_minhash_signatures(docs, cfg=cfg, cache_key=sf_dir)

    deduped = dedup.minhash_dedup(docs, cfg=cfg, signatures=sigs)
    best = dedup.dedup_keep_best(docs, "n_chars", cfg=cfg, signatures=sigs)
    print("=== document-level dedup (shared signature pass) ===")
    print("input:", docs.count(), "min-id winners:", deduped.count(),
          "keep-best winners:", best.count())

    # --- span-level (sub-document) dedup ----------------------------------
    # on the RAW corpus: whole-doc dedup above already removes full
    # copies, so the span signal is shown pre-dedup where it fires
    spans = corpus.duplicated_span_stats(docs, window=8)
    flagged = spans.filter(F.col("dup_fraction") > 0)
    print("=== duplicated 8-token spans (Lee et al. 2021) ===")
    flagged.orderBy(F.col("dup_fraction").desc()).show(5)
    cleaned = corpus.remove_duplicated_spans(docs, window=8)
    removed = cleaned.agg(F.sum("removed_tokens")).collect()[0][0]
    print("tokens surgically removed corpus-wide:", removed)

    # --- quality signals ---------------------------------------------------
    print("=== readability (Flesch / FK) ===")
    with_readability(deduped).select(
        "doc_id", "n_words", "flesch_ease", "fk_grade"
    ).show(5)

    # --- ANN with a measured recall floor ----------------------------------
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=10).select("q_id", "vec_id")
    approx = ann_lsh_topk(
        emb, queries, k=10, num_planes=4, num_tables=8
    ).select("q_id", "vec_id")
    print("=== ANN recall audit (4 planes x 8 tables) ===")
    ann_recall(exact, approx).show()

    # --- training-loader artifact ------------------------------------------
    from llm_training_data_pipeline_spark.operators.tokenize import (
        tokenize_documents,
        train_tokenizer,
    )

    tok = train_tokenizer(deduped, algorithm="byte_bpe", vocab_size=800)
    packed = corpus.pack_token_ids(
        tokenize_documents(deduped, tok), seq_len=512,
        eos_id=tok.vocab.get("<eos>"),
    )
    print("=== packed 512-token training sequences ===")
    packed.select("seq_id", "n_tokens").orderBy("seq_id").show(5)


if __name__ == "__main__":
    main()
