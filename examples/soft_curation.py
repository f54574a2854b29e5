"""Soft-dedup curation tour (round 8): weigh, don't drop.

Hard dedup deletes every non-winner; at trillion-token scale that
forecloses downstream choices (contrastive pairs want the near-copies,
ablations want the raw mass). The soft family defers the decision:

1. exact content weights (1/n_copies ppm over the D8 digest groups);
2. similarity-GRADED novelty weights off the verified near-dup pairs
   (a 95%-similar copy keeps 50k ppm, a 55%-similar one 450k);
3. the per-source effective-mass report a mixture planner budgets
   against (raw rows vs weighted document mass);
4. the deterministic weighted sampler applying cluster weights —
   ~one document's mass per duplicate cluster survives, with the
   cluster diversity a min-id dedup discards;
5. the corpus-shape diagnostics that tell you WHICH sources needed
   the downweighting: distinct-n diversity ppm and the Zipf slope.

Usage: python examples/soft_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from llm_training_data_pipeline_spark.operators.corpus import (
        ngram_diversity,
        weighted_sample,
        zipf_slope,
    )
    from llm_training_data_pipeline_spark.operators.dedup import (
        MinHashConfig,
        cluster_soft_dedup_weights,
        dedup_clusters,
        exact_soft_dedup_weights,
        minhash_bucket_stars,
        minhash_candidate_pairs,
        novelty_weights,
        soft_dedup_mass,
    )
    from llm_training_data_pipeline_spark.schemas import load_table
    from llm_training_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="soft-curation")
    docs = load_table(spark, "documents", sf_dir)
    cfg = MinHashConfig(
        num_perm=16, threshold=0.5, shingle_size=5, num_bands=4, hash_family="md5"
    )

    exact_w = exact_soft_dedup_weights(docs)
    n_down = exact_w.filter(F.col("n_copies") > 1).count()
    print(f"exact soft weights: {n_down} docs in multi-copy digest groups")

    pairs = minhash_candidate_pairs(docs, cfg=cfg)
    nov = novelty_weights(docs, pairs)
    graded = nov.filter(F.col("max_dup_ppm") > 0)
    print("novelty weights (graded):")
    for r in (
        graded.orderBy(F.col("novelty_ppm")).limit(5).collect()
    ):
        print(
            f"  doc {r['doc_id']}: dup {r['max_dup_ppm']} ppm -> keeps "
            f"{r['novelty_ppm']} ppm"
        )

    clusters = dedup_clusters(minhash_bucket_stars(docs, cfg=cfg))
    cluster_w = cluster_soft_dedup_weights(docs, clusters)
    print("per-source effective mass (raw vs weighted):")
    for r in soft_dedup_mass(docs, cluster_w).limit(5).collect():
        print(
            f"  {r['source']}: {r['n_docs']} raw -> "
            f"{r['effective_docs_ppm'] / 1e6:.2f} effective docs "
            f"({r['downweighted_docs']} downweighted)"
        )

    kept = weighted_sample(
        docs.join(cluster_w.select("doc_id", "soft_weight_ppm"), on="doc_id"),
        (F.col("soft_weight_ppm") / F.lit(1_000_000.0)),
        base_rate=1.0,
    )
    print(f"weighted keep: {docs.count()} -> {kept.count()} docs")

    print("shape diagnostics on the kept corpus:")
    for r in ngram_diversity(kept, ns=(2,)).limit(3).collect():
        print(f"  distinct-2 {r['source']}: {r['diversity_ppm']} ppm")
    for r in zipf_slope(kept).limit(3).collect():
        print(f"  zipf {r['source']}: slope {r['slope']} over {r['n_types']} types")

    spark.stop()


if __name__ == "__main__":
    main()
