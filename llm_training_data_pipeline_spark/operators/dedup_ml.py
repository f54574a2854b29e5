"""MLlib-based MinHash LSH dedup — the ``pyspark.ml`` expression of D1-D5.

SURVEY.md §2.3 maps the reference's datasketch MinHash to
``pyspark.ml.feature.MinHashLSH``; this module is that path, alongside the
native-expression implementation in ``dedup.py``. Pipeline:

    shingles (native array expr) → HashingTF sparse vectors →
    MinHashLSH.approxSimilarityJoin on Jaccard distance → min-id winner.

Trade-offs vs the native path: MLlib handles banding internally (no
num_bands knob), distances are EXACT Jaccard over the hashed feature space
(approxSimilarityJoin verifies candidates), but vectors are materialized
per row and the join is a cross of candidate buckets — heavier than the
slim band join for very large corpora. Kept as (a) an independent
cross-check of the native implementation and (b) the idiomatic
MLlib-preprocessing form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.functions.text import char_shingles


def minhash_ml_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
    shingle_size: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Near-dup candidate pairs with EXACT Jaccard distance over hashed
    shingle features (MLlib verifies candidates inside
    ``approxSimilarityJoin``)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    normed = df.select(
        F.col(id_col),
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ").alias("_norm"),
    )
    with_shingles = normed.select(
        F.col(id_col), char_shingles(F.col("_norm"), shingle_size).alias("_shingles")
    ).filter(F.size("_shingles") > 0)

    tf = HashingTF(
        inputCol="_shingles", outputCol="_features", numFeatures=num_features, binary=True
    )
    feats = tf.transform(with_shingles)
    lsh = MinHashLSH(
        inputCol="_features", outputCol="_hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, 1.0 - threshold, distCol="_jaccard_dist"
    )
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round(1.0 - F.col("_jaccard_dist"), 6).alias("jaccard"),
        )
    )


def minhash_ml_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hash_tables: int = 8,
) -> DataFrame:
    """Min-id-winner dedup via the MLlib pair generator."""
    losers = (
        minhash_ml_pairs(df, text_col, id_col, threshold, num_hash_tables)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(losers, on=id_col, how="left_anti")
