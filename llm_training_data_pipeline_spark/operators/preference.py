"""Preference-pair (RLHF / DPO) data diagnostics.

Alignment datasets are (prompt, chosen, rejected) pairs, and the two
classic data bugs are (a) degenerate pairs — chosen and rejected are
the same text, teaching nothing while diluting gradients — and (b)
length bias — chosen answers systematically longer than rejected ones,
which reward models exploit ("longer = better" hacking). Both are pure
aggregates; this module measures them per source.

The pair adapter derives deterministic pairs from the documents table
(consecutive ids; even = chosen) so both engines replay the same input
— real preference tables already have the pair shape.

Scale: one hash aggregate on the source key after a same-row
projection; no joins, no windows. Length gaps can be negative, so the
mean is ONE double division per source (integer division semantics on
negatives differ between engines — Spark's ``div`` truncates toward
zero, DuckDB's ``//`` floors — and are avoided entirely).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.functions.text import whitespace_tokens


def preference_pairs_from_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic (pair_id, source, chosen, rejected) view over a
    documents table: ids 2i / 2i+1 form pair i with the even doc as
    chosen. A self-join on the derived pair key (one shuffle) — odd
    trailing docs drop out via the inner join."""
    pid = (F.col(id_col) - (F.col(id_col) % 2)).cast("long")
    chosen = df.filter(F.col(id_col) % 2 == 0).select(
        pid.alias("pair_id"),
        F.col(source_col).alias("source"),
        F.col(text_col).alias("chosen"),
    )
    rejected = df.filter(F.col(id_col) % 2 == 1).select(
        pid.alias("pair_id"), F.col(text_col).alias("rejected")
    )
    return chosen.join(rejected, on="pair_id")


def preference_pair_stats(pairs: DataFrame) -> DataFrame:
    """Per-source preference-data health report:

    - ``n_pairs``
    - ``degenerate_pairs`` — chosen == rejected exactly
    - ``chosen_longer_ppm`` — share of pairs where the chosen answer
      has MORE words (exact parts-per-million, integer division)
    - ``mean_word_gap`` — mean(chosen words − rejected words); a value
      far from 0 flags length bias before a reward model learns it
    """
    cw = F.size(whitespace_tokens(F.col("chosen"))).cast("long")
    rw = F.size(whitespace_tokens(F.col("rejected"))).cast("long")
    per = pairs.select(
        "source",
        (F.col("chosen") == F.col("rejected")).cast("long").alias("_degen"),
        (cw > rw).cast("long").alias("_longer"),
        (cw - rw).alias("_gap"),
    )
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("_degen").cast("long").alias("degenerate_pairs"),
        F.sum("_longer").cast("long").alias("_n_longer"),
        F.sum("_gap").cast("long").alias("_gap_sum"),
    )
    return agg.select(
        "source",
        "n_pairs",
        "degenerate_pairs",
        F.expr("_n_longer * 1000000 div n_pairs").alias("chosen_longer_ppm"),
        F.round(
            F.col("_gap_sum").cast("double") / F.col("n_pairs").cast("double"), 6
        ).alias("mean_word_gap"),
    ).orderBy("source")
