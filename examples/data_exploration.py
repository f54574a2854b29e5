"""Post-pipeline analysis (S11 parity with the reference's
notebooks/data_exploration.ipynb): read the pipeline's parquet output back
and print corpus statistics.

Usage: python examples/data_exploration.py [output_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "data/output"
    from llm_training_data_pipeline_spark.session import get_spark
    from llm_training_data_pipeline_spark.sources.sinks import read_pipeline_output

    path = f"{out_dir}/pipeline_output.parquet"
    if not os.path.exists(path):
        raise SystemExit(
            f"no pipeline output at {path} — run the pipeline CLI first:\n"
            "  python -m llm_training_data_pipeline_spark.plans.pipeline "
            f"--input <docs.parquet> --output-dir {out_dir}"
        )
    spark = get_spark(app_name="data-exploration")
    df = read_pipeline_output(spark, path)

    print("=== corpus overview ===")
    df.printSchema()
    df.agg(
        F.count(F.lit(1)).alias("documents"),
        F.sum("token_count").alias("total_tokens"),
        F.round(F.avg("token_count"), 1).alias("avg_tokens_per_doc"),
        F.round(F.avg(F.length("text")), 1).alias("avg_chars"),
    ).show(truncate=False)

    print("=== token count distribution ===")
    df.select(
        F.expr("percentile(token_count, array(0.1, 0.5, 0.9, 0.99))").alias("p10_p50_p90_p99")
    ).show(truncate=False)

    if "lang" in df.columns:
        print("=== by language ===")
        df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("docs"),
            F.round(F.avg("token_count"), 1).alias("avg_tokens"),
        ).orderBy(F.col("docs").desc()).show(truncate=False)

    print("=== quality rulesets (reference battery / Gopher / C4) ===")
    from llm_training_data_pipeline_spark.operators.quality import (
        with_c4_quality,
        with_gopher_quality,
    )

    with_gopher_quality(df).agg(
        F.round(F.avg(F.col("gopher_pass").cast("double")), 3).alias("gopher_pass_rate")
    ).show()
    with_c4_quality(df).agg(
        F.round(F.avg(F.col("c4_pass").cast("double")), 3).alias("c4_pass_rate")
    ).show()

    print("=== unigram surprisal distribution (LM-quality signal) ===")
    from llm_training_data_pipeline_spark.operators.corpus import unigram_surprisal

    unigram_surprisal(df, id_col="doc_id" if "doc_id" in df.columns else df.columns[0]).select(
        F.expr("percentile(avg_surprisal, array(0.1, 0.5, 0.9))").alias("p10_p50_p90")
    ).show(truncate=False)


if __name__ == "__main__":
    main()
