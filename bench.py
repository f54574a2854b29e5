"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds.

Usage: python bench.py  [--sf-dir DIR] [--queries name1,name2] [--repeat N]

--repeat N runs each query N times and reports the per-query MEDIAN —
machine contention polluted whole-round comparisons twice (r3 recorded a
broad ~1.9x "regression" that was a busy box); median-of-3 makes a
recorded number attributable to the plan, not the neighbor.

Each query is forced with a full materialization (count of the result —
not collect, so driver memory stays flat at any scale factor). Wall time
includes planning + execution; the session is warmed up with one trivial
job first so JVM startup isn't billed to the first query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_region_revenue",
    "top3_customers_per_nation",
    "customer_running_totals",
    "rollup_order_stats",
    "event_sessionization",
    "json_events",
    "clean_documents",
    "quality_cascade",
    "exact_dedup_stats",
    "lang_id_histogram",
    "token_counts",
    "doc_fingerprints",
    "minhash_dedup",
    "simhash_near_dup_pairs",
    "embedding_near_dup",
    "cosine_topk",
    "ann_lsh_topk",
    "asof_join_events",
    # round-2/3 heavy queries (kept after the original 20 so round-over-
    # round totals stay comparable on the shared prefix)
    "dedup_clusters",
    "unigram_surprisal",
    "minhash_pairs_md5",
    "byte_bpe_tokenize_stats",
    "session_window_events",
    "gopher_quality",
    "repetition_stats",
    # round-4 additions (again appended, preserving the shared prefix)
    "stats_moments",
    "pii_stats",
    "q9_product_profit",
    "q13_order_count_distribution",
    "q18_large_volume_customers",
    "q22_global_sales_opportunity",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=",".join(HEADLINE))
    ap.add_argument(
        "--repeat",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")),
        help="runs per query; the reported number is the median",
    )
    args = ap.parse_args()

    from llm_training_data_pipeline_spark.plans.queries import registry
    from llm_training_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.range(1000).count()  # JVM warm-up
    # touch each input table once so timings measure query execution, not
    # first-touch page-cache/footer reads
    from llm_training_data_pipeline_spark.schemas import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        try:
            load_table(spark, t, args.sf_dir).count()
        except Exception:
            pass

    reg = registry()
    names = [n for n in args.queries.split(",") if n]
    unknown = [n for n in names if n not in reg]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}; known: {sorted(reg)}")
    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import statistics

    timings: dict[str, float] = {}
    for name in names:
        fn, _sql = reg[name]
        runs: list[float] = []
        n = 0
        for _ in range(max(1, args.repeat)):
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            n = df.count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        detail = "" if len(runs) == 1 else f" runs={[round(r, 3) for r in runs]}"
        print(f"# {name}: {timings[name]:.3f}s ({n} rows){detail}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
