"""Deterministic execution-cost probe: Spark job/stage/task counts per
registry query — noise-immune structural evidence for plan changes
(box-load drift makes ±50% wall-time noise on 1-3s queries; the number
of jobs, stages and tasks a query schedules does not drift).

Usage: python tools/query_cost.py [--sf-dir DIR] name1 name2 ...

Prints one JSON line: {name: {"jobs": J, "stages": S, "tasks": T}}.
Counts cover EVERYTHING the query does — including actions its builder
runs at construction time (counts, localCheckpoints) — measured by
diffing the session-wide totals around build+execute.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_training_data_pipeline_spark.plans.queries import registry  # noqa: E402
from llm_training_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="query-cost")
    sc = spark.sparkContext
    spark.range(1000).count()  # JVM warm-up
    from llm_training_data_pipeline_spark.schemas import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        try:
            load_table(spark, t, args.sf_dir).count()
        except Exception:
            pass

    tracker = sc.statusTracker()
    reg = registry()
    out: dict[str, dict[str, int]] = {}
    for name in args.names:
        fn, _sql = reg[name]
        jobs0 = set(tracker.getJobIdsForGroup(None) or [])
        # a fresh job group isolates this query's job ids
        sc.setJobGroup(f"cost-{name}", name)
        df = fn(spark, args.sf_dir)
        df.count()
        sc.setJobGroup(None, None)
        jobs1 = set(tracker.getJobIdsForGroup(None) or [])
        # group-based lookup misses jobs whose group was reset internally;
        # fall back to all-new-job-ids via the id counter
        new_jobs = sorted(
            set(tracker.getJobIdsForGroup(f"cost-{name}") or [])
            | (jobs1 - jobs0)
        )
        stages = 0
        tasks = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    stages += 1
                    tasks += si.numTasks
        out[name] = {"jobs": len(new_jobs), "stages": stages, "tasks": tasks}
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
