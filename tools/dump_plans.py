"""Dump .explain("formatted") for named registry queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag-dir-suffix> name1 name2 ...
       python tools/dump_plans.py r14 --suffix before semdedup_pairs dsir_scores

Writes plans/<tag>/<name>_<suffix>.txt (suffix defaults to "before").
Plans are captured WITHOUT executing the query (explain is plan-only), so
this is cheap and side-effect-free; queries whose builders run driver-side
actions (count/collect during plan construction) still pay those.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_training_data_pipeline_spark.plans.queries import registry  # noqa: E402
from llm_training_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", help="subdirectory under plans/, e.g. r14")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="dump-plans")
    reg = registry()
    for name in args.names:
        fn, _sql = reg[name]
        df = fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
