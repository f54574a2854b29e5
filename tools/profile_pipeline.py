"""Segment-level profile of a composed registry query (default:
pipeline_e2e_full): times every eager action the builder runs
(localCheckpoint, count) in build order plus the final noop write, and
runs the query TWICE in one session so cold (janino/JIT compile) and
warm (data) cost separate — the r15 probe that attributed 53-57s of the
sf1 e2e run to the n-gram fold segment.

Usage: python tools/profile_pipeline.py [sf_dir] [query_name]

Implementation note: the instrumentation monkeypatches
pyspark.sql.classic.dataframe.DataFrame (Spark 4's concrete class —
patching the pyspark.sql.DataFrame ABC is silently ineffective because
the classic subclass overrides both methods). Labels come from the
deepest in-package frame on the call stack.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402

events: list[tuple[str, float]] = []

_orig_ckpt = DataFrame.localCheckpoint
_orig_count = DataFrame.count


def _caller() -> str:
    for fr in reversed(traceback.extract_stack()):
        if "llm_training_data_pipeline_spark" in fr.filename:
            return f"{os.path.basename(fr.filename)}:{fr.lineno}"
    return "?"


def _timed_ckpt(self, eager=True):
    lbl = _caller()
    t0 = time.time()
    r = _orig_ckpt(self, eager)
    events.append((f"localCheckpoint @ {lbl}", time.time() - t0))
    return r


def _timed_count(self):
    lbl = _caller()
    t0 = time.time()
    r = _orig_count(self)
    events.append((f"count @ {lbl}", time.time() - t0))
    return r


DataFrame.localCheckpoint = _timed_ckpt
DataFrame.count = _timed_count

from llm_training_data_pipeline_spark.plans.queries import registry  # noqa: E402
from llm_training_data_pipeline_spark.schemas import (  # noqa: E402
    TABLE_NAMES,
    load_table,
)
from llm_training_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    name = sys.argv[2] if len(sys.argv) > 2 else "pipeline_e2e_full"
    spark = get_spark(app_name="profile-pipeline")
    spark.range(1000).count()
    for t in TABLE_NAMES:
        try:
            load_table(spark, t, sf_dir).count()
        except Exception:
            pass

    fn, _sql = registry()[name]
    for rnd in (1, 2):
        events.clear()
        t_all0 = time.time()
        df = fn(spark, sf_dir)
        build_s = time.time() - t_all0
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        final_s = time.time() - t0
        total = time.time() - t_all0
        label = "cold" if rnd == 1 else "warm"
        print(f"\n=== run {rnd} ({label}) {name} @ {sf_dir} ===")
        for lbl, s in events:
            print(f"{s:8.2f}s  {lbl}")
        print(f"{final_s:8.2f}s  FINAL noop write")
        print(f"{build_s:8.2f}s  build total (incl. eager actions)")
        print(f"{total:8.2f}s  TOTAL")


if __name__ == "__main__":
    main()
