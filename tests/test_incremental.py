"""Incremental file-manifest ingestion: anti-join work lists, commits."""

from __future__ import annotations

import os

from llm_training_data_pipeline_spark.sources import incremental


def _touch(d, name, content):
    p = os.path.join(str(d), name)
    with open(p, "w") as f:
        f.write(content)
    return p


def test_first_run_sees_everything_then_nothing(spark, tmp_path):
    src = tmp_path / "in"
    os.makedirs(src)
    _touch(src, "a.jsonl", "one\n")
    _touch(src, "b.jsonl", "two two\n")
    man = os.path.join(str(tmp_path), "manifest")

    work = incremental.new_files(spark, str(src), man, "*.jsonl")
    assert work.count() == 2
    incremental.commit_manifest(spark, man, work, epoch=0)
    assert incremental.new_files(spark, str(src), man, "*.jsonl").count() == 0


def test_only_new_and_resized_files_requalify(spark, tmp_path):
    src = tmp_path / "in"
    os.makedirs(src)
    _touch(src, "a.jsonl", "one\n")
    man = os.path.join(str(tmp_path), "manifest")
    incremental.commit_manifest(
        spark, man, incremental.new_files(spark, str(src), man, "*.jsonl"), epoch=0
    )

    _touch(src, "b.jsonl", "fresh\n")  # new file
    _touch(src, "a.jsonl", "one but longer now\n")  # same path, new size
    work = incremental.new_files(spark, str(src), man, "*.jsonl")
    got = sorted(os.path.basename(r.path) for r in work.collect())
    assert got == ["a.jsonl", "b.jsonl"]

    incremental.commit_manifest(spark, man, work, epoch=1)
    assert incremental.new_files(spark, str(src), man, "*.jsonl").count() == 0
    # epochs are append-only partitions — both survive
    eps = {
        r.epoch
        for r in spark.read.parquet(man).select("epoch").distinct().collect()
    }
    assert eps == {0, 1}


def test_crash_before_commit_reprocesses(spark, tmp_path):
    src = tmp_path / "in"
    os.makedirs(src)
    _touch(src, "a.jsonl", "one\n")
    man = os.path.join(str(tmp_path), "manifest")
    # run 1 lists but never commits (simulated crash)
    assert incremental.new_files(spark, str(src), man, "*.jsonl").count() == 1
    # run 2 sees the same work — at-least-once, never skipped
    assert incremental.new_files(spark, str(src), man, "*.jsonl").count() == 1
