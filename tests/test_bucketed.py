"""Bucketed-table co-location and the WebDataset tar sink."""

from __future__ import annotations

import hashlib
import os
import tarfile

from llm_training_data_pipeline_spark.schemas import load_table
from llm_training_data_pipeline_spark.sources import sinks
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "source")
    emb = load_table(spark, "embeddings", SF_DIR).select(
        "vec_id", "label"
    ).withColumnRenamed("vec_id", "doc_id")
    sinks.write_bucketed(docs, "t_docs_b", "doc_id", n_buckets=8, sort_col="doc_id")
    sinks.write_bucketed(emb, "t_emb_b", "doc_id", n_buckets=8, sort_col="doc_id")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_docs_b").join(spark.table("t_emb_b"), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # same bucketing on both sides: the sort-merge join reads
        # co-located buckets with NO shuffle on either side
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
        spark.sql("DROP TABLE IF EXISTS t_emb_b")


def test_webdataset_shards_deterministic_and_complete(spark, tmp_path):
    docs = load_table(spark, "documents", SF_DIR).filter("doc_id < 50")
    out1 = os.path.join(str(tmp_path), "wds1")
    out2 = os.path.join(str(tmp_path), "wds2")
    shards1 = sinks.write_webdataset(docs, out1, n_shards=4)
    shards2 = sinks.write_webdataset(docs, out2, n_shards=4)
    assert [os.path.basename(p) for p in shards1] == [
        os.path.basename(p) for p in shards2
    ]
    # every document lands exactly once, content round-trips
    want = {str(r.doc_id): r.text for r in docs.collect()}
    got = {}
    for p in shards1:
        with tarfile.open(p) as tf:
            for m in tf.getmembers():
                got[m.name.removesuffix(".txt")] = (
                    tf.extractfile(m).read().decode("utf-8")
                )
    assert got == want
    # byte-identical across runs (mtime pinned, members sorted,
    # hash-partitioned shard assignment)
    h1 = [hashlib.md5(open(p, "rb").read()).hexdigest() for p in shards1]
    h2 = [hashlib.md5(open(p, "rb").read()).hexdigest() for p in shards2]
    assert h1 == h2


def test_webdataset_binary_payload_members(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, "caption zero", bytearray(b"\x89PNG\r\n fake")),
         (1, "caption one", bytearray(b"RIFF fake wav")),
         (2, "text only", None)],
        "doc_id long, text string, payload binary",
    )
    out = os.path.join(str(tmp_path), "wds_bin")
    shards = sinks.write_webdataset(
        df, out, n_shards=2, payload_col="payload", payload_ext="png"
    )
    members = {}
    for p in shards:
        with tarfile.open(p) as tf:
            for m in tf.getmembers():
                members[m.name] = tf.extractfile(m).read()
    assert members["0.txt"] == b"caption zero"
    assert members["0.png"] == b"\x89PNG\r\n fake"
    assert members["1.png"] == b"RIFF fake wav"
    assert "2.png" not in members  # null payload -> text member only
    assert members["2.txt"] == b"text only"


def test_webdataset_manifest_checks_out(spark, tmp_path):
    import hashlib
    import json

    docs = load_table(spark, "documents", SF_DIR).filter("doc_id < 30")
    out = os.path.join(str(tmp_path), "wds_m")
    shards = sinks.write_webdataset(docs, out, n_shards=3)
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert [e["shard"] for e in man["shards"]] == [
        os.path.basename(p) for p in shards
    ]
    total_members = 0
    for e, p in zip(man["shards"], shards):
        assert e["md5"] == hashlib.md5(open(p, "rb").read()).hexdigest()
        assert e["bytes"] == os.path.getsize(p)
        total_members += e["members"]
    assert total_members == 30
