"""Output sinks (SURVEY.md §2.1 S6-S10).

Reference: /root/reference/src/main.py:353-420 — pandas→parquet, JSONL,
tokens JSONL, JSON summary. Spark-first: distributed ``df.write`` (each
format writes in parallel, one file per partition; at 100 TB this is the
only possible shape). The summary sink stays a driver-side json.dump of
collected aggregates, as in the reference.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUTPUT_COLUMNS = ["id", "title", "text", "token_count"]  # main.py:374-381


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """S6: snappy parquet (Spark default codec is snappy, as the reference
    requests explicitly). ``partition_by`` produces hive-style directory
    partitioning — the layout that makes downstream partition pruning free
    at corpus scale (e.g. partition by lang or source)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7: one JSON object per line; Spark's json sink IS jsonl."""
    df.write.mode(mode).json(path)


def write_tokens_jsonl(df: DataFrame, path: str, tokens_col: str = "tokens", mode: str = "overwrite") -> None:
    """S8: {"tokens": [...]} per document (main.py:401-405)."""
    df.select(F.col(tokens_col).alias("tokens")).write.mode(mode).json(path)


def write_summary(summary: dict, path: str) -> None:
    """S9: JSON summary of collected aggregates (main.py:407-420)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(summary, f, indent=2, default=str)


def read_pipeline_output(spark, path: str) -> DataFrame:
    """S11: read the pipeline's parquet output back for analysis."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (``bucketBy`` + ``saveAsTable``): the
    co-location layout for repeated joins/aggregations on one key.
    Two tables bucketed on the same key with the same bucket count
    equi-join WITHOUT a shuffle — at 100 TB, pre-bucketing the
    documents and embeddings tables turns every doc_id-keyed join in
    the curation suite from an Exchange into a local zip. The
    exchange-free plan is pinned in tests/test_bucketed.py.

    ``saveAsTable`` is required (plain ``.parquet(path)`` drops bucket
    metadata); the table lands in the session's warehouse dir.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str | None = None,
    n_shards: int = 16,
    payload_col: str | None = None,
    payload_ext: str = "bin",
) -> list[str]:
    """WebDataset-style tar shards: the public tar-of-samples layout
    multimodal training loaders stream (one ``{key}.txt`` member per
    document; binary columns would add ``{key}.{ext}`` members). Each
    Spark partition writes ONE tar via stdlib ``tarfile`` inside
    ``foreachPartition`` — embarrassingly parallel, no driver
    collection; determinism comes from repartitioning on the shard id
    (``xxhash64(key) pmod n_shards`` unless ``shard_col`` names a
    precomputed assignment, e.g. corpus.shard_assignment's size-balanced
    plan) and sorting members within the shard.

    Returns the shard paths (deterministic names, ``shard-%05d.tar``).
    """
    import io
    import tarfile

    os.makedirs(path, exist_ok=True)
    sid = (
        F.col(shard_col)
        if shard_col
        else F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    ).cast("int")
    cols = [
        sid.alias("_shard"),
        F.col(key_col).cast("string").alias("_key"),
        F.col(text_col).alias("_text"),
    ]
    if payload_col is not None:
        # opaque binary sample member ({key}.{ext}) next to the text —
        # the image/audio WebDataset shape; payload bytes pass through
        # untouched
        cols.append(F.col(payload_col).alias("_payload"))
    slim = (
        df.select(*cols)
        .repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "_key")
    )

    def _write(rows) -> None:
        tars: dict[int, tarfile.TarFile] = {}
        try:
            for r in rows:
                tf = tars.get(r["_shard"])
                if tf is None:
                    tf = tarfile.open(
                        os.path.join(path, f"shard-{r['_shard']:05d}.tar"), "w"
                    )
                    tars[r["_shard"]] = tf
                members = [(f"{r['_key']}.txt", (r["_text"] or "").encode("utf-8"))]
                if payload_col is not None and r["_payload"] is not None:
                    members.append(
                        (f"{r['_key']}.{payload_ext}", bytes(r["_payload"]))
                    )
                for name, data in members:
                    info = tarfile.TarInfo(name=name)
                    info.size = len(data)
                    info.mtime = 0  # deterministic archives
                    tf.addfile(info, io.BytesIO(data))
        finally:
            for tf in tars.values():
                tf.close()

    slim.foreachPartition(_write)
    shards = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".tar")
    )
    _write_shard_manifest(path, shards)
    return shards


def _write_shard_manifest(path: str, shards: list[str]) -> None:
    """manifest.json next to the shards: per-shard md5 + byte size +
    member count — the integrity record a training loader (or a resume
    after partial upload) checks before streaming 100 TB of tars."""
    import hashlib
    import tarfile

    entries = []
    for p in shards:
        h = hashlib.md5()
        with open(p, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        with tarfile.open(p) as tf:
            n = len(tf.getmembers())
        entries.append(
            {
                "shard": os.path.basename(p),
                "md5": h.hexdigest(),
                "bytes": os.path.getsize(p),
                "members": n,
            }
        )
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump({"shards": entries}, f, indent=2)
