"""Streaming deduplication + event-time analytics (SURVEY.md §2.3 D6, §2.7).

Reference: ``deduplicate_stream`` (/root/reference/src/processing/
deduplicator.py:224-260) is a Python generator probing an ever-growing
in-memory index — unbounded state, single process. The Structured Streaming
re-expression fixes both:

- ``streaming_exact_dedup``  — content-hash dedup with
  ``dropDuplicatesWithinWatermark``: state is bounded by the watermark TTL
  (a deliberate, documented improvement over the reference's unbounded
  ``self.documents``), distributed by hash partitioning.
- ``streaming_minhash_dedup`` — near-dup via ``applyInPandasWithState``
  keyed by LSH band bucket: each bucket holds the signatures seen in that
  bucket; a doc is emitted only if no bucket already contains a
  near-matching signature. State TTL via processing-time timeout.
- ``windowed_event_counts``  — tumbling/sliding watermark windows over the
  events stream (late data beyond the watermark is dropped).

All operators take/return streaming DataFrames, so sources (kafka, file,
rate) and sinks compose freely.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from llm_training_data_pipeline_spark.operators.dedup import MinHashConfig, exact_hash


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """D6 exact variant: first row per normalized-text hash wins; state for a
    hash is dropped once the watermark passes it."""
    return (
        stream.withColumn("_h", exact_hash(F.col(text_col)))
        .withWatermark(event_time_col, watermark)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_h")
    )


_COPY_STATE_SCHEMA = StructType([StructField("n", LongType())])


def streaming_copy_number(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Online soft dedup (the streaming analog of
    ``dedup.exact_soft_dedup_weights``): EVERY arrival is emitted,
    annotated with ``copy_number`` k — how many occurrences of its
    content digest have arrived so far, within-batch ties broken by id —
    and ``soft_weight_ppm = 1e6 div k``. Downstream keeps k == 1 for hard
    dedup semantics, or samples by weight to flatten duplicate mass
    without ever dropping data at ingest (the decision is deferred to the
    consumer, which a drop-at-ingest operator forecloses).

    Unlike the batch weight (1/n over the FINAL group size, unknowable
    mid-stream), 1/k is the anytime-consistent choice: the running sum
    over a group is the harmonic number H(k), monotone and
    order-insensitive given the id tiebreak. The single-batch replay
    equals the batch ``row_number() OVER (PARTITION BY digest ORDER BY
    id)`` exactly (pinned in tests).

    State per digest is ONE long; ``state_ttl_ms`` bounds it with a
    processing-time timeout (same contract as
    ``streaming_minhash_dedup``: leave None for bounded test runs so
    ``processAllAvailable`` can quiesce).
    """
    out_schema = StructType(
        [
            StructField("h", StringType()),
            StructField(id_col, LongType()),
            StructField("copy_number", LongType()),
            StructField("soft_weight_ppm", LongType()),
        ]
    )

    def count_copies(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (n,) = state.get if state.exists else (0,)
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(id_col)
            ks = [n + 1 + i for i in range(len(pdf))]
            n += len(pdf)
            yield pd.DataFrame(
                {
                    "h": [key[0]] * len(pdf),
                    id_col: pdf[id_col].to_numpy(),
                    "copy_number": ks,
                    "soft_weight_ppm": [1_000_000 // k for k in ks],
                }
            )
        state.update((int(n),))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)

    keyed = stream.select(
        exact_hash(F.col(text_col)).alias("_h"), F.col(id_col)
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("_h").applyInPandasWithState(
        count_copies,
        outputStructType=out_schema,
        stateStructType=_COPY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


# the stored signature matrix is ONE little-endian int64 buffer, not a
# nested ARRAY<ARRAY<BIGINT>>: state round-trips every micro-batch for
# every touched bucket-group, and the flat buffer avoids per-int boxing
# and shrinks the state store rows. Throughput at the micro-bench scale
# is unchanged (per-group Python dispatch dominates —
# tools/stream_bench.py); the win is state size, which is what grows
# with corpus, not with batch.
_NEARDUP_STATE_SCHEMA = StructType([StructField("sigs", BinaryType())])


def _make_neardup_fn(threshold: float, num_perm: int, state_ttl_ms: int | None):
    def dedup_bucket(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.hasTimedOut:
            state.remove()
            return
        (seen,) = state.get if state.exists else (b"",)
        seen_mat = np.frombuffer(seen or b"", dtype="<i8").reshape(-1, num_perm)
        out_ids: list[int] = []
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            sig_mat = np.array(
                [list(s) for s in pdf["minhash_sig"]], dtype=np.int64
            ).reshape(-1, num_perm)
            ids = pdf["doc_id"].to_numpy()
            # phase 1 screens the batch against stored state in one
            # matrix op; phase 2 resolves within-batch near-dups in
            # arrival order (shared kernel with the sharded layout)
            accepted, seen_mat = _accept_greedy(
                seen_mat, sig_mat, ids, threshold
            )
            out_ids.extend(accepted)
        state.update((np.ascontiguousarray(seen_mat, dtype="<i8").tobytes(),))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)  # TTL bounds state size
        yield pd.DataFrame({"bucket": [key[0]] * len(out_ids), "doc_id": out_ids})

    return dedup_bucket


def _accept_greedy(seen_mat, sig_mat, ids, threshold: float):
    """Shared first-seen-per-bucket kernel: phase 1 screens the batch
    against the stored signatures in one matrix op, phase 2 resolves
    within-batch near-dups among the survivors in arrival order. Returns
    (accepted ids, updated seen matrix) — identical semantics for the
    per-bucket and sharded state layouts."""
    import numpy as np

    out_ids: list[int] = []
    if seen_mat.shape[0]:
        sims = (
            (sig_mat[:, None, :] == seen_mat[None, :, :])
            .mean(axis=2)
            .max(axis=1)
        )
        survivors = np.flatnonzero(sims < threshold)
    else:
        survivors = np.arange(sig_mat.shape[0])
    new_rows: list = []
    for i in survivors:
        sig = sig_mat[i]
        if new_rows and (
            (np.stack(new_rows) == sig).mean(axis=1).max() >= threshold
        ):
            continue
        new_rows.append(sig)
        out_ids.append(int(ids[i]))
    if new_rows:
        seen_mat = np.concatenate([seen_mat, np.stack(new_rows)])
    return out_ids, seen_mat


def _encode_shard(store: dict, num_perm: int) -> bytes:
    """{bucket: (n, num_perm) int64 matrix} → flat little-endian int64
    blob: [n_buckets, (bucket, n_rows, rows...)*]."""
    import numpy as np

    parts = [np.array([len(store)], dtype="<i8")]
    for b, mat in store.items():
        parts.append(np.array([b, mat.shape[0]], dtype="<i8"))
        parts.append(np.ascontiguousarray(mat, dtype="<i8").ravel())
    return np.concatenate(parts).tobytes()


def _decode_shard(buf: bytes, num_perm: int) -> dict:
    import numpy as np

    arr = np.frombuffer(buf or b"", dtype="<i8")
    if not arr.size:
        return {}
    out: dict = {}
    pos = 1
    for _ in range(int(arr[0])):
        b, rows = int(arr[pos]), int(arr[pos + 1])
        pos += 2
        out[b] = arr[pos : pos + rows * num_perm].reshape(rows, num_perm)
        pos += rows * num_perm
    return out


def _make_sharded_neardup_fn(
    threshold: float, num_perm: int, state_ttl_ms: int | None
):
    """Sharded state layout (r12, VERDICT r10 ask #8 / r11 next #7): the
    per-bucket layout dispatches ONE Python call + state get/put PER
    BAND BUCKET — ~n_docs x num_bands tiny groups per micro-batch, and
    that dispatch (not signature compute) bounds throughput (~280
    rows/s at sf0.1). Keying the state by ``bucket % n_shards`` instead
    packs ~U/n_shards buckets into one blob, so a micro-batch pays
    n_shards Python crossings instead of tens of thousands, while the
    per-bucket greedy semantics (``_accept_greedy``) are unchanged."""

    def dedup_shard(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.hasTimedOut:
            state.remove()
            return
        (blob,) = state.get if state.exists else (b"",)
        store = _decode_shard(blob, num_perm)
        out_buckets: list[int] = []
        out_ids: list[int] = []
        empty = np.empty((0, num_perm), dtype=np.int64)
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            sig_mat = np.array(
                [list(s) for s in pdf["minhash_sig"]], dtype=np.int64
            ).reshape(-1, num_perm)
            ids = pdf["doc_id"].to_numpy()
            # first-appearance bucket order == arrival order per bucket
            for b, idx in pdf.groupby("bucket", sort=False).indices.items():
                b = int(b)
                accepted, store[b] = _accept_greedy(
                    store.get(b, empty), sig_mat[idx], ids[idx], threshold
                )
                out_buckets.extend([b] * len(accepted))
                out_ids.extend(accepted)
        state.update((_encode_shard(store, num_perm),))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame({"bucket": out_buckets, "doc_id": out_ids})

    return dedup_shard


def _banded_stream(
    stream: DataFrame, text_col: str, id_col: str, cfg: MinHashConfig
) -> DataFrame:
    """Shared prep for the stateful near-dup variants: normalize once
    (staged — char_shingles over a raw column re-runs the
    lowercase+collapse regex per gram inside the HOF lambda, r9),
    HOF-path minhash signature, explode to (id, sig, band bucket).

    Contract: the id column is ALWAYS emitted as ``doc_id`` regardless of
    ``id_col`` — the stateful processors downstream (GroupState and
    transformWithState variants) key on that fixed name, and the public
    acceptance schema is ``(bucket, doc_id)`` (ADVICE r13: a custom
    ``id_col`` used to KeyError inside the processor)."""
    from llm_training_data_pipeline_spark.functions.hashing import lsh_bands, minhash_signature
    from llm_training_data_pipeline_spark.functions.text import char_shingles

    sig = stream.withColumn(
        "_norm", F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    ).withColumn(
        "minhash_sig",
        minhash_signature(
            char_shingles(F.col("_norm"), cfg.shingle_size, pre_normalized=True),
            cfg.num_perm,
        ),
    ).drop("_norm")
    return sig.select(
        F.col(id_col).alias("doc_id"),
        F.col("minhash_sig"),
        F.explode(lsh_bands(F.col("minhash_sig"), cfg.num_bands, cfg.rows_per_band)).alias("band"),
    ).select(
        F.col("doc_id"),
        F.col("minhash_sig"),
        F.xxhash64(F.col("band.band_id"), F.col("band.band_sig")).alias("bucket"),
    )


def streaming_minhash_dedup(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: MinHashConfig = MinHashConfig(num_perm=32, num_bands=8),
    state_ttl_ms: int | None = None,
    state_shards: int | None = None,
) -> DataFrame:
    """D6 near-dup variant: stateful per-band-bucket signature index.

    ``state_ttl_ms`` enables a processing-time TTL that evicts idle bucket
    state (the fix for the reference's unbounded index). Leave None for
    bounded test runs: a registered processing-time timeout keeps the
    micro-batch engine scheduling work, so ``processAllAvailable`` would
    never quiesce.

    Emits (bucket, doc_id) of accepted docs; a doc accepted in EVERY one of
    its band buckets is globally unique (first-seen semantics per bucket,
    matching the reference's incremental ``is_duplicate`` probe,
    deduplicator.py:150-180). Downstream can aggregate acceptances; the
    common pattern is to treat acceptance in all bands as "insert".

    Note: ``minhash_signatures`` is aggregation-based and not streamable, so the
    signature here is computed with the HOF expression path on the (small)
    per-microbatch data — acceptable because each microbatch is bounded.

    ``state_shards`` (r12): key the state store by ``bucket % state_shards``
    instead of by bucket. The per-bucket layout pays one Python dispatch +
    state get/put per (doc, band) GROUP — tens of thousands of tiny groups
    per micro-batch, and that dispatch (not signature compute) is the
    measured throughput bound (tools/stream_bench.py). Sharding packs many
    buckets into one state blob: ``state_shards`` crossings per micro-batch,
    identical per-bucket greedy semantics (the shared ``_accept_greedy``
    kernel; pinned stream==batch in tests). Size it ~2-4x the executor
    cores at scale — each shard's state must fit one task's memory.
    """
    banded = _banded_stream(stream, text_col, id_col, cfg)
    out_schema = StructType(
        [StructField("bucket", LongType()), StructField("doc_id", LongType())]
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    if state_shards is not None:
        if state_shards < 1:
            raise ValueError(f"state_shards must be >= 1: {state_shards}")
        return (
            banded.withColumn(
                "_shard", F.pmod(F.col("bucket"), F.lit(state_shards))
            )
            .groupBy("_shard")
            .applyInPandasWithState(
                _make_sharded_neardup_fn(
                    cfg.threshold, cfg.num_perm, state_ttl_ms
                ),
                outputStructType=out_schema,
                stateStructType=_NEARDUP_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=timeout_conf,
            )
        )
    return banded.groupBy("bucket").applyInPandasWithState(
        _make_neardup_fn(cfg.threshold, cfg.num_perm, state_ttl_ms),
        outputStructType=out_schema,
        stateStructType=_NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def accepted_in_all_bands(
    acceptances: DataFrame,
    num_bands: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Collapse ``streaming_minhash_dedup`` per-band acceptances to unique docs.

    ``streaming_minhash_dedup`` emits one (bucket, doc_id) row per band bucket
    that accepted the doc — a near-duplicate still appears in the buckets
    where it does NOT collide with its twin. A doc is globally unique only
    when accepted in ALL ``num_bands`` of its buckets (first-seen semantics
    per bucket). This helper performs that aggregation; apply it per
    micro-batch (``foreachBatch``) or over the collected sink table — a
    post-state streaming aggregate would need its own output-mode handling.

    Each (doc, band) pair emits at most one acceptance row and the bucket id
    hashes (band_id, band_sig), so a plain count equals the band count.
    """
    return (
        acceptances.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_n_accepted"))
        .filter(F.col("_n_accepted") == num_bands)
        .select(id_col)
    )


def incremental_minhash_dedup_batch(
    batch: DataFrame,
    history_banded: DataFrame | None,
    cfg: MinHashConfig = MinHashConfig(num_perm=32, num_bands=8),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One all-JVM incremental near-dup step: the batch docs that survive
    (a) an LSH probe against the accepted-history banded signature table
    and (b) min-id near-dup dedup within the batch itself.

    Returns the accepted rows with their ``minhash_sig`` column attached
    (callers strip it or band-explode it into the history table). Every
    operation is a DataFrame expression — signature via the streamable
    HOF path (bit-identical to the batch aggregation path, pinned),
    bucket join against history, est-Jaccard verify, band self-join
    within the batch. No Python crossing at all: this is the JVM
    replacement for the ``applyInPandasWithState`` per-bucket probe,
    whose per-group Python round-trip floors throughput at ~10² rows/s
    (r6 verdict watch item #3).

    Semantics: with ``history_banded=None`` and the whole corpus in one
    batch, the accepted set is EXACTLY ``dedup.minhash_dedup`` (min-id
    winner per verified pair — pinned in tests). Across batches a doc is
    rejected iff a verified near-match exists among (earlier-batch
    accepted docs) ∪ (smaller-id docs of its own batch) — history rows
    act as always-smaller rivals (the reference's incremental
    ``is_duplicate`` probe order, deduplicator.py:150-180, at batch
    granularity), so ONE bucket join decides both rejection sources.

    Because ``foreachBatch`` hands us a plain batch DataFrame, the
    signature pass uses the AGGREGATION path (hash distinct shingles
    only — bit-identical to the streamable HOF expression, pinned, but
    ~700× less hashing on duplicate-heavy text) and is materialized
    once with ``localCheckpoint``: the band explode (both join sides)
    and the final anti-join all reference it, and an unmaterialized
    plan would re-run the signature pass per branch (the measured ~3×
    that floored the first cut of this operator). No ``distinct`` on
    the loser side — the anti-join is duplicate-insensitive, and the
    removed exchange is one fewer stage on the per-micro-batch floor.
    """
    from llm_training_data_pipeline_spark.functions.hashing import (
        lsh_bands,
        signature_jaccard,
    )
    from llm_training_data_pipeline_spark.operators import dedup as _dedup

    sig = _dedup.minhash_signatures(
        batch.select(id_col, text_col), text_col, id_col, cfg
    ).localCheckpoint(eager=True)
    banded = sig.select(
        F.col(id_col),
        F.col("minhash_sig"),
        F.explode(
            lsh_bands(F.col("minhash_sig"), cfg.num_bands, cfg.rows_per_band)
        ).alias("band"),
    ).select(
        F.col(id_col),
        F.col("minhash_sig"),
        F.xxhash64(F.col("band.band_id"), F.col("band.band_sig")).alias("bucket"),
    )
    # rivals = smaller-id batch docs ∪ history. History rows keep their
    # TRUE id plus a _hist flag: a history rival beats every batch doc
    # EXCEPT the doc itself (same id) — the self-exclusion that makes an
    # epoch replay against a warm store already containing the replayed
    # epoch idempotent (each previously-accepted doc used to match its
    # own stored signature under the old always-smaller id −1 encoding
    # and be rejected, erasing the epoch's signatures; ADVICE r7)
    rivals = banded.withColumn("_hist", F.lit(False))
    if history_banded is not None:
        rivals = rivals.union(
            history_banded.select(id_col, "minhash_sig", "bucket").withColumn(
                "_hist", F.lit(True)
            )
        )
    losers = (
        banded.alias("a")
        .join(rivals.alias("r"), on="bucket")
        .filter(
            (F.col("r._hist") & (F.col(f"r.{id_col}") != F.col(f"a.{id_col}")))
            | (~F.col("r._hist") & (F.col(f"r.{id_col}") < F.col(f"a.{id_col}")))
        )
        .filter(
            signature_jaccard(F.col("a.minhash_sig"), F.col("r.minhash_sig"))
            >= F.lit(cfg.threshold)
        )
        .select(F.col(f"a.{id_col}").alias(id_col))
    )
    accepted_sig = sig.join(losers, on=id_col, how="left_anti")
    # re-attach the batch's other columns (sig carried only id + text)
    return batch.join(accepted_sig.drop(text_col), on=id_col)


def banded_signatures(
    accepted_sig: DataFrame,
    cfg: MinHashConfig,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, minhash_sig, bucket) band explosion of an accepted-signature
    table — the history-store row shape of the incremental deduper."""
    from llm_training_data_pipeline_spark.functions.hashing import lsh_bands

    return accepted_sig.select(
        F.col(id_col),
        F.col("minhash_sig"),
        F.explode(
            lsh_bands(F.col("minhash_sig"), cfg.num_bands, cfg.rows_per_band)
        ).alias("band"),
    ).select(
        F.col(id_col),
        F.col("minhash_sig"),
        F.xxhash64(F.col("band.band_id"), F.col("band.band_sig")).alias("bucket"),
    )


def streaming_minhash_dedup_incremental(
    stream: DataFrame,
    *,
    state_dir: str,
    sink,
    cfg: MinHashConfig = MinHashConfig(num_perm=32, num_bands=8),
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """D6 near-dup on the ``foreachBatch`` + signature-store design: the
    production-throughput alternative to ``streaming_minhash_dedup``.

    Every micro-batch runs ``incremental_minhash_dedup_batch`` (all-JVM)
    against the accumulated banded-signature history, then appends its
    accepted signatures to the history — in memory as localCheckpointed
    per-epoch frames (no re-materialization of old epochs), durably as
    an ``epoch=N`` parquet partition under ``state_dir`` (idempotent on
    epoch replay: the probe self-excludes same-id history rows, so a
    replayed batch re-accepts exactly its prior accepted set and the
    rewritten partition keeps the signatures; corollary — a NEW doc
    reusing an accepted id is treated as an update of that doc, never
    a duplicate of it. A restart warm-starts from whatever partitions
    exist). ``sink(accepted_df,
    epoch_id)`` receives each batch's accepted rows (original columns).

    Why this beats the stateful-operator variant ~10-40×: per-bucket
    ``applyInPandasWithState`` pays a Python round-trip per touched
    bucket-group (~40k singleton groups at bench scale); here the per-
    batch cost is a handful of JVM joins whose width is (id, bucket,
    sig). The trade: acceptance is decided at batch granularity (the
    within-batch rule is min-id, not arrival order) and the history
    lives in a signature store rather than operator state — at 100 TB
    that store is exactly ``persist_minhash_signatures``'s bucketed
    table, so the streaming and batch paths share one artifact.

    Returns the configured ``DataStreamWriter`` — caller adds options
    and ``.start()``.
    """
    import os

    spark = stream.sparkSession
    # the store holds UNBANDED (id, minhash_sig) rows — 1 row/doc, not
    # num_bands rows/doc; the probe bands it lazily (cheap lineage over
    # already-materialized epochs), so store size and write volume stay
    # 8× slimmer with an identical probe plan
    epochs: list[DataFrame] = []
    if os.path.isdir(state_dir) and any(
        e.name.startswith("epoch=") for e in os.scandir(state_dir)
    ):
        warm = spark.read.parquet(state_dir).select(id_col, "minhash_sig")
        epochs.append(warm.localCheckpoint(eager=True))

    def _history() -> DataFrame | None:
        if not epochs:
            return None
        hist = epochs[0]
        for e in epochs[1:]:
            hist = hist.union(e)
        return banded_signatures(hist, cfg, id_col)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        # ONE action per batch: the epoch parquet write materializes the
        # whole accept decision (accepted rows + signatures); history and
        # the sink both read the written file back, so there is no
        # localCheckpoint job and no recomputation. Micro-batches are
        # small by definition, so the per-batch shuffles are scoped down
        # to a handful of partitions — stage/task latency, not data, is
        # the per-trigger floor (measured: 8 tiny shuffle tasks cost
        # more wall-clock than 2 on a 625-doc batch).
        sess = batch_df.sparkSession
        prev = sess.conf.get("spark.sql.shuffle.partitions")
        sess.conf.set("spark.sql.shuffle.partitions", "2")
        try:
            accepted_sig = incremental_minhash_dedup_batch(
                batch_df, _history(), cfg, text_col, id_col
            )
            epoch_path = os.path.join(state_dir, f"epoch={epoch_id}")
            accepted_sig.write.mode("overwrite").parquet(epoch_path)
        finally:
            sess.conf.set("spark.sql.shuffle.partitions", prev)
        written = sess.read.parquet(epoch_path)
        epochs.append(written.select(id_col, "minhash_sig"))
        sink(written.drop("minhash_sig"), epoch_id)

    return stream.writeStream.foreachBatch(handle)


def windowed_event_counts(
    stream: DataFrame,
    event_time_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding) watermark window counts per event_type."""
    win = (
        F.window(event_time_col, window, slide)
        if slide
        else F.window(event_time_col, window)
    )
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(win.alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_window_counts(
    stream: DataFrame,
    event_time_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time session windows per event_type: a session extends while
    consecutive events arrive within ``gap``; a session closes (and is
    emitted, in append mode) once the watermark passes its end. Same
    ``F.session_window`` semantics as the oracle-green batch query
    (``session_window_events``), so the batch↔stream equivalence test
    can replay real events through both paths row-for-row."""
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(
            F.session_window(F.col(event_time_col), gap).alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_exact_dedup_tws(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """D6 exact variant on the Spark 4 ``transformWithStateInPandas`` API.

    Keyed by content digest; a ValueState flag marks digests already seen,
    so only the first arrival per digest is emitted. Functionally equivalent
    to ``streaming_exact_dedup`` but on the modern StatefulProcessor API
    (explicit state variables, TTL support, richer timers); kept alongside
    the watermark-based variant as the forward-looking implementation.

    Capability-gated: the transformWithState protocol needs
    ``google.protobuf`` (absent in this container); use
    ``streaming_exact_dedup`` / ``streaming_minhash_dedup``
    (applyInPandasWithState) where it is unavailable.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf, which is "
            "not installed here; use streaming_exact_dedup instead"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = StructType(
        [StructField("h", StringType()), StructField(id_col, LongType())]
    )

    class FirstSeenProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen", StructType([StructField("flag", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues) -> "Iterator[pd.DataFrame]":
            if self._seen.exists():
                return iter(())
            first_id = None
            for pdf in rows:
                if len(pdf):
                    cand = int(pdf[id_col].min())
                    first_id = cand if first_id is None else min(first_id, cand)
            if first_id is None:
                return iter(())
            self._seen.update((1,))
            return iter([pd.DataFrame({"h": [key[0]], id_col: [first_id]})])

        def close(self) -> None:
            pass

    hashed = stream.withColumn("_h", exact_hash(F.col(text_col))).select(
        F.col("_h"), F.col(id_col)
    )
    return hashed.groupBy("_h").transformWithStateInPandas(
        statefulProcessor=FirstSeenProcessor(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )


def _make_tws_neardup_processor(
    threshold: float, num_perm: int, state_ttl_ms: int | None
):
    """StatefulProcessor class for the transformWithState near-dup
    variant (r13, VERDICT r12 #10). Factory (not inline in the
    operator) so the processor LOGIC is unit-testable with a fake
    handle in containers where the transformWithState protocol itself
    cannot run — the accept/reject semantics are the shared
    ``_accept_greedy`` kernel, identical to the applyInPandasWithState
    paths (pinned stream==batch in tests/test_streaming.py)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class NearDupProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # per-state TTL — the SURVEY §7 risk-list ask the old
            # GroupState API only approximated with manual timeouts:
            # idle bucket state evicts automatically after
            # state_ttl_ms without a timer round-trip
            self._sigs = handle.getValueState(
                "sigs",
                StructType([StructField("seen", BinaryType())]),
                ttlDurationMs=state_ttl_ms,
            )

        def handleInputRows(
            self, key, rows, timerValues
        ) -> "Iterator[pd.DataFrame]":
            import numpy as np

            seen = self._sigs.get()[0] if self._sigs.exists() else b""
            seen_mat = np.frombuffer(seen or b"", dtype="<i8").reshape(
                -1, num_perm
            )
            out_ids: list[int] = []
            for pdf in rows:
                if not len(pdf):
                    continue
                sig_mat = np.array(
                    [list(s) for s in pdf["minhash_sig"]], dtype=np.int64
                ).reshape(-1, num_perm)
                ids = pdf["doc_id"].to_numpy()
                accepted, seen_mat = _accept_greedy(
                    seen_mat, sig_mat, ids, threshold
                )
                out_ids.extend(accepted)
            self._sigs.update(
                (np.ascontiguousarray(seen_mat, dtype="<i8").tobytes(),)
            )
            if not out_ids:
                return iter(())
            return iter(
                [
                    pd.DataFrame(
                        {
                            "bucket": [key[0]] * len(out_ids),
                            "doc_id": out_ids,
                        }
                    )
                ]
            )

        def close(self) -> None:
            pass

    return NearDupProcessor


def streaming_minhash_dedup_tws(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: MinHashConfig = MinHashConfig(num_perm=32, num_bands=8),
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """D6 near-dup variant on the Spark 4 ``transformWithStateInPandas``
    API (r13, VERDICT r12 #10): same banded-signature prep and
    first-seen-per-bucket greedy semantics as
    ``streaming_minhash_dedup`` (the shared ``_accept_greedy`` kernel),
    but state rides an explicit ValueState with NATIVE per-state TTL
    (``ttlDurationMs``) — idle bucket state evicts without the
    processing-time-timer round-trips the GroupState API needs, and
    ``processAllAvailable`` still quiesces (the old API's TTL kept the
    microbatch engine busy forever, the documented test gotcha).

    Emits (bucket, doc_id) acceptances; combine with
    ``accepted_in_all_bands`` exactly like the GroupState variant.

    Capability-gated: the transformWithState protocol needs
    ``google.protobuf`` (absent in this container); the processor LOGIC
    is still pinned against the batch analog via a fake handle in
    tests. Use ``streaming_minhash_dedup`` where protobuf is
    unavailable."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf, which is "
            "not installed here; use streaming_minhash_dedup instead"
        ) from e
    banded = _banded_stream(stream, text_col, id_col, cfg)
    out_schema = StructType(
        [StructField("bucket", LongType()), StructField("doc_id", LongType())]
    )
    return banded.groupBy("bucket").transformWithStateInPandas(
        statefulProcessor=_make_tws_neardup_processor(
            cfg.threshold, cfg.num_perm, state_ttl_ms
        )(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )
