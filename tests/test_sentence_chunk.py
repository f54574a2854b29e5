"""Sentence split + sentence-aligned chunking pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.functions.text import sentence_split
from llm_training_data_pipeline_spark.operators.corpus import (
    sentence_chunk_documents,
)


def test_sentence_split_basic(spark):
    df = spark.createDataFrame(
        [("One two. Three four! Five? Six",)], "text string"
    )
    out = df.select(sentence_split("text").alias("s")).collect()[0]["s"]
    assert out == ["One two.", "Three four!", "Five?", "Six"]


def test_sentence_split_no_trailing_ws_no_split(spark):
    # punctuation NOT followed by whitespace does not split (e.g. "3.14")
    df = spark.createDataFrame([("pi is 3.14 exactly",)], "text string")
    out = df.select(sentence_split("text").alias("s")).collect()[0]["s"]
    assert out == ["pi is 3.14 exactly"]


def test_sentence_chunks_never_cut_mid_sentence(spark):
    sents = [f"Sentence number {i} has a fixed shape." for i in range(20)]
    df = spark.createDataFrame(
        [(1, " ".join(sents))], "doc_id long, text string"
    )
    out = sentence_chunk_documents(df, chunk_chars=100).collect()
    all_sents = set(sents)
    for r in out:
        # every chunk is a space-join of whole original sentences
        for s in r["chunk_text"].split(". "):
            pass  # structural check below is the real assertion
        rebuilt = r["chunk_text"]
        # chunk must start at a sentence start and end at a sentence end
        assert any(rebuilt.startswith(s) for s in all_sents)
        assert any(rebuilt.endswith(s) for s in all_sents)
    # chunks reconstruct the doc exactly when re-joined in chunk order
    joined = " ".join(
        r["chunk_text"] for r in sorted(out, key=lambda r: r["chunk_id"])
    )
    assert joined == " ".join(sents)


def test_sentence_chunks_chunk_ids_and_overrun(spark):
    # 3 sentences of 40 chars (joined: 40, 41+40, 82+40) with chunk 60:
    # starts 0, 41, 82 -> chunks 0, 0, 1 — chunk 0 overruns to 81 chars
    s = "x" * 39 + "."
    df = spark.createDataFrame(
        [(7, " ".join([s, s, s]))], "doc_id long, text string"
    )
    out = {
        r["chunk_id"]: (r["n_sentences"], r["chunk_len"])
        for r in sentence_chunk_documents(df, chunk_chars=60).collect()
    }
    assert out == {0: (2, 81), 1: (1, 40)}


def test_sentence_chunks_giant_sentence_skips_ids_forward(spark):
    # "Small start." (start 0) and the giant (start 13) share chunk 0;
    # "Small end." starts at 13 + 501 + 1 = 515 -> chunk 5: ids stay
    # monotone with offsets but are not contiguous past an oversized
    # sentence (documented semantics of offset//chunk_chars)
    giant = "y" * 500 + "."
    df = spark.createDataFrame(
        [(9, f"Small start. {giant} Small end.")], "doc_id long, text string"
    )
    out = {
        r["chunk_id"]: r for r in sentence_chunk_documents(df, chunk_chars=100).collect()
    }
    assert sorted(out) == [0, 5]
    assert out[0]["chunk_text"] == f"Small start. {giant}"
    assert out[0]["n_sentences"] == 2
    assert out[5]["chunk_text"] == "Small end."


def test_sentence_chunks_roundtrip_property(spark):
    """Property: for any doc whose sentences were joined by single
    spaces, re-joining the chunks in chunk-id order reconstructs the
    document byte-for-byte (no sentence lost, duplicated, or cut) — 40
    seeded random corpora across chunk sizes."""
    import random

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "x1", "Y", "zz"]
    rows = []
    for d in range(40):
        sents = []
        for _ in range(rng.randrange(1, 12)):
            body = " ".join(rng.choice(words) for _ in range(rng.randrange(1, 9)))
            sents.append(body + rng.choice([".", "!", "?"]))
        rows.append((d, " ".join(sents)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunk_chars = rng.choice([30, 80, 200])
    out = sentence_chunk_documents(df, chunk_chars=chunk_chars).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, text in rows:
        got = " ".join(
            r["chunk_text"]
            for r in sorted(by_doc[d], key=lambda r: r["chunk_id"])
        )
        assert got == text, (d, got, text)
