"""SFT rendering + loss spans: the substring invariant and shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.operators import sft
from llm_training_data_pipeline_spark.schemas import load_table
from tests.conftest import SF_DIR


def _conv(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, content string"
    )


def test_spans_extract_exactly_the_assistant_content(spark):
    conv = _conv(
        spark,
        [
            (0, 0, "user", "hi there"),
            (0, 1, "assistant", "hello! how can I help?"),
            (0, 2, "user", "repeat: hello! how can I help?"),
            (0, 3, "assistant", "hello! how can I help?"),  # repeated text
            (7, 0, "user", "unicode ärger"),
            (7, 1, "assistant", "naïve café"),
        ],
    )
    text = {r.conv_id: r.text for r in sft.render_chat(conv).collect()}
    contents = {
        (r.conv_id, r.turn_idx): r.content
        for r in conv.collect()
        if r.role == "assistant"
    }
    spans = sft.assistant_loss_spans(conv).collect()
    assert len(spans) == 3
    for s in spans:
        got = text[s.conv_id][s.start_char : s.end_char]
        assert got == contents[(s.conv_id, s.turn_idx)]
    # repeated assistant content maps to DIFFERENT spans (arithmetic
    # offsets, not text search)
    offs = sorted(
        (s.start_char, s.end_char) for s in spans if s.conv_id == 0
    )
    assert offs[0] != offs[1]


def test_render_order_is_turn_idx_not_input_order(spark):
    conv = _conv(
        spark,
        [(0, 1, "assistant", "second"), (0, 0, "user", "first")],
    )
    text = sft.render_chat(conv).collect()[0].text
    assert text.index("first") < text.index("second")


def test_documents_adapter_roundtrip(spark):
    docs = load_table(spark, "documents", SF_DIR)
    conv = sft.conversations_from_documents(docs)
    rendered = sft.render_chat(conv)
    n_convs = conv.select("conv_id").distinct().count()
    assert rendered.count() == n_convs
    # every rendered string parses back to its turn count
    probe = rendered.select(
        "n_turns",
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"<\|im_start\|>", ""))
        ).alias("_marker_chars"),
    )
    bad = probe.filter(
        F.col("_marker_chars") != F.col("n_turns") * len(sft.PREFIX)
    )
    assert bad.count() == 0


def test_chat_format_report_flags_each_violation(spark):
    """One hand fixture per violation class + one fully valid (incl. a
    system opener) — each flag trips exactly where constructed."""
    from llm_training_data_pipeline_spark.operators.sft import (
        chat_format_report,
    )

    rows = [
        # 0: valid, system opener
        (0, 0, "system", "be helpful"),
        (0, 1, "user", "hi"),
        (0, 2, "assistant", "hello"),
        # 1: valid, user opener
        (1, 0, "user", "q"),
        (1, 1, "assistant", "a"),
        # 2: same-role run (user, user)
        (2, 0, "user", "q1"),
        (2, 1, "user", "q2"),
        (2, 2, "assistant", "a"),
        # 3: unknown role (also ends non-assistant)
        (3, 0, "user", "q"),
        (3, 1, "tool", "{}"),
        # 4: empty turn (whitespace only)
        (4, 0, "user", "q"),
        (4, 1, "assistant", "   "),
        # 5: bad opener (assistant first) — also a same-role run free zone
        (5, 0, "assistant", "unprompted"),
        (5, 1, "user", "?"),
    ]
    conv = spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, content string"
    )
    rep = {r["conv_id"]: r for r in chat_format_report(conv).collect()}
    assert rep[0]["valid"] is True and rep[1]["valid"] is True
    assert rep[2]["same_role_run"] is True and rep[2]["valid"] is False
    assert rep[3]["unknown_role"] is True
    assert rep[3]["no_assistant_end"] is True
    assert rep[4]["empty_turn"] is True
    assert rep[5]["bad_opener"] is True
    assert rep[5]["no_assistant_end"] is True
    # flags that must NOT trip
    assert rep[0]["same_role_run"] is False
    assert rep[2]["unknown_role"] is False
    assert rep[4]["bad_opener"] is False
