"""SFT / chat-data operators: template rendering and loss-span offsets.

Instruction-tuning pipelines store conversations as (conversation,
turn, role, content) rows and need two deterministic transforms before
tokenization: render each conversation to ONE training string with role
markers, and compute the character spans of assistant turns inside that
string (the assistant-only loss mask). Both are pure string/integer
algebra — rendered text by ordered concatenation, spans by prefix sums
of rendered-turn lengths — so they replay bit-for-bit in any engine.

Template: the ChatML-style public convention
``<|im_start|>{role}\\n{content}<|im_end|>\\n`` per turn. The markers
are plan literals; swapping templates changes two constants.

Scale: everything is one hash aggregate (or one window) on the
conversation key. Rendering ships each conversation's turns to one
reducer — bounded by the longest conversation, not the corpus; spans
need no re-scan of the rendered text because offsets are arithmetic
over turn lengths (never ``instr`` over the rendered string, which
would be quadratic in turns and wrong on repeated content).

Reference: the reference pipeline is pre-training-only (no chat stage);
this extends its document model to the instruction-tuning shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

PREFIX = "<|im_start|>"
SUFFIX = "<|im_end|>\n"


def _rendered_turn(role: Column, content: Column) -> Column:
    return F.concat(
        F.lit(PREFIX), role, F.lit("\n"), content, F.lit(SUFFIX)
    )


def conversations_from_documents(
    df: DataFrame,
    turns_per_conv: int = 4,
    content_chars: int = 120,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic (conv_id, turn_idx, role, content) view over a
    documents table — consecutive ids alternate user/assistant. A
    testdata adapter, not a production operator: real conversation
    tables already have this shape; every derivation here is plain
    column algebra both engines replay identically."""
    turn = (F.col(id_col) % turns_per_conv).cast("int")
    return df.select(
        (F.col(id_col) - turn).cast("long").alias("conv_id"),
        turn.alias("turn_idx"),
        F.when(turn % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.substring(F.col(text_col), 1, content_chars).alias("content"),
    )


def render_chat(conv: DataFrame) -> DataFrame:
    """Render each conversation to one training string:
    ``(conv_id, n_turns, n_chars, text)``.

    Turn order is pinned by sorting the collected (turn_idx, rendered)
    structs — ``collect_list`` order is nondeterministic under
    parallelism, ``array_sort`` on the struct makes it irrelevant. One
    shuffle on conv_id.
    """
    turns = conv.select(
        "conv_id",
        F.struct(
            F.col("turn_idx"),
            _rendered_turn(F.col("role"), F.col("content")).alias("rendered"),
        ).alias("_t"),
    )
    agg = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.array_sort(F.collect_list("_t")).alias("_ts"),
    )
    text = F.array_join(F.transform(F.col("_ts"), lambda t: t["rendered"]), "")
    return agg.select(
        "conv_id",
        "n_turns",
        F.length(text).cast("long").alias("n_chars"),
        text.alias("text"),
    )


def assistant_loss_spans(conv: DataFrame) -> DataFrame:
    """Character spans ``[start_char, end_char)`` of each ASSISTANT
    turn's content inside the :func:`render_chat` string — the
    assistant-only loss mask, pre-tokenization.

    Offsets are prefix sums of rendered-turn lengths (one window over
    conv_id ordered by turn_idx), plus the per-turn header length
    ``len(PREFIX) + len(role) + 1``. Pure integer arithmetic — no
    search in the rendered text, so repeated content can't alias and
    cost stays linear in turns.
    """
    rendered_len = (
        F.lit(len(PREFIX) + len(SUFFIX) + 1)
        + F.length("role")
        + F.length("content")
    ).cast("long")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (
        F.coalesce(F.sum(rendered_len).over(w), F.lit(0)).cast("long")
        + F.lit(len(PREFIX) + 1).cast("long")
        + F.length("role")
    )
    return (
        conv.withColumn("start_char", start)
        .withColumn(
            "end_char", (F.col("start_char") + F.length("content")).cast("long")
        )
        .filter(F.col("role") == "assistant")
        .select("conv_id", "turn_idx", "start_char", "end_char")
    )


VALID_ROLES = ("system", "user", "assistant")


def chat_format_report(conv: DataFrame) -> DataFrame:
    """Per-conversation format validation — the SFT ingest hygiene gate:
    unknown roles, empty turns, same-role runs (a broken multi-turn
    merge), wrong opener (must be system or user), and not ending on an
    assistant turn (nothing to compute loss on) each get a flag;
    ``valid`` is their conjunction. Malformed conversations are the #1
    silent SFT-data defect — they render fine and then train the model
    to speak both sides.

    One hash aggregate per conversation (ordered struct-sort, the
    render_chat discipline) and pure array algebra on the ≤turns-long
    role/content lists — no second scan, no window.
    """
    sorted_turns = F.array_sort(
        F.collect_list(F.struct("turn_idx", "role", "content"))
    )
    agg = conv.groupBy("conv_id").agg(sorted_turns.alias("_t"))
    roles = F.transform(F.col("_t"), lambda s: s["role"])
    contents = F.transform(F.col("_t"), lambda s: s["content"])
    n = F.size(roles)
    unknown_role = F.exists(
        roles, lambda r: ~r.isin(*[F.lit(x) for x in VALID_ROLES])
    )
    empty_turn = F.exists(
        contents, lambda c: F.length(F.trim(c)) == 0
    )
    same_role_run = F.exists(
        F.zip_with(
            F.slice(roles, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(roles, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: a == b,
        ),
        lambda x: x,
    )
    bad_opener = ~F.element_at(roles, 1).isin("system", "user")
    no_assistant_end = F.element_at(roles, -1) != F.lit("assistant")
    out = agg.select(
        "conv_id",
        n.cast("long").alias("n_turns"),
        unknown_role.alias("unknown_role"),
        empty_turn.alias("empty_turn"),
        same_role_run.alias("same_role_run"),
        bad_opener.alias("bad_opener"),
        no_assistant_end.alias("no_assistant_end"),
    )
    valid = ~(
        F.col("unknown_role")
        | F.col("empty_turn")
        | F.col("same_role_run")
        | F.col("bad_opener")
        | F.col("no_assistant_end")
    )
    return out.withColumn("valid", valid)


def chat_format_stats(conv: DataFrame) -> DataFrame:
    """Corpus rollup of :func:`chat_format_report`: one row with counts
    per violation class and the exact-ppm valid share."""
    rep = chat_format_report(conv)
    cnt = lambda c: F.sum(F.col(c).cast("long")).cast("long").alias(c)  # noqa: E731
    return rep.agg(
        F.count(F.lit(1)).cast("long").alias("n_conversations"),
        cnt("unknown_role"),
        cnt("empty_turn"),
        cnt("same_role_run"),
        cnt("bad_opener"),
        cnt("no_assistant_end"),
        F.sum(F.col("valid").cast("long")).cast("long").alias("valid"),
    ).select(
        "*",
        F.expr("valid * 1000000 div n_conversations").alias("valid_ppm"),
    )
