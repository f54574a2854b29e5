"""Subtitle cue extraction pins (r13): SRT and WebVTT through one
native-column grammar — timestamps (comma/dot millis, optional VTT
hours), cue settings, identifiers and index lines absorbed, headers
and NOTE blocks dropped, CRLF handled, multi-line cue text preserved.
The ⊕ query (subtitle_cues_parse) value-checks the whole parse against
DuckDB; these tests pin the format corners the synthetic SRT doesn't
reach."""

import pyspark.sql.functions as F
import pytest

from llm_training_data_pipeline_spark.operators.subtitles import (
    render_srt,
    subtitle_cues,
)

SRT = (
    "1\n"
    "00:00:01,000 --> 00:00:03,500\n"
    "Hello there.\n"
    "\n"
    "2\n"
    "00:00:04,200 --> 00:01:00,000\n"
    "Two lines of\n"
    "cue text.\n"
    "\n"
    "3\n"
    "01:02:03,456 --> 01:02:04,000\n"
    "Third.\n"
)

VTT = (
    "WEBVTT Kind: captions; Language: en\n"
    "\n"
    "NOTE\n"
    "this block must be dropped\n"
    "\n"
    "intro-cue-id\n"
    "00:05.000 --> 00:07.250 align:start position:0%\n"
    "VTT short-form hours.\n"
    "\n"
    "00:01:00.000 --> 00:01:02.000\n"
    "Full form.\n"
    "\n"
    "STYLE\n"
    "::cue { color: red }\n"
)


def _parse(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return {
        r["cue_index"]: r for r in subtitle_cues(df).orderBy("cue_index").collect()
    }


def test_srt_cues_parse_exactly(spark):
    cues = _parse(spark, SRT)
    assert len(cues) == 3
    assert (cues[1]["start_ms"], cues[1]["end_ms"]) == (1000, 3500)
    assert cues[1]["cue_text"] == "Hello there."
    assert cues[2]["start_ms"] == 4200 and cues[2]["end_ms"] == 60000
    assert cues[2]["cue_text"] == "Two lines of\ncue text."
    assert cues[2]["duration_ms"] == 55800
    assert cues[3]["start_ms"] == 3723456 and cues[3]["end_ms"] == 3724000
    # CRLF variant parses identically
    crlf = _parse(spark, SRT.replace("\n", "\r\n"))
    assert len(crlf) == 3
    assert crlf[2]["cue_text"] == "Two lines of\r\ncue text."
    assert [
        (crlf[i]["start_ms"], crlf[i]["end_ms"]) for i in (1, 2, 3)
    ] == [(cues[i]["start_ms"], cues[i]["end_ms"]) for i in (1, 2, 3)]


def test_vtt_header_notes_settings_and_short_hours(spark):
    cues = _parse(spark, VTT)
    assert len(cues) == 2  # WEBVTT header, NOTE and STYLE blocks dropped
    assert (cues[1]["start_ms"], cues[1]["end_ms"]) == (5000, 7250)
    assert cues[1]["cue_text"] == "VTT short-form hours."
    assert (cues[2]["start_ms"], cues[2]["end_ms"]) == (60000, 62000)
    assert cues[2]["cue_text"] == "Full form."


def test_garbage_and_empty_inputs_yield_no_cues(spark):
    assert _parse(spark, "") == {}
    assert _parse(spark, "no cues here\n\njust prose") == {}
    assert _parse(spark, "WEBVTT\n") == {}


def test_render_srt_round_trips_through_the_parser(spark):
    """Forward render -> parse recovers cue count, monotone per-doc
    timestamps and the flattened text slices (the ⊕ query's shape,
    pinned here without the oracle in the loop)."""
    docs = spark.createDataFrame(
        [(7, "alpha beta gamma " * 20), (12, "x\ny\nz"), (863, "")],
        "doc_id long, text string",
    )
    cues = subtitle_cues(render_srt(docs, n_cues=3), text_col="srt")
    rows = cues.orderBy("doc_id", "cue_index").collect()
    assert len(rows) == 9
    for did in (7, 12, 863):
        sub = [r for r in rows if r["doc_id"] == did]
        assert [r["cue_index"] for r in sub] == [1, 2, 3]
        assert all(
            a["start_ms"] < a["end_ms"] for a in sub
        )
        assert all(
            a["end_ms"] < b["start_ms"] for a, b in zip(sub, sub[1:])
        )
        assert all(r["cue_text"].startswith(f"cue {i} ")
                   for i, r in enumerate(sub))
    # newline flattening: the multi-line doc's cue text has no newline
    assert "\n" not in [r for r in rows if r["doc_id"] == 12][0]["cue_text"]


ASS = (
    "[Script Info]\n"
    "Title: t\n"
    "\n"
    "[V4+ Styles]\n"
    "Format: Name, Fontname\n"
    "Style: Default,Arial\n"
    "\n"
    "[Events]\n"
    "Format: Layer, Start, End, Style, Name, MarginL, MarginR, "
    "MarginV, Effect, Text\n"
    "Comment: 0,0:00:00.00,0:00:01.00,Default,,0,0,0,,dropped\n"
    "Dialogue: 0,0:00:01.50,0:00:03.25,Default,,0,0,0,,"
    "{\\b1}Bold{\\b0} and, with a comma\n"
    "Dialogue: 1,1:02:03.04,1:02:04.99,Alt,speaker,10,10,10,fx,"
    "line one\\Nline two\\hnb\n"
)


def test_ass_dialogue_parse(spark):
    """ASS/SSA: Dialogue lines only (Comment:/Style:/headers dropped),
    centisecond timestamps, text keeps embedded commas, cue_plain
    strips {...} override blocks and flattens \\N / \\h soft breaks."""
    from llm_training_data_pipeline_spark.operators.subtitles import (
        ass_dialogue_cues,
    )

    df = spark.createDataFrame([(1, ASS)], "doc_id long, text string")
    rows = {r["cue_index"]: r
            for r in ass_dialogue_cues(df).orderBy("cue_index").collect()}
    assert len(rows) == 2
    assert (rows[1]["start_ms"], rows[1]["end_ms"]) == (1500, 3250)
    assert rows[1]["cue_text"] == "{\\b1}Bold{\\b0} and, with a comma"
    assert rows[1]["cue_plain"] == "Bold and, with a comma"
    assert rows[2]["start_ms"] == 3723040 and rows[2]["end_ms"] == 3724990
    assert rows[2]["cue_text"] == "line one\\Nline two\\hnb"
    assert rows[2]["cue_plain"] == "line one line two nb"
    assert rows[2]["cue_chars"] == len("line one line two nb")
    # CRLF + garbage-only inputs
    crlf = spark.createDataFrame(
        [(2, ASS.replace("\n", "\r\n")), (3, "no events here")],
        "doc_id long, text string",
    )
    got = ass_dialogue_cues(crlf).collect()
    assert sorted(r["doc_id"] for r in got) == [2, 2]


def test_render_ass_round_trips_through_the_parser(spark):
    """Forward ASS render -> parse: cue count, 10 ms-grid monotone
    timestamps, override stripping (the ⊕ query's shape)."""
    from llm_training_data_pipeline_spark.operators.subtitles import (
        ass_dialogue_cues,
        render_ass,
    )

    docs = spark.createDataFrame(
        [(7, "alpha, beta gamma " * 20), (12, "x\ny,z")],
        "doc_id long, text string",
    )
    rows = (
        ass_dialogue_cues(render_ass(docs, n_cues=3), text_col="ass")
        .orderBy("doc_id", "cue_index")
        .collect()
    )
    assert len(rows) == 6
    for did in (7, 12):
        sub = [r for r in rows if r["doc_id"] == did]
        assert [r["cue_index"] for r in sub] == [1, 2, 3]
        assert all(r["start_ms"] % 10 == 0 and r["end_ms"] % 10 == 0
                   for r in sub)
        assert all(a["end_ms"] < b["start_ms"] for a, b in zip(sub, sub[1:]))
        assert all(r["cue_text"].startswith("{\\b1}part") for r in sub)
        assert all(r["cue_plain"].startswith(f"part {i}, ")
                   for i, r in enumerate(sub))
        assert all("{" not in r["cue_plain"] for r in sub)


TTML = (
    '<?xml version="1.0" encoding="utf-8"?>\n'
    '<tt xmlns="http://www.w3.org/ns/ttml" xml:lang="en">\n'
    '  <head><styling><style xml:id="s1"/></styling></head>\n'
    '  <body>\n'
    '    <div>\n'
    '      <p style="s1" begin="00:00:01.500" end="00:00:03.000">Clock '
    'with <span tts:fontStyle="italic">markup</span> &amp; entity</p>\n'
    '      <p begin="4.25s" end="6s">Offset seconds<br/>second line</p>\n'
    '      <p begin="7500ms" end="9000ms">Offset &lt;millis&gt;</p>\n'
    '      <p begin="oops" end="10s">Unparseable begin is dropped</p>\n'
    '    </div>\n'
    '  </body>\n'
    '</tt>\n'
)


def test_ttml_cues_parse(spark):
    """r14 (VERDICT r13 #9): all three TTML time syntaxes, leading
    attributes before begin, <br/> flattening, tag strip, entity
    unescape (escaped markup stays literal), unparseable-time drop."""
    from llm_training_data_pipeline_spark.operators.subtitles import ttml_cues

    df = spark.createDataFrame([(1, TTML)], "doc_id long, text string")
    cues = {r["cue_index"]: r for r in ttml_cues(df).orderBy("cue_index").collect()}
    assert len(cues) == 3
    c1, c2, c3 = cues[1], cues[2], cues[3]
    assert (c1["start_ms"], c1["end_ms"], c1["duration_ms"]) == (1500, 3000, 1500)
    assert c1["cue_plain"] == "Clock with markup & entity"
    assert "<span" in c1["cue_text"]  # raw keeps the markup
    assert (c2["start_ms"], c2["end_ms"]) == (4250, 6000)
    assert c2["cue_plain"] == "Offset seconds second line"
    assert (c3["start_ms"], c3["end_ms"]) == (7500, 9000)
    assert c3["cue_plain"] == "Offset <millis>"  # escaped stays literal
    assert c3["cue_chars"] == len(c3["cue_plain"])

    # garbage / empty / non-TTML XML yield no cues
    junk = spark.createDataFrame(
        [(1, ""), (2, "<tt><body><div><p>no times</p></div></body></tt>"),
         (3, "just text")],
        "doc_id long, text string",
    )
    assert ttml_cues(junk).count() == 0


def test_render_ttml_round_trips_through_the_parser(spark):
    from llm_training_data_pipeline_spark.operators.subtitles import (
        render_ttml,
        ttml_cues,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} " + "lorem ipsum dolor sit amet " * 10)
         for i in range(12)],
        "doc_id long, text string",
    )
    out = ttml_cues(render_ttml(docs, n_cues=3), text_col="ttml").collect()
    assert len(out) == 36
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, sub in by_doc.items():
        sub.sort(key=lambda r: r["cue_index"])
        assert [r["cue_index"] for r in sub] == [1, 2, 3]
        # the three rendered time syntaxes all land on the same grid
        assert sub[0]["start_ms"] == (d % 863) * 977
        assert all(
            r["start_ms"] == (d % 863) * 977 + (i) * 1300
            for i, r in enumerate(sub)
        )
        assert all(
            r["duration_ms"] == 1200 + (d % 9) * 7 for r in sub
        )
        assert all(r["cue_plain"].startswith(f"seg {i} ")
                   for i, r in enumerate(sub))
        assert all(r["cue_plain"].endswith("tail & more") for r in sub)
        assert all("<" not in r["cue_plain"] for r in sub)
