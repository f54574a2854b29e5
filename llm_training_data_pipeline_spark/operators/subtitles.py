"""Subtitle/caption text extraction (SRT, WebVTT, ASS/SSA) — engine
extension.

Video-corpus pipelines mine most of their TEXT from caption sidecars;
this module turns subtitle documents into per-cue rows with integer
millisecond timestamps using ONLY native column expressions (split /
posexplode / regexp_extract — zero Python in the path, whole-stage
codegen end to end), so the cue table scales like any other projection
at 100 TB and the whole parse is DuckDB-oracle-replayable.

Both formats ride one grammar: blocks separated by blank lines; a cue
block contains a timestamp arrow line ``HH:MM:SS,mmm --> HH:MM:SS.mmm``
(SRT comma / VTT dot accepted everywhere; VTT's optional hours field
handled) with the cue text on the following lines. SRT numeric index
lines, VTT cue identifiers, and per-cue settings after the end
timestamp are absorbed; WEBVTT headers, NOTE/STYLE blocks and anything
else without an arrow are dropped.

Regexes live in the Java∩RE2 subset (the PII precedent) so the Spark
and DuckDB sides run literally the same patterns.

Reference parity note: the reference pipeline has no media-adjacent
text sources (src/wiki_pipeline.py ingests wiki XML only); this is an
engine extension in the training-data family the task brief asks for.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# one timestamp: optional hours, minutes, seconds, millis (4 groups)
_TS = r"(?:(\d{2,}):)?(\d{2}):(\d{2})[,.](\d{3})"
# the arrow line: 8 groups; cue settings after the end stamp absorbed
_ARROW = _TS + r"\s*-->\s*" + _TS
# cue text: everything after the arrow line (group 9)
_CUE_TEXT = r"(?s)" + _ARROW + r"[^\n]*\n(.*)"
_BLOCK_SEP = r"(\r?\n){2,}"


def _ms(prefix_col, g_hour, g_min, g_sec, g_milli):
    """Millisecond total from the four timestamp groups; the optional
    hours group extracts as '' when absent (both engines) -> 0."""
    hours = F.when(g_hour == "", F.lit(0)).otherwise(g_hour.cast("long"))
    return (
        (hours * 3600 + g_min.cast("long") * 60 + g_sec.cast("long")) * 1000
        + g_milli.cast("long")
    )


def subtitle_cues(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Parse subtitle documents into one row per cue.

    Output: (doc_id, cue_index [1-based per doc, in file order],
    start_ms, end_ms, duration_ms, cue_text, cue_chars). Blocks
    without a timestamp arrow (headers, NOTEs, garbage) are dropped;
    cues never invent fields. The per-doc cue_index window partitions
    by document — bounded by cues-per-file, never global."""
    blocks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _BLOCK_SEP)).alias(
            "_pos", "_block"
        ),
    ).filter(F.regexp_extract("_block", _ARROW, 0) != "")

    def g(i):
        return F.regexp_extract("_block", _ARROW, i)

    parsed = blocks.select(
        id_col,
        "_pos",
        _ms("_block", g(1), g(2), g(3), g(4)).alias("start_ms"),
        _ms("_block", g(5), g(6), g(7), g(8)).alias("end_ms"),
        F.regexp_extract("_block", _CUE_TEXT, 9).alias("cue_text"),
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    return (
        parsed.withColumn("cue_index", F.row_number().over(w))
        .select(
            id_col,
            "cue_index",
            "start_ms",
            "end_ms",
            (F.col("end_ms") - F.col("start_ms")).alias("duration_ms"),
            "cue_text",
            F.length("cue_text").cast("long").alias("cue_chars"),
        )
    )


def render_srt(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_cues: int = 3,
) -> DataFrame:
    """Deterministic SRT renderer (native columns): each document
    becomes an ``srt`` column of ``n_cues`` cue blocks whose timestamps
    derive from the doc id and whose text is a newline-flattened slice
    of the document text — the forward direction the parse query is
    checked against (the oracle replays BOTH directions in SQL)."""
    did = F.col(id_col)

    def fmt(ms):
        # floor-div, never divide-and-cast (the repo-wide rounding pin:
        # DuckDB CAST rounds, Spark cast truncates — floor agrees)
        return F.format_string(
            "%02d:%02d:%02d,%03d",
            F.floor(ms / 3600000).cast("long"),
            F.floor(ms / 60000).cast("long") % 60,
            F.floor(ms / 1000).cast("long") % 60,
            ms % 1000,
        )

    cues = []
    for k in range(n_cues):
        start = (did % 863) * 977 + k * 1300
        end = start + 1150 + (did % 7) * 13
        body = F.concat(
            F.lit(f"cue {k} "),
            F.regexp_replace(
                F.substring(F.col(text_col), 1 + 60 * k, 55),
                r"[\r\n]+",
                " ",
            ),
        )
        cues.append(
            F.concat(
                F.lit(f"{k + 1}\n"),
                fmt(start),
                F.lit(" --> "),
                fmt(end),
                F.lit("\n"),
                body,
            )
        )
    return df.select(id_col, F.concat_ws("\n\n", *cues).alias("srt"))


# ---------------------------------------------------------------------------
# ASS/SSA (Advanced SubStation Alpha) — the third caption format:
# line-oriented `Dialogue:` events with H:MM:SS.cc centisecond
# timestamps and a 10th comma field carrying the text (which may
# itself contain commas and {\...} style-override blocks)
# ---------------------------------------------------------------------------

# start, end, then six skipped fields (style/name/margins/effect), text
_ASS_DIALOGUE = (
    r"^Dialogue:\s*[^,]*,(\d+):(\d{2}):(\d{2})[.,](\d{2}),"
    r"(\d+):(\d{2}):(\d{2})[.,](\d{2}),(?:[^,]*,){6}(.*)$"
)


def ass_dialogue_cues(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Parse ASS/SSA subtitle documents into one row per Dialogue
    event (native columns only, like ``subtitle_cues``).

    Output: (doc_id, cue_index [1-based, file order], start_ms,
    end_ms, duration_ms, cue_text [raw], cue_plain [style-override
    ``{...}`` blocks stripped, ``\\N``/``\\n`` soft breaks flattened
    to spaces], cue_chars [of cue_plain]). Non-Dialogue lines
    (headers, Format:, Comment:, styles) are dropped. Timestamps are
    centisecond-precision per the format — *_ms values are exact
    multiples of 10."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\r?\n")).alias(
            "_pos", "_line"
        ),
    ).filter(F.regexp_extract("_line", _ASS_DIALOGUE, 0) != "")

    def g(i):
        return F.regexp_extract("_line", _ASS_DIALOGUE, i)

    def ms(h, m, s, cs):
        return (
            (g(h).cast("long") * 3600 + g(m).cast("long") * 60
             + g(s).cast("long")) * 1000 + g(cs).cast("long") * 10
        )

    raw = F.regexp_extract("_line", _ASS_DIALOGUE, 9)
    plain = F.regexp_replace(
        F.regexp_replace(raw, r"\{[^}]*\}", ""), r"\\[Nnh]", " "
    )
    parsed = lines.select(
        id_col,
        "_pos",
        ms(1, 2, 3, 4).alias("start_ms"),
        ms(5, 6, 7, 8).alias("end_ms"),
        raw.alias("cue_text"),
        plain.alias("cue_plain"),
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    return (
        parsed.withColumn("cue_index", F.row_number().over(w))
        .select(
            id_col,
            "cue_index",
            "start_ms",
            "end_ms",
            (F.col("end_ms") - F.col("start_ms")).alias("duration_ms"),
            "cue_text",
            "cue_plain",
            F.length("cue_plain").cast("long").alias("cue_chars"),
        )
    )


def render_ass(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_cues: int = 3,
) -> DataFrame:
    """Deterministic ASS renderer (native columns): a Script Info +
    Events header, then ``n_cues`` Dialogue lines per document whose
    timestamps derive from the doc id and whose text is a flattened
    slice of the document text wearing a ``{\\\\b1}`` style block and a
    ``\\\\N`` soft break — the forward direction the parse query is
    value-checked against (the oracle replays BOTH directions)."""
    did = F.col(id_col)

    def fmt(ms):
        return F.format_string(
            "%d:%02d:%02d.%02d",
            F.floor(ms / 3600000).cast("long"),
            F.floor(ms / 60000).cast("long") % 60,
            F.floor(ms / 1000).cast("long") % 60,
            F.floor(ms / 10).cast("long") % 100,
        )

    parts = [
        F.lit(
            "[Script Info]\nTitle: synthetic\n\n[Events]\n"
            "Format: Layer, Start, End, Style, Name, MarginL, MarginR, "
            "MarginV, Effect, Text"
        )
    ]
    for k in range(n_cues):
        # centisecond grid: the format cannot express sub-cs times
        start = (F.floor(((did % 863) * 977 + k * 1300) / 10) * 10).cast(
            "long"
        )
        end = start + 1150 + (did % 7) * 10
        body = F.concat(
            F.lit(f"{{\\b1}}part {k}{{\\b0}}, "),
            F.regexp_replace(
                F.substring(F.col(text_col), 1 + 50 * k, 40),
                r"[\r\n,]+",
                " ",
            ),
            F.lit("\\Ntail"),
        )
        parts.append(
            F.concat(
                F.lit(f"Dialogue: 0,"),
                fmt(start),
                F.lit(","),
                fmt(end),
                F.lit(f",Default,,0,0,0,,"),
                body,
            )
        )
    return df.select(id_col, F.concat_ws("\n", *parts).alias("ass"))


# ---------------------------------------------------------------------------
# TTML/DFXP (Timed Text Markup Language) — the fourth caption format:
# XML <p begin="..." end="...">text</p> paragraphs inside <body>/<div>,
# with THREE clock syntaxes (clock "HH:MM:SS.fff", offset-seconds
# "12.345s", offset-millis "1234ms"). Broadcast/streaming services
# (DFXP is the SMPTE/Netflix profile) deliver captions this way.
# ---------------------------------------------------------------------------

# one <p> element: begin attr, end attr, inner text (non-greedy, (?s)).
# The attribute ORDER (begin before end) is part of the rendered-format
# contract, like the ASS Dialogue field order; a permuted-attribute
# document parses via from_xml-style readers, not this scan.
_TTML_P = r'(?s)<p\b[^>]*\sbegin="([^"]*)"[^>]*\send="([^"]*)"[^>]*>(.*?)</p>'
# the three TTML time syntaxes (anchored; all Java∩RE2)
_TTML_CLOCK = r"^(\d{2,}):(\d{2}):(\d{2})(?:\.(\d{1,3}))?$"
_TTML_SECS = r"^(\d+)(?:\.(\d{1,3}))?s$"
_TTML_MS = r"^(\d+)ms$"


def _ttml_ms(c):
    """TTML time expression → integer milliseconds (native columns):
    clock / offset-seconds / offset-millis; fractional parts right-pad
    to 3 digits (both engines' rpad), unparseable strings → NULL."""

    def g(pat, i):
        return F.regexp_extract(c, pat, i)

    frac = lambda pat, i: F.rpad(g(pat, i), 3, "0").cast("long")  # noqa: E731
    clock = (
        (
            g(_TTML_CLOCK, 1).cast("long") * 3600
            + g(_TTML_CLOCK, 2).cast("long") * 60
            + g(_TTML_CLOCK, 3).cast("long")
        )
        * 1000
        + frac(_TTML_CLOCK, 4)
    )
    secs = g(_TTML_SECS, 1).cast("long") * 1000 + frac(_TTML_SECS, 2)
    return (
        F.when(g(_TTML_MS, 0) != "", g(_TTML_MS, 1).cast("long"))
        .when(g(_TTML_SECS, 0) != "", secs)
        .when(g(_TTML_CLOCK, 0) != "", clock)
        .otherwise(F.lit(None).cast("long"))
    )


def ttml_cues(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Parse TTML/DFXP caption documents into one row per <p> cue
    (native columns only — regexp_extract_all over the element scan;
    zero Python, whole-stage codegen, DuckDB-oracle-replayable like
    the SRT/VTT/ASS siblings).

    Output: (doc_id, cue_index [1-based, document order], start_ms,
    end_ms, duration_ms, cue_text [raw inner XML], cue_plain [<br/>
    flattened to spaces, remaining tags stripped, the five predefined
    XML entities unescaped — in that order, so escaped markup stays
    literal text], cue_chars [of cue_plain]). <p> elements whose time
    expressions don't parse are dropped (both must parse); headers,
    styling and metadata elements never match the element scan."""
    els = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(_TTML_P), F.lit(0))
        ).alias("_pos", "_el"),
    )

    def g(i):
        return F.regexp_extract("_el", _TTML_P, i)

    raw = g(3)
    plain = F.regexp_replace(raw, r"<br\s*/?>", " ")
    plain = F.regexp_replace(plain, r"<[^>]*>", "")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),  # amp LAST: && stays literal
    ):
        plain = F.regexp_replace(plain, ent, ch)
    parsed = els.select(
        id_col,
        "_pos",
        _ttml_ms(g(1)).alias("start_ms"),
        _ttml_ms(g(2)).alias("end_ms"),
        raw.alias("cue_text"),
        plain.alias("cue_plain"),
    ).filter(F.col("start_ms").isNotNull() & F.col("end_ms").isNotNull())
    w = Window.partitionBy(id_col).orderBy("_pos")
    return (
        parsed.withColumn("cue_index", F.row_number().over(w))
        .select(
            id_col,
            "cue_index",
            "start_ms",
            "end_ms",
            (F.col("end_ms") - F.col("start_ms")).alias("duration_ms"),
            "cue_text",
            "cue_plain",
            F.length("cue_plain").cast("long").alias("cue_chars"),
        )
    )


def render_ttml(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_cues: int = 3,
) -> DataFrame:
    """Deterministic TTML renderer (native columns): a <tt>/<body>/<div>
    skeleton with ``n_cues`` <p> elements per document. Cue k cycles
    the time syntax (clock with millis / offset-seconds / offset-ms) so
    one rendered corpus exercises every parse leg; the body carries a
    <br/>, a <span> wrapper and an &amp; entity so cue_plain's
    flatten/strip/unescape pipeline is value-checked too. The forward
    direction the ttml_cues_parse oracle replays in SQL."""
    did = F.col(id_col)

    def clock(ms):
        return F.format_string(
            "%02d:%02d:%02d.%03d",
            F.floor(ms / 3600000).cast("long"),
            F.floor(ms / 60000).cast("long") % 60,
            F.floor(ms / 1000).cast("long") % 60,
            ms % 1000,
        )

    def secs(ms):
        return F.format_string(
            "%d.%03ds", F.floor(ms / 1000).cast("long"), ms % 1000
        )

    def millis(ms):
        return F.format_string("%dms", ms)

    fmts = (clock, secs, millis)
    parts = [
        F.lit(
            '<tt xmlns="http://www.w3.org/ns/ttml">\n  <body>\n    <div>'
        )
    ]
    for k in range(n_cues):
        start = (did % 863) * 977 + k * 1300
        end = start + 1200 + (did % 9) * 7
        body = F.concat(
            F.lit(f"<span>seg {k}</span> "),
            F.regexp_replace(
                F.substring(F.col(text_col), 1 + 45 * k, 38),
                r'[\r\n<>&"]+',
                " ",
            ),
            F.lit("<br/>tail &amp; more"),
        )
        parts.append(
            F.concat(
                F.lit('      <p begin="'),
                fmts[k % 3](start),
                F.lit('" end="'),
                fmts[k % 3](end),
                F.lit('">'),
                body,
                F.lit("</p>"),
            )
        )
    parts.append(F.lit("    </div>\n  </body>\n</tt>"))
    return df.select(id_col, F.concat_ws("\n", *parts).alias("ttml"))
