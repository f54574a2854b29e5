"""HTML-to-text extraction for web-crawl ingestion.

The reference pipeline ingests Wikipedia XML only, but a training-data
engine at 100 TB ingests raw web HTML (Common-Crawl-style) far more often
— this module is the markup-removal front-end for that source, built
exactly like the wiki chain (`sources/wiki.py`): a native
``regexp_replace`` rewrite table that stays inside whole-stage codegen
(no Python in the hot path), plus literal entity substitutions.

The rewrite tables are the single source of truth: the DuckDB oracle
mirror (`plans/oracle.py::html_to_text_sql`) is built from the SAME
tables, so the two engines cannot drift. Patterns are written in the
Java ∩ RE2 regex intersection (non-capturing groups, inline flags, lazy
quantifiers — all supported by both).

Scope note: only the fixed named-entity set below is decoded here (the
ones HTML text actually uses at volume). Full numeric/named entity
decoding already exists in the cleaning stage's fused pandas UDF
(``operators/cleaning.py`` runs ``html.unescape`` inside the mojibake
fixpoint), which runs downstream of this extraction in the pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.functions.text import strip_ws

# Phase 1: remove invisible containers wholesale (content inside them is
# never prose). (?is) = case-insensitive + dot-matches-newline.
_HTML_BLOCK_REWRITES: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script>", ""),
    (r"(?is)<style[^>]*>.*?</style>", ""),
    (r"(?s)<!--.*?-->", ""),
]

# Phase 2: block-level boundaries become newlines (so words from
# adjacent paragraphs don't fuse), then every remaining tag drops.
_HTML_TAG_REWRITES: list[tuple[str, str]] = [
    (r"(?i)<br\s*/?>", "\n"),
    (r"(?i)</(?:p|div|li|tr|h[1-6]|blockquote|section|article)>", "\n"),
    (r"<[^>]+>", ""),
]

# Phase 3: literal entity decodes. ORDER MATTERS: ``&amp;`` must be
# last, else ``&amp;lt;`` would double-decode to ``<``.
_HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

# Phase 4: whitespace normalization (same shapes as the wiki post-clean).
_HTML_POST_CLEAN: list[tuple[str, str]] = [
    (r"[ \t]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{3,}", "\n\n"),
]


def html_to_text(col: Column) -> Column:
    """The full HTML→text chain as one JVM expression tree."""
    c = col
    for pat, repl in _HTML_BLOCK_REWRITES + _HTML_TAG_REWRITES:
        c = F.regexp_replace(c, pat, repl)
    for ent, ch in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    for pat, repl in _HTML_POST_CLEAN:
        c = F.regexp_replace(c, pat, repl)
    return strip_ws(c)


# Deterministic HTML fixture rendered from ``documents`` rows so the
# chain can be hash-checked against the DuckDB mirror (the driver's
# oracle only sees the pre-registered parquet views). Every rewrite rule
# above fires: script/style/comment blocks, <br>, block-close newlines,
# generic tags, all six entities, and all three post-clean shapes.
# Pieces: ("lit", s) literal, ("col", name) string-cast column,
# ("text", n) substr(text, 1, n).
HTML_FIXTURE: list[tuple[str, str | int]] = [
    ("lit", "<html><head><title>Doc "),
    ("col", "doc_id"),
    ("lit", "</title><style type='text/css'>p { color: red }</style></head>\n<body>"),
    ("lit", "<script>\nvar x = 1 < 2; // keeps going\n</script>"),
    ("lit", "<!-- crawl comment\nid "),
    ("col", "doc_id"),
    ("lit", " -->\n<h1>"),
    ("col", "source"),
    ("lit", " page</h1>\n<p>Tom &amp; Jerry say &quot;&lt;hi&gt;&quot; "
            "it&#39;s&nbsp;&nbsp;here</p>\n<div  class=\"body\">"),
    ("text", 200),
    ("lit", "</div>\n<ul><li>item one</li><li>item "),
    ("col", "doc_id"),
    ("lit", "</li></ul>\nline one<br/>line two<BR>end\t \ttabs\n\n\n\n"
            "<footer>© "),
    ("col", "source"),
    ("lit", "</footer></body></html>"),
]


def html_fixture_col() -> Column:
    """Render ``HTML_FIXTURE`` over a ``documents`` row (columns doc_id,
    source, text). DuckDB mirror: ``oracle.html_fixture_sql_expr`` —
    same template, same bytes."""
    parts: list[Column] = []
    for kind, val in HTML_FIXTURE:
        if kind == "lit":
            parts.append(F.lit(val))
        elif kind == "col":
            parts.append(F.col(str(val)).cast("string"))
        else:
            parts.append(F.substring(F.col("text"), 1, int(val)))
    return F.concat(*parts)
