"""Wikipedia XML dump ingestion (SURVEY.md §2.1 S4-S5, §2.2 C12-C14).

Reference semantics: /root/reference/src/ingestion/wiki_parser.py — a
driver-side ``ET.iterparse`` generator. Spark-first replacement: the
built-in XML data source (``format('xml'), rowTag='page'``, distributed,
splittable with compression codecs) plus a native markup-removal chain:
a balanced depth-counter template strip (exact at any nesting depth —
the semantics of mwparserfromhell's template nodes, wiki_parser.py:215-247,
as a pure JVM fold) followed by the reference's regex fallback rewrites
(wiki_parser.py:249-293). The mwparserfromhell-based primary path is still
gated behind an import-try pandas UDF — that library is not in this
container, so the native chain is the default and the tested one.

Page filters (wiki_parser.py:153-196): ns == 0, not a redirect, text
present, stripped length >= 50 — expressed as pushdown-friendly filters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.functions.text import strip_ws

MIN_ARTICLE_CHARS = 50  # wiki_parser.py:195

# Tokenizer sentinels for the balanced template strip: '{{' / '}}' are
# rewritten to SEP+mark+SEP so a plain split yields a stream of
# (open-mark | close-mark | literal) tokens both engines fold over with
# a depth counter. Control picks (RS / DC1 / DC2) never occur in real
# wikitext; if they did, both engines transform identically, so the
# oracle cannot drift.
_T_SEP, _T_OPEN, _T_CLOSE = "\x1e", "\x11", "\x12"

# C13 regex fallback chain (wiki_parser.py:249-276), Java-regex flavored.
# Templates are handled BEFORE this chain by the balanced depth-counter
# fold in strip_wiki_markup (r8: exact at any nesting depth, replacing
# the bounded 3-pass innermost-first regexp iteration).
_MARKUP_REWRITES: list[tuple[str, str]] = [
    (r"(?s)<ref[^>]*>.*?</ref>", ""),              # <ref>...</ref>
    (r"<ref[^/>]*/>", ""),                         # self-closing refs
    (r"<[^>]+>", ""),                              # any HTML tag
    (r"\[\[Category:[^\]]+\]\]", ""),              # categories (before links)
    (r"\[\[(?:[^|\]]*\|)?([^\]]+)\]\]", "$1"),     # [[link|text]] → text
    (r"\[https?://[^\]]+\]", ""),                  # external links
    (r"'{2,5}", ""),                               # bold/italic quotes
    (r"(?m)^=+\s*([^=]+?)\s*=+$", "$1"),           # == headings ==
]

# C14 post-clean (wiki_parser.py:278-293)
_POST_CLEAN: list[tuple[str, str]] = [
    (r"\n{3,}", "\n\n"),
    (r"[ \t]+", " "),
    (r"\(\s*\)", ""),
    (r"\s+([.,;:!?])", "$1"),
]


def strip_templates_balanced(col: Column) -> Column:
    """Balanced ``{{…}}`` removal at ANY nesting depth — the native
    stand-in for mwparserfromhell's template nodes (reference
    wiki_parser.py:215-247), replacing the r7 bounded 3-pass regex
    iteration that left residue beyond depth 3.

    Mechanism (mirrored token-for-token by the DuckDB oracle): rewrite
    the brace digraphs to sentinel tokens, split, and fold a depth
    counter — literal text is kept only at depth 0, a stray ``}}`` with
    no open template stays literal (the regex chain's behavior), and an
    unclosed ``{{`` strips to end-of-text (mwparserfromhell would keep
    it; documented deviation, deterministic on both engines). All JVM
    expression — no UDF. Cost: linear in text size for the tokenize,
    plus one accumulator concat per BRACE TOKEN (string copy ∝ kept
    length — quadratic only in the brace count, which is tens-to-
    hundreds on real wikitext, never the text length; a doc would need
    ~10⁴ template digraphs before this term rivals one regex pass).
    """
    toks = F.split(
        F.replace(
            F.replace(col, F.lit("{{"), F.lit(_T_SEP + _T_OPEN + _T_SEP)),
            F.lit("}}"),
            F.lit(_T_SEP + _T_CLOSE + _T_SEP),
        ),
        _T_SEP,
    )

    def step(acc: Column, t: Column) -> Column:
        keep = F.struct(acc["d"].alias("d"), acc["a"].alias("a"))
        return (
            F.when(
                t == _T_OPEN,
                F.struct((acc["d"] + F.lit(1)).alias("d"), acc["a"].alias("a")),
            )
            .when(
                t == _T_CLOSE,
                F.when(
                    acc["d"] > 0,
                    F.struct((acc["d"] - F.lit(1)).alias("d"), acc["a"].alias("a")),
                ).otherwise(
                    F.struct(
                        acc["d"].alias("d"),
                        F.concat(acc["a"], F.lit("}}")).alias("a"),
                    )
                ),
            )
            .otherwise(
                F.when(
                    acc["d"] == 0,
                    F.struct(
                        acc["d"].alias("d"), F.concat(acc["a"], t).alias("a")
                    ),
                ).otherwise(keep)
            )
        )

    return F.aggregate(
        toks,
        F.struct(F.lit(0).alias("d"), F.lit("").alias("a")),
        step,
        lambda acc: acc["a"],
    )


def strip_wiki_markup(col: Column) -> Column:
    """C13+C14 as one JVM expression chain (order matches the reference):
    balanced template removal first, then the regexp rewrites."""
    c = strip_templates_balanced(col)
    for pat, repl in _MARKUP_REWRITES:
        c = F.regexp_replace(c, pat, repl)
    for pat, repl in _POST_CLEAN:
        c = F.regexp_replace(c, pat, repl)
    return strip_ws(c)


# Deterministic wikitext fixture rendered from ``documents`` rows so the
# C13/C14 markup chain can be hash-checked against a DuckDB mirror (the
# driver's oracle can only see the pre-registered parquet views, not an XML
# file). Every rewrite rule above is exercised: nested templates, <ref>
# spans, self-closing refs, HTML tags, categories, piped + plain links,
# external links, bold/italic quotes, headings, and all four post-clean
# rules. Pieces: ("lit", s) literal, ("col", name) string-cast column,
# ("text", n) substr(text, 1, n).
WIKITEXT_FIXTURE: list[tuple[str, str | int]] = [
    ("lit", "{{Infobox|id="),
    ("col", "doc_id"),
    ("lit", "|nested={{val|"),
    ("col", "source"),
    ("lit", "}}}}\n== "),
    ("col", "source"),
    ("lit", " overview ==\n'''"),
    ("col", "source"),
    ("lit", "''' article.<ref name=\"r"),
    ("col", "doc_id"),
    ("lit", "\">cited text</ref>\nSee [[Main Topic|"),
    ("col", "source"),
    ("lit", " link]] and [[Plain Target]].<ref name=\"s"),
    ("col", "doc_id"),
    ("lit", "\"/>\nVisit [https://example.org/"),
    ("col", "doc_id"),
    (
        "lit",
        " the site] today , please !\n"
        '<div class="x">inline html</div> ( ) and   spaced   out .\n',
    ),
    ("text", 200),
    # r8: the balanced-strip pins — 4-deep nesting (beyond the old
    # 3-pass bound) must vanish wholly, and a stray '}}' with no open
    # template stays literal
    ("lit", "\n{{d1|x{{d2|y{{d3|z{{d4|"),
    ("col", "source"),
    ("lit", "}}}}}}}} deep-tail }} stray-closer"),
    ("lit", "\n\n\n\n[[Category:"),
    ("col", "source"),
    ("lit", "]]"),
]


def wikitext_fixture_col() -> Column:
    """Render ``WIKITEXT_FIXTURE`` as a Spark concat over a ``documents``
    row (columns doc_id, source, text). The DuckDB mirror is
    ``oracle.wikitext_fixture_sql_expr`` — same template, same bytes."""
    parts: list[Column] = []
    for kind, val in WIKITEXT_FIXTURE:
        if kind == "lit":
            parts.append(F.lit(val))
        elif kind == "col":
            parts.append(F.col(str(val)).cast("string"))
        else:  # ("text", n)
            parts.append(F.substring(F.col("text"), 1, int(val)))
    return F.concat(*parts)


def read_wiki_dump(spark: SparkSession, path: str) -> DataFrame:
    """S4: distributed scan of a MediaWiki export via the built-in XML source.

    Handles export-0.10/0.11 or no-namespace dumps identically — rowTag
    matching is namespace-agnostic in the Spark XML reader. ``.bz2`` dumps
    are read directly through the Hadoop codec (reference needed an explicit
    decompress step, download_wiki.py:84-141).
    """
    return (
        spark.read.format("xml")
        .option("rowTag", "page")
        .load(path)
    )


def parse_articles(
    raw: DataFrame, *, remove_markup: bool = True, min_chars: int = MIN_ARTICLE_CHARS
) -> DataFrame:
    """S5 projection + filters → WikiArticle-shaped DataFrame.

    Output schema: title, text, page_id, ns, redirect (+word_count,
    char_count derived columns, wiki_parser.py:36-44).
    """
    cols = dict.fromkeys(raw.columns)
    redirect = (
        F.col("redirect._title") if "redirect" in cols else F.lit(None).cast("string")
    )
    # revision/text may parse as plain string or as struct with _VALUE
    text_field = "revision.text"
    rev_type = [f for f in raw.schema.fields if f.name == "revision"]
    if rev_type:
        inner = rev_type[0].dataType
        try:
            text_type = inner["text"].dataType  # type: ignore[index]
            if hasattr(text_type, "fields") and any(
                f.name == "_VALUE" for f in text_type.fields
            ):
                text_field = "revision.text._VALUE"
        except Exception:
            pass
    raw_text = F.col(text_field).cast("string")
    text = strip_wiki_markup(raw_text) if remove_markup else raw_text

    out = (
        raw.select(
            F.col("title").cast("string").alias("title"),
            F.col("id").cast("long").alias("page_id"),
            F.coalesce(F.col("ns").cast("int"), F.lit(0)).alias("ns"),
            redirect.alias("redirect"),
            text.alias("text"),
        )
        .filter(F.col("ns") == 0)                       # wiki_parser.py:153-155
        .filter(F.col("redirect").isNull())             # wiki_parser.py:165-167
        .filter(F.col("text").isNotNull())              # wiki_parser.py:183-184
        .filter(F.length(strip_ws(F.col("text"))) >= min_chars)  # :194-196
    )
    return out.withColumn(
        "word_count", F.size(F.split(strip_ws(F.col("text")), r"\s+")).cast("long")
    ).withColumn("char_count", F.length("text").cast("long"))


def parse_wikipedia(
    spark: SparkSession, path: str, max_articles: int | None = None, remove_markup: bool = True
) -> DataFrame:
    """Convenience wrapper mirroring parse_wikipedia (wiki_parser.py:296-311).

    ``max_articles`` maps to ``limit`` (O2) — Catalyst short-circuits the
    scan instead of the reference's generator break (wiki_parser.py:122-124).
    """
    df = parse_articles(read_wiki_dump(spark, path), remove_markup=remove_markup)
    return df.limit(max_articles) if max_articles else df


def strip_markup_mwparser(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C12 primary markup path (wiki_parser.py:215-247) — requires
    mwparserfromhell, which is not in this container; the native regex chain
    (``strip_wiki_markup``) is the default and tested path. Capability-gated
    so the API surface stays honest."""
    try:
        import mwparserfromhell  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "strip_markup_mwparser needs mwparserfromhell (absent here); "
            "use the native strip_wiki_markup chain instead"
        ) from e

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _strip(texts: pd.Series) -> pd.Series:
        import mwparserfromhell

        def one(t):
            if t is None:
                return None
            code = mwparserfromhell.parse(t)
            for tpl in code.filter_templates():
                try:
                    code.remove(tpl)
                except ValueError:
                    pass
            return code.strip_code()

        return texts.map(one)

    return df.withColumn(text_col, _strip(F.col(text_col)))


DEMO_WIKI_XML = """\
<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.11/" version="0.11">
  <page><title>Alpha</title><ns>0</ns><id>1</id>
    <revision><id>11</id><text>{{Infobox|x=1}}'''Alpha''' is a [[letter|Greek letter]] used in [[mathematics]] and in the physical sciences around the world.&lt;ref&gt;c&lt;/ref&gt;</text></revision></page>
  <page><title>Redir</title><ns>0</ns><id>2</id><redirect title="Alpha"/>
    <revision><id>12</id><text>#REDIRECT [[Alpha]]</text></revision></page>
  <page><title>Category:L</title><ns>14</ns><id>3</id>
    <revision><id>13</id><text>Category page body text that is definitely long enough to pass checks.</text></revision></page>
  <page><title>Stub</title><ns>0</ns><id>4</id>
    <revision><id>14</id><text>Too short.</text></revision></page>
  <page><title>Beta</title><ns>0</ns><id>5</id>
    <revision><id>15</id><text>Beta follows [https://example.org alpha] in the Greek alphabet and ''certainly'' appears in many technical documents () , every single day.</text></revision></page>
</mediawiki>
"""


def demo_ingestion(spark: SparkSession) -> DataFrame:
    """Self-contained S4/S5/C13/C14 demonstration: writes the fixture dump
    to a temp file, runs the distributed XML scan + filters + markup strip.
    Deterministic — used as a rows-only driver-contract query."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="wiki_demo_")
    path = os.path.join(d, "dump.xml")
    with open(path, "w") as f:
        f.write(DEMO_WIKI_XML)
    return parse_articles(read_wiki_dump(spark, path)).select(
        "page_id", "title", "text", "word_count", "char_count"
    )
