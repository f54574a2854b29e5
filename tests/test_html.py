"""HTML→text extraction chain (sources/html.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_training_data_pipeline_spark.sources.html import html_to_text


def _extract(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "raw string")
    return df.select(html_to_text(F.col("raw")).alias("t")).collect()[0]["t"]


def test_script_style_comment_blocks_removed(spark):
    out = _extract(
        spark,
        "<script>\nvar a = 1 < 2;\n</script>keep"
        "<style>p { x }</style><!-- multi\nline -->me",
    )
    assert out == "keepme"


def test_block_tags_become_newlines_inline_tags_drop(spark):
    out = _extract(spark, "<p>one</p><p>two</p><b>bo</b>ld<br/>next<BR>last")
    assert out == "one\ntwo\nbold\nnext\nlast"


def test_entities_decode_in_safe_order(spark):
    # &amp;lt; must decode to the literal text "&lt;", NOT to "<"
    out = _extract(spark, "A &amp; B &lt;x&gt; &quot;q&quot; it&#39;s&nbsp;here &amp;lt;")
    assert out == 'A & B <x> "q" it\'s here &lt;'


def test_whitespace_shapes(spark):
    out = _extract(spark, "a\t \tb  c <p>d </p>\n\n\n\n\ne")
    assert out == "a b c d\n\ne"


def test_case_insensitive_tags(spark):
    assert _extract(spark, "<SCRIPT>x</SCRIPT><P>hi</P>") == "hi"


def test_plain_text_is_untouched(spark):
    assert _extract(spark, "no markup at all") == "no markup at all"
