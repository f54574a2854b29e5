"""Wiki-XML ingestion tests over a synthetic MediaWiki export fixture
(FIXTURES.md §A6): ns filtering, redirect drop, markup strip, min-length."""

from __future__ import annotations

import os
import textwrap

import pytest

from llm_training_data_pipeline_spark.sources.wiki import parse_articles, parse_wikipedia, read_wiki_dump

FIXTURE = textwrap.dedent("""\
    <mediawiki xmlns="http://www.mediawiki.org/xml/export-0.11/" version="0.11">
      <page>
        <title>Alpha Article</title>
        <ns>0</ns>
        <id>1</id>
        <revision>
          <id>101</id>
          <text>{{Infobox|name=Alpha}}'''Alpha''' is a [[letter|Greek letter]] used in [[mathematics]].&lt;ref&gt;cite&lt;/ref&gt; == History == It has a long history in science and engineering texts worldwide.</text>
        </revision>
      </page>
      <page>
        <title>Beta Redirect</title>
        <ns>0</ns>
        <id>2</id>
        <redirect title="Alpha Article"/>
        <revision><id>102</id><text>#REDIRECT [[Alpha Article]]</text></revision>
      </page>
      <page>
        <title>Category:Letters</title>
        <ns>14</ns>
        <id>3</id>
        <revision><id>103</id><text>Category page text that is long enough to pass length checks easily.</text></revision>
      </page>
      <page>
        <title>Empty Page</title>
        <ns>0</ns>
        <id>4</id>
        <revision><id>104</id><text></text></revision>
      </page>
      <page>
        <title>Stub</title>
        <ns>0</ns>
        <id>5</id>
        <revision><id>105</id><text>Tiny.</text></revision>
      </page>
      <page>
        <title>Gamma Article</title>
        <ns>0</ns>
        <id>6</id>
        <revision>
          <id>106</id>
          <text>Gamma is the third letter [https://example.org ext] of the Greek alphabet and is widely used ''across'' physics () , chemistry and advanced mathematics notation today.</text>
        </revision>
      </page>
    </mediawiki>
""")


@pytest.fixture(scope="module")
def wiki_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("wiki") / "dump.xml"
    p.write_text(FIXTURE)
    return str(p)


def test_parse_articles_filters(spark, wiki_file):
    out = parse_articles(read_wiki_dump(spark, wiki_file))
    rows = {r["page_id"]: r for r in out.collect()}
    # only Alpha (1) and Gamma (6) survive: redirect, ns=14, empty, stub drop
    assert sorted(rows) == [1, 6]
    alpha = rows[1]["text"]
    assert "{{" not in alpha and "[[" not in alpha and "<ref>" not in alpha
    assert "Greek letter" in alpha  # [[letter|Greek letter]] → display text
    assert "'''" not in alpha
    gamma = rows[6]["text"]
    assert "https://example.org" not in gamma
    assert "()" not in gamma  # empty parens dropped
    assert " ," not in gamma  # space-before-punctuation fixed


def test_word_and_char_counts(spark, wiki_file):
    out = parse_articles(read_wiki_dump(spark, wiki_file))
    for r in out.collect():
        assert r["word_count"] == len(r["text"].split())
        assert r["char_count"] == len(r["text"])


def test_max_articles_limit(spark, wiki_file):
    assert parse_wikipedia(spark, wiki_file, max_articles=1).count() == 1


def test_nested_template_strip(spark):
    from llm_training_data_pipeline_spark.sources.wiki import strip_wiki_markup
    from pyspark.sql import functions as F

    cases = [
        ("Before {{cite|title=X}} after.", "Before after."),
        ("Nested {{a|{{b}}}} gone.", "Nested gone."),
        ("Deep {{a|{{b|{{c}}}}}} gone.", "Deep gone."),
        ("Link [[target|shown]] kept.", "Link shown kept."),
    ]
    df = spark.createDataFrame(cases, "text string, expected string")
    rows = df.select(
        strip_wiki_markup(F.col("text")).alias("got"), "expected"
    ).collect()
    for r in rows:
        assert r["got"] == r["expected"], (r["got"], r["expected"])


def test_balanced_template_strip_any_depth(spark):
    """r8 depth-counter fold: exact at ANY nesting depth (the old 3-pass
    regex left residue past depth 3), stray '}}' stays literal, an
    unclosed '{{' strips to end-of-text — all deterministic and
    mirrored token-for-token by the DuckDB oracle."""
    from pyspark.sql import functions as F

    from llm_training_data_pipeline_spark.sources.wiki import (
        strip_templates_balanced,
    )

    cases = [
        ("a {{1|{{2|{{3|{{4|{{5|x}}}}}}}}}} b", "a  b"),  # 5-deep
        ("keep }} stray", "keep }} stray"),
        ("tail {{unclosed forever", "tail "),
        ("{{a}}{{b}} mid {{c|{{d}}}} end", " mid  end"),
        ("", ""),
        ("no braces at all", "no braces at all"),
    ]
    df = spark.createDataFrame(cases, "text string, expected string")
    for r in df.select(
        strip_templates_balanced(F.col("text")).alias("got"), "expected"
    ).collect():
        assert r["got"] == r["expected"], (r["got"], r["expected"])


def test_balanced_template_strip_matches_python_model(spark):
    """Property pin: the Spark fold == a transparent Python model of the
    same depth-counter algorithm, over 300 seeded random brace-soup
    strings (nesting to depth ~8, stray closers, unclosed opens,
    adjacent digraphs like '{{{' and '}}}')."""
    import random
    import re

    from pyspark.sql import functions as F

    from llm_training_data_pipeline_spark.sources.wiki import (
        strip_templates_balanced,
    )

    def model(s: str) -> str:
        toks = re.split("(\\{\\{|\\}\\})", s)
        out, d = [], 0
        for t in toks:
            if t == "{{":
                d += 1
            elif t == "}}":
                if d > 0:
                    d -= 1
                else:
                    out.append("}}")
            elif d == 0:
                out.append(t)
        return "".join(out)

    rng = random.Random(42)
    alphabet = ["{{", "}}", "{", "}", "a", "b ", "|", "x{y"]
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 30)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               "i long, t string")
    got = {
        r["i"]: r["s"]
        for r in df.select("i", strip_templates_balanced(F.col("t")).alias("s")).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == model(c), (c, got[i], model(c))
