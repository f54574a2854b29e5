"""Text Column helpers — pure ``pyspark.sql.functions`` expressions.

Everything here compiles to JVM expressions inside whole-stage codegen; no
Python executes per row. Semantics pinned to the reference's Python string
operations (see each docstring's citation into /root/reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Python ``str.split()`` splits on whitespace runs and drops leading/trailing
# empties. Note ``trim()`` (Spark and DuckDB alike) strips only spaces, while
# Python strips all whitespace — so stripping is done with a regex.


def strip_ws(col: Column | str) -> Column:
    """``str.strip()`` equivalent: strip ALL leading/trailing whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def whitespace_tokens(col: Column | str) -> Column:
    """``text.split()`` equivalent → ARRAY<STRING> of words.

    Reference: /root/reference/src/processing/quality_filter.py:163
    """
    stripped = strip_ws(col)
    return F.when(F.length(stripped) == 0, F.array().cast("array<string>")).otherwise(
        F.split(stripped, r"\s+")
    )


def word_count(col: Column | str) -> Column:
    """``len(text.split())`` as BIGINT."""
    return F.size(whitespace_tokens(col)).cast("long")


def alpha_count(col: Column | str) -> Column:
    """Count of Unicode letters (``str.isalpha()`` ≈ ``\\p{L}``).

    Reference: /root/reference/src/processing/quality_filter.py:187
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"[^\p{L}]", "")).cast("long")


def digit_count(col: Column | str) -> Column:
    """Count of decimal digits (``str.isdigit()`` ≈ ``\\p{Nd}``).

    Reference: /root/reference/src/processing/quality_filter.py:188
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"[^\p{Nd}]", "")).cast("long")


def nonspace_count(col: Column | str) -> Column:
    """Count of non-whitespace characters.

    Reference: /root/reference/src/processing/quality_filter.py:189-193
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"\s", "")).cast("long")


def char_shingles(
    col: Column | str, n: int = 5, *, pre_normalized: bool = False
) -> Column:
    """Distinct character n-grams of the lowercased, space-collapsed text.

    Reference semantics: /root/reference/src/processing/deduplicator.py:110-130
    (lowercase → collapse whitespace → set of char n-grams). Expressed as a
    higher-order ``transform`` over an index ``sequence`` — stays JVM-side,
    no explode, no Python.

    Hot-path note: expressions captured by a HOF lambda are re-evaluated
    PER ELEMENT in interpreted Generate contexts — the internal
    lowercase+collapse regex runs once per gram position, which is
    quadratic in document length. On hot paths, project the normalized
    text to a column first and pass it with ``pre_normalized=True`` so
    the lambda captures only a bound attribute (O(1) per element); see
    ``dedup._minhash_sig_table`` for the staged pattern and the r9
    word_ngrams_from_tokens note for the 15x measurement.
    """
    c = F.col(col) if isinstance(col, str) else col
    norm = c if pre_normalized else F.regexp_replace(F.lower(c), r"\s+", " ")
    ln = F.length(norm)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(ln - F.lit(n - 1), F.lit(0))),
        lambda i: norm.substr(i, F.lit(n)),
    )
    return F.when(ln < n, F.array(norm)).otherwise(F.array_distinct(grams))


# sentence-boundary sentinel: the ASCII record separator never appears in
# cleaned corpus text (C6 strips control chars), and RE2 (the DuckDB
# oracle's regex engine) has no lookbehind — so boundaries are MARKED by
# substitution, then split, identically on both engines.
SENTENCE_SENTINEL = "\x1e"


def sentence_split(col: Column | str) -> Column:
    """ARRAY<STRING> of sentences: split after ``.``/``!``/``?`` followed
    by whitespace (the punctuation stays with its sentence, the
    inter-sentence whitespace is consumed). A regex heuristic, not a
    linguistic segmenter — abbreviations like "e.g. " split, same as any
    rule-based splitter without an abbreviation table; deterministic and
    DuckDB-replayable, which the corpus-scale consumers (sentence-aligned
    chunking) need more than abbreviation recall."""
    c = F.col(col) if isinstance(col, str) else col
    marked = F.regexp_replace(c, r"([.!?])\s+", "$1" + SENTENCE_SENTINEL)
    return F.filter(
        F.split(marked, SENTENCE_SENTINEL), lambda s: F.length(s) > 0
    )
