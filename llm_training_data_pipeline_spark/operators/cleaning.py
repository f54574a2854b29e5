"""Text cleaning operators (SURVEY.md §2.2, C1-C11).

Reference semantics: /root/reference/src/processing/cleaner.py:92-161 — a
fused map of toggleable sub-operators. Here the regex family (C3-C8) is pure
``regexp_replace``/``filter`` column expressions (JVM, whole-stage codegen);
only the Unicode family (C1 mojibake repair + C2 NFKC) needs Python, fused
into ONE Arrow-batched pandas UDF so the Python boundary is crossed once.

Pipeline shape (matches cleaner.py:107-144 order):
    fix_encoding → NFKC → strip URLs → strip emails → strip citations →
    strip control chars → normalize whitespace → min-length gate

Stats columns mirror CleaningStats (cleaner.py:20-36).
"""

from __future__ import annotations

import html
import re
import unicodedata
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Patterns are verbatim from the reference (cleaner.py:52-60); they are valid
# in Java regex (Spark) and RE2 (DuckDB oracle) alike.
URL_PATTERN = r"https?://(?:[-\w.]|(?:%[\da-fA-F]{2}))+[/\w\-.~:/?#\[\]@!$&'()*+,;=%]*"
# Deliberate deviation from the reference: cleaner.py:53 writes the TLD
# class as [A-Z|a-z]{2,} — the literal '|' inside a character class is a
# reference bug (it would also match pipes in "TLDs"). Both the Spark and
# DuckDB sides use this corrected pattern, so the oracle mirror cannot
# drift; do NOT "fix" it back to match the reference byte-for-byte.
EMAIL_PATTERN = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"
CITATION_PATTERN = r"(?i)\[\d+\]|\[citation needed\]|\[note \d+\]"
MULTIPLE_SPACES = r"[ \t]+"
MULTIPLE_NEWLINES = r"\n{3,}"
# Unicode category Cc minus \n\t: negated class of (non-control | \n | \t).
CONTROL_CHARS = r"[^\P{Cc}\n\t]"


@dataclass(frozen=True)
class CleanerConfig:
    """Mirrors TextCleaner.__init__ flags (cleaner.py:62-90)."""

    remove_urls: bool = True
    remove_emails: bool = True
    remove_citations: bool = True
    normalize_unicode: bool = True
    fix_encoding: bool = True
    normalize_whitespace: bool = True
    min_length_chars: int = 100


# cp1252 images of UTF-8 lead bytes (0xC2-0xF4) and continuation bytes
# (0x80-0xBF): a LEAD immediately followed by a TRAIL is the telltale
# signature of UTF-8 text mis-decoded as cp1252/latin-1 ("Ã©", "â€™", ...).
_UTF8_LEAD = "\u00C2-\u00F4"
_UTF8_TRAIL = (
    # 0xA0-0xBF keep their codepoints; 0x80-0x9F map into the windows
    # punctuation block under cp1252 OR pass through as raw controls
    # under latin-1 -- the full U+0080-U+009F range is included so
    # latin-1-decoded pages (a-circumflex + raw 80 99 for a curly
    # apostrophe) are detected, not just the five bytes cp1252 leaves
    # undefined
    "\u00A0-\u00BF\u20AC\u201A\u0192\u201E\u2026\u2020\u2021\u02C6\u2030"
    "\u0160\u2039\u0152\u017D\u2018\u2019\u201C\u201D\u2022\u2013\u2014"
    "\u02DC\u2122\u0161\u203A\u0153\u017E\u0178\u0080-\u009F"
)
_MOJIBAKE_MARKS = re.compile(f"[{_UTF8_LEAD}][{_UTF8_TRAIL}]")


def _byte_images(rng: range, enc: str) -> str:
    """Regex char-class body: the ``enc`` images of the bytes in ``rng``."""
    return re.escape("".join(sorted({bytes([b]).decode(enc) for b in rng})))


# MacRoman images of the same UTF-8 byte structure (sqrt-sign + copyright
# for e-acute; low-quote + A-umlaut + o-circumflex for a curly apostrophe):
# the other classic single-byte misdecode family ftfy repairs. Lead/trail
# classes are derived from the codec so they cannot drift.
_MACROMAN_MARKS = re.compile(
    f"[{_byte_images(range(0xC2, 0xF5), 'mac_roman')}]"
    f"[{_byte_images(range(0x80, 0xC0), 'mac_roman')}]"
)
_HTML_ENTITY = re.compile(r"&(?:#\d+|#x[0-9a-fA-F]+|[A-Za-z][A-Za-z0-9]*);")


def _badness(s: str) -> int:
    return len(_MOJIBAKE_MARKS.findall(s)) + len(_MACROMAN_MARKS.findall(s))


def _sloppy_cp1252_encode(s: str) -> bytes:
    """cp1252 encode with ftfy's "sloppy-windows-1252" extension: the five
    codepoints cp1252 leaves undefined (U+0081/8D/8F/90/9D) pass through
    as their raw byte values. Real mojibake mixes both — ``â€\\x9d`` is
    cp1252 punctuation for E2 80 plus a raw 9D — so strict cp1252 refuses
    exactly the strings that need repair most. Raises UnicodeEncodeError
    for anything else outside cp1252, preserving the caller's "can't
    re-encode → not mojibake" logic."""
    out = bytearray()
    for ch in s:
        o = ord(ch)
        if 0x80 <= o <= 0x9F:
            out.append(o)
        else:
            out += ch.encode("cp1252")
    return bytes(out)


# maximal non-ASCII runs: UTF-8 multibyte sequences contain no ASCII
# bytes, and every cp1252/latin-1/MacRoman image of a byte >= 0x80 is a
# non-ASCII codepoint — so a mojibake segment is always wholly contained
# in one such run, and repairing runs independently (ftfy's segmentation
# idea) fixes mixed strings whose whole-string re-encode fails on an
# unrelated legitimate character (the ``¯\\_(ツ)_/¯`` case).
_NONASCII_RUN = re.compile(r"[^\x00-\x7f]+")


def _char_byte(ch: str, enc: str) -> int | None:
    """The single byte whose ``enc`` image is ``ch``, or None if ``ch``
    has no single-byte preimage under that codec (sloppy = cp1252 with
    the raw-control passthrough)."""
    try:
        if enc == "sloppy":
            o = ord(ch)
            if 0x80 <= o <= 0x9F:
                return o
            b = ch.encode("cp1252")
        else:
            b = ch.encode(enc)
    except UnicodeEncodeError:
        return None
    return b[0] if len(b) == 1 else None


def _span_repair(run: str, enc: str) -> str:
    """Greedy per-SPAN repair inside one run: replace each substring
    whose ``enc`` byte image is a complete multi-byte UTF-8 sequence
    with its decode, and keep every other character verbatim. This is
    the recovery path for runs the whole-run re-encode refuses — legit
    non-ASCII fused against mojibake with no ASCII boundary between
    (``éÃ©``), or a real curly quote / ellipsis adjacent to the damaged
    image of another (``â€™’``): the un-re-encodable or non-sequence
    characters no longer veto repairing the spans around them."""
    out: list[str] = []
    i, n, changed = 0, len(run), False
    while i < n:
        b0 = _char_byte(run[i], enc)
        seq_len = 0
        if b0 is not None:
            if 0xC2 <= b0 <= 0xDF:
                seq_len = 2
            elif 0xE0 <= b0 <= 0xEF:
                seq_len = 3
            elif 0xF0 <= b0 <= 0xF4:
                seq_len = 4
        if seq_len and i + seq_len <= n:
            trail = [_char_byte(run[j], enc) for j in range(i + 1, i + seq_len)]
            if all(t is not None and 0x80 <= t <= 0xBF for t in trail):
                try:
                    out.append(bytes([b0, *trail]).decode("utf-8"))
                    i += seq_len
                    changed = True
                    continue
                except UnicodeDecodeError:
                    pass
        out.append(run[i])
        i += 1
    return "".join(out) if changed else run


def _plausible(candidate: str, prev: str) -> bool:
    """ftfy-style sanity check on a repair candidate: a decode that
    BEGINS with a combining mark is only believable when the character
    before the run is a letter for it to combine with (``uÌˆber`` →
    u + U+0308: yes; a run-initial ``Ã©√©`` mis-decoding to U+0329 +
    é under MacRoman: no — there is nothing to combine with)."""
    return not (
        candidate
        and unicodedata.combining(candidate[0])
        and not (prev and unicodedata.category(prev).startswith("L"))
    )


def _repair_run(run: str, prev: str = "") -> str:
    """Try to repair ONE maximal non-ASCII run (``prev`` = the character
    immediately before the run, for the combining-mark plausibility
    gate). A re-decode is accepted only when the run contains suspicious
    lead+trail mark pairs AND the candidate strictly reduces their
    count — legitimate non-ASCII text that happens to round-trip is
    left untouched."""
    bad = _badness(run)
    if bad == 0:
        return run
    # sloppy cp1252 first (strict cp1252 plus raw control passthrough —
    # strictly more strings repairable, identical where both succeed);
    # mac_roman last (its charset barely overlaps cp1252's suspicious
    # range, so order rarely matters, but the windows family is the
    # overwhelmingly common mojibake source)
    for enc in ("sloppy", "latin-1", "mac_roman"):
        try:
            raw = _sloppy_cp1252_encode(run) if enc == "sloppy" else run.encode(enc)
            candidate = raw.decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            continue
        if candidate != run and _badness(candidate) < bad and _plausible(
            candidate, prev
        ):
            return candidate
    # whole-run re-decode refused: repair the decodable SPANS and leave
    # the rest (r8, ftfy's character-level splitting inside a run). The
    # same badness gate applies, so a partial repair is accepted only
    # when it strictly reduces the suspicious-mark count; mixed cp1252 +
    # MacRoman damage in one run resolves across fixpoint passes (each
    # pass repairs one family's spans, lowering badness for the next).
    for enc in ("sloppy", "latin-1", "mac_roman"):
        candidate = _span_repair(run, enc)
        if candidate != run and _badness(candidate) < bad and _plausible(
            candidate, prev
        ):
            return candidate
    return run


# ANSI terminal escapes (ftfy's remove_terminal_escapes): CSI sequences
# (colors, cursor moves) survive copy-pasted shell output verbatim; the
# Cc control strip later removes the lone ESC byte but leaves the
# parameter bytes ("[0;32m") as visible garbage — so the WHOLE sequence
# goes here, before that strip. CSI only (ESC + '[' + params + final
# byte): bare ESC or other escape families pass through untouched for
# the control strip to judge.
_TERMINAL_ESCAPE = re.compile(r"\x1b\[[0-9;?]*[ -/]*[@-~]")


def _remove_terminal_escapes(s: str) -> str:
    if "\x1b" not in s:
        return s
    return _TERMINAL_ESCAPE.sub("", s)


# UTF-16 surrogate code points: never legitimate in a Python str that
# came from well-formed text, but lossy ingestion (surrogateescape JSON,
# CESU-8 emitters, mis-split UTF-16) leaves them behind. Mirrors ftfy's
# fix_surrogates: a properly ORDERED pair becomes the astral character
# it encodes; a lone half becomes U+FFFD.
_SURROGATE = re.compile("[\ud800-\udfff]")
_SURROGATE_PAIR = re.compile("[\ud800-\udbff][\udc00-\udfff]")


def _fix_surrogates(s: str) -> str:
    if not _SURROGATE.search(s):
        return s
    s = _SURROGATE_PAIR.sub(
        lambda m: chr(
            0x10000
            + ((ord(m.group()[0]) - 0xD800) << 10)
            + (ord(m.group()[1]) - 0xDC00)
        ),
        s,
    )
    return _SURROGATE.sub("�", s)


def _decode_nul_lane(body: bytes, zero_lane: int) -> str | None:
    """Decode ``body`` as UTF-16 when one byte LANE is all NUL and the
    other all non-NUL (the unmistakable shape of Latin-range UTF-16 read
    through an 8-bit codec); None when the shape doesn't hold. High
    bytes are all zero in that shape, so the decode cannot hit
    surrogates and never raises."""
    if not body or len(body) % 2:
        return None
    zeros, data = body[zero_lane::2], body[1 - zero_lane :: 2]
    if all(b == 0 for b in zeros) and all(b != 0 for b in data):
        return body.decode("utf-16-le" if zero_lane else "utf-16-be")
    return None


def _fix_utf16_interleave(s: str) -> str:
    """UTF-16 read as an 8-bit codec: ``H\\x00e\\x00l\\x00l\\x00o\\x00``
    (LE) / ``\\x00H\\x00e...`` (BE), optionally behind a byte-order mark
    surfacing as ``ÿþ``/``þÿ``. The gate is strict — every other byte
    NUL, the rest non-NUL, length ≥ 4 — because a false positive would
    garble legitimate text; real 8-bit text never carries alternating
    NULs (the control strip would eat lone ones AFTER this repair, so
    it must run first). BOM-led strings must match the lane the BOM
    declares; the BOM itself is consumed."""
    if len(s) < 4 or "\x00" not in s:
        return s
    try:
        raw = s.encode("latin-1")
    except UnicodeEncodeError:
        return s
    if raw[:2] == b"\xff\xfe":
        fixed = _decode_nul_lane(raw[2:], 1)
    elif raw[:2] == b"\xfe\xff":
        fixed = _decode_nul_lane(raw[2:], 0)
    else:
        fixed = _decode_nul_lane(raw, 1) or _decode_nul_lane(raw, 0)
    return fixed if fixed is not None else s


def _fix_mojibake(s: str) -> str:
    """Best-effort mojibake repair (stand-in for ``ftfy.fix_text``).

    ftfy is not available in this environment; this stdlib repair covers:

    - HTML entities (``&amp;`` / ``&#8217;`` / ``&eacute;``) via
      ``html.unescape`` — mirrors ftfy's ``unescape_html`` step, and runs
      INSIDE the fixpoint so entity/mojibake interleavings
      (``&Atilde;&copy;`` → ``Ã©`` → ``é``) resolve in one call;
    - UTF-8-read-as-cp1252/latin-1 (``â€™`` → ``’``, ``Ã©`` → ``é``),
      including latin-1 pages whose 0x80-0x9F bytes surface as raw
      controls, and double/triple-encoded chains (``Ã¢â‚¬â„¢`` → ``’``)
      via the bounded fixpoint (3 passes);
    - UTF-8-read-as-MacRoman (``√©`` → ``é``, ``‚Äô`` → ``’``);
    - mixed strings: repair is per maximal non-ASCII run, so mojibake
      next to legitimate non-ASCII (or unrepairable damage) is still
      fixed run-by-run instead of failing wholesale;
    - lone/paired UTF-16 surrogates (ftfy ``fix_surrogates``: ordered
      pair → astral char, lone half → U+FFFD) and UTF-16 read as an
      8-bit codec (NUL-interleaved lanes, with or without a mis-decoded
      ``ÿþ``/``þÿ`` byte-order mark) — the r8-verdict terminal-tail
      classes; plus ANSI terminal escapes (ftfy's
      ``remove_terminal_escapes``: whole CSI sequences, so the later
      Cc strip can't orphan their parameter bytes as visible garbage);
      a leading U+FEFF (including one a repair just revealed
      from ``ï»¿``) is stripped, mid-string ZWNBSP kept (word-joiner
      semantics), matching ftfy's remove-BOM-at-start behavior.

    Deterministic and idempotent; a clearly-marked narrower repair than
    ftfy (reference: src/processing/cleaner.py:108-112).
    """
    if not s:
        return s
    s = _remove_terminal_escapes(s)
    s = _fix_surrogates(s)
    s = _fix_utf16_interleave(s)
    for _ in range(3):  # bounded fixpoint for chains + revealed entities
        changed = False
        if "&" in s and _HTML_ENTITY.search(s):
            unescaped = html.unescape(s)
            if unescaped != s:
                s = unescaped
                changed = True
        if not s.isascii() and _badness(s) > 0:
            repaired = _NONASCII_RUN.sub(
                lambda m: _repair_run(
                    m.group(), s[m.start() - 1] if m.start() else ""
                ),
                s,
            )
            if repaired != s:
                s = repaired
                changed = True
        if not changed:
            break
    return s.lstrip("\ufeff")


@pandas_udf(StringType())
def fix_encoding_nfkc_udf(texts: pd.Series) -> pd.Series:
    """C1+C2 fused: mojibake repair then NFKC (cleaner.py:107-116)."""
    return texts.map(
        lambda t: None if t is None else unicodedata.normalize("NFKC", _fix_mojibake(t))
    )


@pandas_udf(StringType())
def nfkc_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: None if t is None else unicodedata.normalize("NFKC", t))


@pandas_udf(StringType())
def fix_encoding_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: None if t is None else _fix_mojibake(t))


def clean_expr(text: Column, cfg: CleanerConfig = CleanerConfig(), *, sql_only: bool = False) -> Column:
    """Build the cleaned-text Column for one input text Column.

    ``sql_only=True`` skips the pandas-UDF stages (C1/C2) so the whole
    expression stays SQL-expressible (used by the DuckDB-oracle query).
    """
    c = text
    if not sql_only:
        if cfg.fix_encoding and cfg.normalize_unicode:
            c = fix_encoding_nfkc_udf(c)  # one fused Python crossing
        elif cfg.fix_encoding:
            c = fix_encoding_udf(c)
        elif cfg.normalize_unicode:
            c = nfkc_udf(c)
    if cfg.remove_urls:
        c = F.regexp_replace(c, URL_PATTERN, " ")
    if cfg.remove_emails:
        c = F.regexp_replace(c, EMAIL_PATTERN, " ")
    if cfg.remove_citations:
        c = F.regexp_replace(c, CITATION_PATTERN, "")
    c = F.regexp_replace(c, CONTROL_CHARS, "")
    if cfg.normalize_whitespace:
        c = F.regexp_replace(c, MULTIPLE_SPACES, " ")
        c = F.regexp_replace(c, MULTIPLE_NEWLINES, "\n\n")
        c = F.regexp_replace(c, r"^\s+|\s+$", "")  # str.strip(): ALL whitespace
    return c


def with_cleaned(
    df: DataFrame,
    text_col: str = "text",
    cfg: CleanerConfig = CleanerConfig(),
    *,
    out_col: str = "cleaned_text",
    sql_only: bool = False,
) -> DataFrame:
    """Add cleaned text + CleaningStats columns; keep all rows (C9/C10).

    Stats columns: original_length, cleaned_length, chars_removed,
    urls_removed, emails_removed (cleaner.py:146-155). ``encoding_fixes``
    requires comparing pre/post UDF text and is added only on the UDF path.
    """
    text = F.col(text_col)
    cleaned = clean_expr(text, cfg, sql_only=sql_only)
    out = df.withColumn(out_col, cleaned)
    out = out.withColumn("original_length", F.length(text).cast("long"))
    out = out.withColumn("cleaned_length", F.length(F.col(out_col)).cast("long"))
    out = out.withColumn(
        "chars_removed", (F.col("original_length") - F.col("cleaned_length")).cast("long")
    )
    if cfg.remove_urls:
        out = out.withColumn("urls_removed", F.regexp_count(text, F.lit(URL_PATTERN)).cast("long"))
    if cfg.remove_emails:
        # reference counts emails AFTER URL removal (cleaner.py:119-128)
        post_url = F.regexp_replace(text, URL_PATTERN, " ") if cfg.remove_urls else text
        out = out.withColumn(
            "emails_removed", F.regexp_count(post_url, F.lit(EMAIL_PATTERN)).cast("long")
        )
    return out


def clean_documents(
    df: DataFrame,
    text_col: str = "text",
    cfg: CleanerConfig = CleanerConfig(),
    *,
    sql_only: bool = False,
) -> DataFrame:
    """Full C1-C8 pipeline: clean, then drop rows under the min-length gate.

    Equivalent of ``TextCleaner.clean_batch`` keeping only survivors
    (cleaner.py:157-185).

    Known plan trade-off: Catalyst pushes the min-length predicate through
    the projection by inlining the cleaning chain, so the regex chain is
    evaluated twice per surviving row (once in the scan-side filter, once
    in the projection) — all inside one codegen stage, no shuffle. The
    alternative (materialization barrier) costs I/O at corpus scale for a
    pure-CPU saving; the duplicate wins. Verified in
    tests/test_plan_shape.py.
    """
    out = with_cleaned(df, text_col, cfg, sql_only=sql_only)
    return out.filter(F.col("cleaned_length") >= F.lit(cfg.min_length_chars))


def cleaning_stats(df_cleaned: DataFrame) -> DataFrame:
    """Corpus-level aggregate of the per-row stats columns (C9).

    One map-side-combinable aggregation; at scale this is a single shuffle of
    partial aggregates, not a collect.
    """
    agg = df_cleaned.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("original_length").alias("total_original_chars"),
        F.sum("cleaned_length").alias("total_cleaned_chars"),
        F.sum("chars_removed").alias("total_chars_removed"),
        F.round(
            F.when(
                F.sum("original_length") > 0,
                F.sum("chars_removed") * 100.0 / F.sum("original_length"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("reduction_pct"),  # guarded: long/0 throws under ANSI
    )
    return agg


def _main() -> None:
    """Module demo (reference parity: ``python -m src.processing.cleaner``,
    README.md:66-71): clean the sf0.001 documents and print stats."""
    from llm_training_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="cleaning-demo")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cleaned = clean_documents(docs, "text")
    cleaning_stats(cleaned).show(truncate=False)


if __name__ == "__main__":
    _main()
