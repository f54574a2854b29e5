"""PII detection and redaction (engine extension for LLM data pipelines).

Training corpora scrubbed for personally identifiable information are a
standard preprocessing requirement the reference does not cover; this module
adds it as pure column expressions — every detector is a single Java-regex
pass (codegen'd, no Python, no shuffle), so the whole battery is one scan at
any scale.

Patterns stay inside the regex subset shared by Java (Spark) and RE2
(DuckDB oracle): no lookaround, no backreferences. Replacement order is
fixed and significant — wider patterns (credit card) run before narrower
ones (phone) so a 16-digit card number is never half-eaten by the phone
rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement token) in application order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "credit_card",
        r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
        "<CREDIT_CARD>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "ipv4",
        r"\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\b\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b",
        "<PHONE>",
    ),
)


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-type match counts for one text column (one regexp_count each)."""
    t = F.col(text) if isinstance(text, str) else text
    return {name: F.regexp_count(t, F.lit(pat)) for name, pat, _ in PII_PATTERNS}


def with_pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``n_<type>`` BIGINT columns (n_email, n_credit_card, …) plus a
    ``has_pii`` flag. Pure projection — stays inside whole-stage codegen."""
    out = df
    total = F.lit(0)
    for name, col in pii_counts(text_col).items():
        out = out.withColumn(f"n_{name}", col.cast("long"))
        total = total + F.col(f"n_{name}")
    return out.withColumn("has_pii", total > 0)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace every PII match with its type token, in PII_PATTERNS order.

    Chained ``regexp_replace`` — Catalyst folds the chain into one
    projection, so this is still a single scan."""
    out_col = out_col or text_col
    expr: Column = F.col(text_col)
    for _name, pat, token in PII_PATTERNS:
        expr = F.regexp_replace(expr, pat, token)
    return df.withColumn(out_col, expr)


def synthetic_pii_corpus(customer_df: DataFrame) -> DataFrame:
    """Deterministic PII-bearing corpus derived from the customer table.

    The driver's synthetic ``documents`` text contains no digits or ``@``
    at all, so PII queries over it would be trivially all-zero. This
    builds real work for the detectors from ``c_custkey`` arithmetic —
    every row carries an email + phone, and modular conditions add SSN /
    credit-card / IP lines to deterministic subsets. The expression is
    mirrored token-for-token in ``plans/oracle._pii_corpus_sql`` so the
    DuckDB oracle constructs the identical corpus.

    Pure projection over one scan — no shuffle, no Python.
    """
    k = F.col("c_custkey")

    def pad(expr: Column, n: int) -> Column:
        return F.lpad(expr.cast("string"), n, "0")

    text = F.concat(
        F.lit("Contact "),
        F.col("c_name"),
        F.lit(" at user"),
        k.cast("string"),
        F.lit("@example.com or call 555-"),
        pad((k * 13) % 900 + 100, 3),
        F.lit("-"),
        pad((k * 31) % 10000, 4),
        F.lit("."),
        F.when(
            k % 5 == 0,
            F.concat(
                F.lit(" SSN "),
                pad((k * 7) % 1000, 3),
                F.lit("-"),
                pad(k % 100, 2),
                F.lit("-"),
                pad((k * 3) % 10000, 4),
                F.lit("."),
            ),
        ).otherwise(F.lit("")),
        F.when(
            k % 7 == 0,
            F.concat(
                F.lit(" Card "),
                pad((k * 11) % 10000, 4),
                F.lit(" "),
                pad((k * 17) % 10000, 4),
                F.lit(" "),
                pad((k * 23) % 10000, 4),
                F.lit(" "),
                pad((k * 29) % 10000, 4),
                F.lit("."),
            ),
        ).otherwise(F.lit("")),
        F.when(
            k % 3 == 0,
            F.concat(
                F.lit(" Login from 10."),
                (k % 256).cast("string"),
                F.lit("."),
                ((k * 3) % 256).cast("string"),
                F.lit("."),
                ((k * 5) % 256).cast("string"),
                F.lit("."),
            ),
        ).otherwise(F.lit("")),
    )
    return customer_df.select(k.alias("doc_id"), text.alias("text"))


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus summary: docs scanned, docs with any PII, and total
    matches per type. Single scan + single partial-aggregable agg."""
    flagged = with_pii_counts(df, text_col)
    aggs = [F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("has_pii").cast("long")).alias("docs_with_pii")]
    aggs += [
        F.sum(f"n_{name}").alias(f"total_{name}") for name, _p, _t in PII_PATTERNS
    ]
    return flagged.agg(*aggs)
