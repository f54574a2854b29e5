"""As-of (time-travel) join — an operator Spark lacks natively.

``asof_join(left, right)``: for every left row, attach the most recent
right row with the same key and ``right.ts <= left.ts``.

Implemented as a composition of existing DataFrame ops (SURVEY.md §2.7
"custom operators" guidance — composition before UDFs): union the two
sides with a side tag, sort within key by (ts, side), carry the last seen
right-side values forward with a ``last(..., ignorenulls=True)`` window,
then keep the left rows. ONE shuffle (the window partition), no UDF, no
range explosion — the classic log-merge formulation, and it scales exactly
like a sort-merge join.

DuckDB has native ``ASOF JOIN``, which makes this operator fully
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: latest right values at-or-before each left row.

    Right rows at exactly the same timestamp as a left row DO match
    (<= semantics, like DuckDB ASOF JOIN's default). Left rows with no
    earlier right row keep NULL values.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, right_ts)]

    lhs = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal ts
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
    )
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            lhs.schema["_lrow"].dataType
        ).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    merged = lhs.unionByName(rhs)
    # third sort key: deterministic tie-break when multiple right rows share
    # a timestamp — the greatest value-struct wins (last in ascending order)
    tie = F.struct(*[F.col(f"_rv_{c}") for c in value_cols])
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side", tie.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        F.col(key),
        F.col("_ts"),
        F.col("_side"),
        F.col("_lrow"),
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_rv_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_rv_{c}").alias(c) for c in value_cols],
    )
    return out
