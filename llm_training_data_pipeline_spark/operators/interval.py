"""Interval overlap join — the range-join sibling of the as-of join.

Spark has no native interval join; the naive form is a non-equi theta
join (O(n²) per key). This operator turns it into an **equi-join on
(key, time-bin)**: each interval explodes into the fixed-width bins it
spans, candidates meet inside a bin, and the exact overlap predicate
runs on candidates only. A pair overlapping several shared bins is
emitted exactly once WITHOUT a distinct shuffle: the pair is attributed
to the single bin containing the overlap's start (``greatest(a.s, b.s)
div W``) — every other shared bin drops it. That removes the usual
explode→join→DISTINCT third shuffle.

Scale: shuffle volume is rows × avg bins-per-interval (pick
``bin_width_us`` ≳ the typical interval length to keep it ≈1); per-bin
candidate blocks are (key, bin)-sized, so skew follows the busiest key
per window, not the corpus. All timestamps are exact BIGINT
microseconds — no float time arithmetic — so the whole plan replays
bit-for-bit in DuckDB (oracle-paired ``interval_overlap_stats``).

Beyond-reference scope: the reference pipeline has no temporal join at
all; this is part of the engine's declared relational surface (as-of,
window, session, now interval joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_pairs(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    start_col: str,
    end_col: str,
    bin_width_us: int = 86_400_000_000,
) -> DataFrame:
    """Pairs of half-open intervals ``[start, end)`` (BIGINT µs columns)
    that overlap within the same key: one row per unordered pair
    (``a_id < b_id``) with the exact ``overlap_us``.

    Empty/negative intervals (``end <= start``) drop out; touching
    intervals (``a.end == b.start``) do NOT overlap (half-open).
    """
    w = int(bin_width_us)

    def fdiv(expr: str) -> str:
        # FLOOR division on BIGINT: Spark's `div` truncates toward zero,
        # which mis-bins negative starts (bin 0 would swallow [-w, 0)
        # and the attribution check below would then reject the pair —
        # silently DROPPING overlaps on pre-epoch/signed domains)
        return f"(({expr}) div {w}) + (CASE WHEN ({expr}) % {w} != 0 AND ({expr}) < 0 THEN -1 ELSE 0 END)"

    iv = (
        df.select(
            *key_cols,
            F.col(id_col).alias("_id"),
            F.col(start_col).cast("long").alias("_s"),
            F.col(end_col).cast("long").alias("_e"),
        )
        .filter(F.col("_e") > F.col("_s"))
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(F.expr(fdiv("_s")), F.expr(fdiv("_e - 1")))
            ),
        )
    )
    a, b = iv.alias("a"), iv.alias("b")
    on = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in key_cols] + [
        F.col("a._bin") == F.col("b._bin")
    ]
    pairs = (
        a.join(b, on=on)
        .filter(
            (F.col("a._id") < F.col("b._id"))
            & (F.col("a._s") < F.col("b._e"))
            & (F.col("b._s") < F.col("a._e"))
            # overlap-start attribution via the same FLOOR division —
            # exactly one shared bin owns each pair
            & (F.expr(fdiv("greatest(a._s, b._s)")) == F.col("a._bin"))
        )
        .select(
            *[F.col(f"a.{k}") for k in key_cols],
            F.col("a._id").alias("a_id"),
            F.col("b._id").alias("b_id"),
            (
                F.least(F.col("a._e"), F.col("b._e"))
                - F.greatest(F.col("a._s"), F.col("b._s"))
            ).alias("overlap_us"),
        )
    )
    return pairs
