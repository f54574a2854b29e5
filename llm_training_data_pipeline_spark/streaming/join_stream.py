"""Stream-stream time-bounded join (click→purchase attribution).

The remaining Structured Streaming join shape the engine's streaming
surface needed: two unbounded sides joined on a key plus an event-time
range. Watermarks on BOTH sides let Spark purge join state — without
them a stream-stream join buffers forever; with them state is bounded
by (watermark + attribution window) per key. An inner time-bounded
join emits each match as soon as both rows have arrived (no
finalization wait — the watermark only gates state eviction).

The builder is pure DataFrame algebra, so the same function runs
unchanged on batch frames (``withWatermark`` is a no-op in batch) —
that is the stream==batch equivalence gate used by the tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Purchases attributed to a prior click by the same user within
    ``attribution_window``: (user, click_id, purchase_id, click_ts,
    purchase_ts, value). Inner join — unattributed purchases drop.

    A purchase at exactly the click instant counts (>=); the window
    upper bound is inclusive (<= click_ts + window), matching the
    common last-touch attribution convention.
    """
    c = clicks.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("click_id"),
        F.col(ts_col).alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col(user_col).alias("p_user_id"),
        F.col(id_col).alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("value"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        F.expr(
            "user_id = p_user_id AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + interval {attribution_window}"
        ),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_time"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_time"),
        "value",
    )
