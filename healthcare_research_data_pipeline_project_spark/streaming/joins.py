"""Stream-stream joins: correlate two live event streams inside a
bounded time band.

The batch as-of/band joins (operators/temporal.py, the readmission
self-join) answer "what preceded X" over history; the streaming twin
answers it continuously. Spark's stream-stream inner join keeps both
sides' state bounded by the watermark + the time-range condition —
exactly the state-retention property a 100 TB/day event feed needs
(unbounded state is the failure mode, not throughput).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_join(
    events: DataFrame,
    max_gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Pairs each purchase with every click by the same user within
    `max_gap` before it. Both sides are watermarked so the join state
    for old clicks/purchases is dropped once no in-band partner can
    still arrive."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user_id") == F.col("c_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}")
        ),
        "inner",
    ).select(
        F.col("p_user_id").alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
    )
