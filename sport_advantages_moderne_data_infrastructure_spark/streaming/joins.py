"""Stream-stream joins (T5 extension — the reference has none).

Funnel pattern: for each click, find the purchases by the same user within
the next 30 minutes. Streaming form: two watermarked streams joined with an
event-time range condition — Spark buffers both sides in state, bounded by
the watermarks + the range bound. Batch twin: the same range join, directly
oracle-checkable (plans/streamops.q_funnel_click_purchase).

At 100 TB the batch form is a range join on (user_id, time bucket): Spark
plans it as a shuffled join on user_id with the time predicate applied
post-match; bucketing by user_id makes it co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUNNEL_WINDOW = "30 minutes"


def funnel_click_purchase(events: DataFrame,
                          watermark: str = "1 hour") -> DataFrame:
    """(click, purchase) pairs: same user, purchase within 30 min after the
    click. Works on a batch OR streaming events frame — streaming requires
    watermarks on both sides (state eviction bound)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"))
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts")
           <= F.col("click_ts") + F.expr(f"INTERVAL {FUNNEL_WINDOW}"))
    )
    return (
        clicks.join(purchases, cond)
        .select(F.col("c_user").alias("user_id"), "click_id", "purchase_id",
                "click_ts", "purchase_ts", "purchase_value")
    )
