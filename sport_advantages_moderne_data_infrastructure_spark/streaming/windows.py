"""Event-time streaming semantics the reference lacks (SURVEY §2.8 T5 —
the idiomatic extension): watermarks, tumbling/sliding/session windows,
within-watermark dedup.

Every streaming operator here has a batch twin with identical grouping
expressions, so the availableNow streaming result is directly comparable to
an oracle-checkable batch query (tests/test_streaming.py does exactly that).

State-scale posture: watermark bounds state size (late rows beyond the
watermark are dropped); tumbling windows keep one state row per (window,
key); session windows merge on overlap — all standard Spark state-store
machinery, RocksDB-backed on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, watermark: str = "30 minutes",
                    width: str = "1 hour") -> DataFrame:
    """Tumbling event-time window per event_type (streaming or batch df)."""
    df = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        df.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "avg_value")
    )


def sliding_counts(events: DataFrame, watermark: str = "30 minutes",
                   width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding window — each event lands in width/slide windows."""
    df = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        df.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events")
    )


def session_counts(events: DataFrame, gap: str = "5 minutes",
                   watermark: str = "30 minutes") -> DataFrame:
    """Per-user session windows (gap-based merge)."""
    df = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "user_id", "n_events")
    )


def dedup_within_watermark(events: DataFrame, keys: list[str],
                           watermark: str = "30 minutes") -> DataFrame:
    """Streaming dedup with bounded state (T5 extension): drops re-deliveries
    of the same key arriving within the watermark horizon."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark) \
            .dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


# Batch twin of session_counts as portable SQL (gaps-and-islands): a new
# session starts when the gap to the previous event of the same user exceeds
# the threshold; session id = running sum of starts. Used as the DuckDB
# oracle for `session_windows_batch` (plans/streamops.py) — and it is ALSO
# the idiomatic way to sessionize a 100 TB *batch* table (one shuffle on
# user_id, two window passes, no state store).
SESSIONIZE_SQL = (
    # ``>=`` matches session_window's half-open [start, last+gap) semantics:
    # an event arriving exactly at the gap opens a NEW session. event_id
    # breaks ts ties deterministically across engines.
    "WITH deltas AS ("
    " SELECT user_id, ts, event_id,"
    "  CASE WHEN ts >= COALESCE("
    "   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),"
    "   ts - INTERVAL 1 HOUR) + INTERVAL 5 MINUTE THEN 1 ELSE 0 END"
    "  AS new_session"
    " FROM events), "
    "sess AS ("
    " SELECT user_id, ts,"
    "  SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id"
    "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id"
    " FROM deltas) "
    "SELECT user_id, CAST(session_id AS BIGINT) AS session_id,"
    " MIN(ts) AS session_start, MAX(ts) AS session_end,"
    " CAST(COUNT(*) AS BIGINT) AS n_events "
    "FROM sess GROUP BY user_id, session_id"
)
