"""Batch twins of the streaming operators (oracle-checkable half of
streaming/windows.py). The streaming forms are exercised with
Trigger.AvailableNow in tests/test_streaming.py against these same
groupings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..streaming.windows import SESSIONIZE_SQL, tumbling_counts
from .catalog import register


@register(
    "tumbling_window_counts",
    driver=False,  # rotated out r4 — session_windows_batch keeps the
    # event-time window shape gated; pytest oracle continues
    oracle=(
        "SELECT date_trunc('hour', ts) AS window_start, "
        "date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end, "
        "event_type, CAST(COUNT(*) AS BIGINT) AS n_events, "
        "ROUND(AVG(value), 4) AS avg_value "
        "FROM events GROUP BY 1, 2, 3 ORDER BY 1, 3"))
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window('1 hour') aggregation — identical expression batch/streaming
    (streaming twin: streaming/windows.tumbling_counts + watermark)."""
    e = load_table(spark, sf_dir, "events")
    return tumbling_counts(e)


@register(
    "sliding_window_counts",
    driver=False,  # rotated out r4 (multiply green; pytest oracle continues)
    oracle=(
        # 1h/30m sliding: an event belongs to exactly two windows, starting
        # at floor_30(ts) and floor_30(ts) - 30min (epoch-aligned like
        # Spark's window()).
        "WITH slides AS (SELECT ts, event_type, "
        "date_trunc('hour', ts) + (CASE WHEN minute(ts) >= 30 "
        "THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END) AS f30 "
        "FROM events) "
        "SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end, "
        "event_type, CAST(COUNT(*) AS BIGINT) AS n_events FROM ("
        "SELECT f30 AS window_start, event_type FROM slides "
        "UNION ALL "
        "SELECT f30 - INTERVAL 30 MINUTE AS window_start, event_type FROM slides"
        ") x GROUP BY 1, 2, 3 ORDER BY 1, 3"))
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window('1 hour', '30 minutes') — each event in 2 windows. The oracle
    expands each event into its two slide starts explicitly."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events")
    )


@register("session_windows_batch", oracle=SESSIONIZE_SQL, bench=True,
          driver=False)  # rotated out r9 (green r2-r8; slot:
# orders_grouping_sets gated). The event-time windowing surface (T5)
# stays gated via interval_join_events, stream_quarantine_batch_twin
# and the SCD2 rows; sessionization keeps running in every bench pass
# and stays DuckDB-verified per pytest run via test_oracle_parity.
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (5-minute gap) — the batch form of
    session_window, one shuffle on user_id + two window passes. Runs the
    SAME portable SQL Spark-side (spark.sql over the events view)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(SESSIONIZE_SQL)


@register(
    "funnel_click_purchase",
    driver=False,  # rotated out r4 (multiply green; pytest oracle continues)
    oracle=(
        "SELECT c.user_id, CAST(c.event_id AS BIGINT) AS click_id, "
        "CAST(p.event_id AS BIGINT) AS purchase_id, "
        "c.ts AS click_ts, p.ts AS purchase_ts, "
        "p.value AS purchase_value "
        "FROM (SELECT * FROM events WHERE event_type = 'click') c "
        "JOIN (SELECT * FROM events WHERE event_type = 'purchase') p "
        "ON c.user_id = p.user_id AND p.ts >= c.ts "
        "AND p.ts <= c.ts + INTERVAL 30 MINUTE "
        "ORDER BY click_id, purchase_id"),
    bench=True)
def q_funnel_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (event-time funnel): batch twin of the stream-stream join
    (streaming/joins.py — identical predicate; streaming adds watermarked
    state). tests/test_streaming.py pins stream == batch."""
    from ..streaming.joins import funnel_click_purchase
    e = load_table(spark, sf_dir, "events")
    return funnel_click_purchase(e)


@register(
    "asof_last_signup",
    driver=False,  # rotated out r3 (green r1+r2; pytest oracle continues)
    oracle=(
        # DuckDB native ASOF (>= picks the greatest right ts <= left ts)
        "SELECT CAST(p.event_id AS BIGINT) AS purchase_id, p.user_id, "
        "p.ts AS purchase_ts, CAST(s.event_id AS BIGINT) AS signup_id, "
        "s.ts AS signup_ts "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s "
        "ON p.user_id = s.user_id AND p.ts >= s.ts "
        "ORDER BY purchase_id"))
def q_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): for each purchase, the most recent
    signup by the same user at or before it — candidate join + rank-1
    window; purchases with no prior signup keep NULLs (left semantics)."""
    from ..operators.asof import asof_join
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").cast("bigint").alias("purchase_id"),
        "user_id", F.col("ts").alias("purchase_ts"))
    signups = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").cast("bigint").alias("signup_id"),
        F.col("user_id").alias("s_user"), F.col("ts").alias("signup_ts"))
    return asof_join(
        purchases, signups.withColumnRenamed("s_user", "user_id"),
        on="user_id", left_ts="purchase_ts", right_ts="signup_ts",
        right_cols=["signup_id", "signup_ts"],
    ).select("purchase_id", "user_id", "purchase_ts", "signup_id",
             "signup_ts")


@register(
    "asof_bucketed_last_signup",
    # Demoted r8 after green r5-r7: the bucketed-asof machinery is
    # exercised HARDER by scd2_point_in_time_join (same operator over
    # a derived SCD2 dimension); asof_last_signup + the streaming
    # stateful twin stay DuckDB-verified per pytest run; slot goes to
    # scd2_point_in_time_join (plans/core.py)
    driver=False,
    oracle=(
        # identical contract to asof_last_signup (DuckDB native ASOF) —
        # driven through the time-bucketed candidate-bounding variant
        "SELECT CAST(p.event_id AS BIGINT) AS purchase_id, p.user_id, "
        "p.ts AS purchase_ts, CAST(s.event_id AS BIGINT) AS signup_id, "
        "s.ts AS signup_ts "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s "
        "ON p.user_id = s.user_id AND p.ts >= s.ts "
        "ORDER BY purchase_id"))
def q_asof_bucketed_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """asof_last_signup through asof_join_bucketed (daily time buckets):
    candidates are bounded to (key, bucket) + one carried row instead of
    the key's whole history — the 100 TB as-of shape, exact same results
    (property-equal to the plain operator in tests/test_properties.py,
    value-equal to DuckDB's native ASOF here)."""
    from ..operators.asof import asof_join_bucketed
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").cast("bigint").alias("purchase_id"),
        "user_id", F.col("ts").alias("purchase_ts"))
    signups = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").cast("bigint").alias("signup_id"),
        F.col("user_id").alias("s_user"), F.col("ts").alias("signup_ts"))
    return asof_join_bucketed(
        purchases, signups.withColumnRenamed("s_user", "user_id"),
        on="user_id", left_ts="purchase_ts", right_ts="signup_ts",
        right_cols=["signup_id", "signup_ts"], bucket="86400",
    ).select("purchase_id", "user_id", "purchase_ts", "signup_id",
             "signup_ts")


@register(
    "dedup_events_exact",
    driver=False,  # rotated out r3 (green r1+r2; pytest oracle continues)
    oracle=(
        "WITH doubled AS (SELECT * FROM events UNION ALL "
        "SELECT * FROM events WHERE event_id % 5 = 0), "
        "d AS (SELECT DISTINCT event_id, ts, user_id, event_type, value "
        "FROM doubled) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids FROM d"))
def q_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact streaming-style dedup (batch twin of
    dropDuplicatesWithinWatermark) on a corpus with re-delivered events."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    doubled = e.unionAll(e.filter(F.col("event_id") % 5 == 0))
    d = doubled.dropDuplicates(["event_id", "ts", "user_id", "event_type", "value"])
    return d.agg(F.count(F.lit(1)).alias("n_rows"),
                 F.countDistinct("event_id").alias("n_ids"))


@register(
    "interval_join_events",
    oracle=(
        "WITH win AS (SELECT event_id AS incident_id, ts AS w_start, "
        "ts + INTERVAL 15 MINUTE AS w_end FROM events "
        "WHERE event_type = 'error' AND value >= 100) "
        "SELECT w.incident_id, CAST(COUNT(*) AS BIGINT) AS n_events "
        "FROM win w JOIN events e "
        "ON e.ts >= w.w_start AND e.ts < w.w_end "
        "GROUP BY w.incident_id ORDER BY incident_id"),
    bench=True)
def q_interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join with NO shared equi-key: count the events
    inside each 15-minute incident window opened by a high-value error
    event. The naive containment predicate would plan a
    BroadcastNestedLoopJoin — O(events x windows); this runs through
    operators/rangejoin.interval_join, which quantizes time into 900 s
    buckets, explodes each window into the <= 2 buckets it overlaps, and
    hash-equi-joins on the bucket id with the exact containment as a
    residual filter (the equi-join reduction behind Databricks' range
    join hint). A point has exactly one bucket, so no post-join dedup.
    The oracle is DuckDB's native inequality join — same pairs, proving
    the bucketed reduction loses/duplicates nothing."""
    from ..operators.rangejoin import interval_join

    e = load_table(spark, sf_dir, "events")
    windows = (e.filter((F.col("event_type") == "error")
                        & (F.col("value") >= 100))
               .select(F.col("event_id").alias("incident_id"),
                       F.col("ts").alias("w_start"),
                       (F.col("ts") + F.expr("INTERVAL 15 MINUTES"))
                       .alias("w_end")))
    points = e.select(F.col("event_id").alias("p_event"),
                      F.col("ts").alias("p_ts"))
    pairs = interval_join(points, windows, point_ts="p_ts",
                          start_ts="w_start", end_ts="w_end",
                          bucket_seconds=900)
    return (pairs.groupBy("incident_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events")))


# rule suite for the quarantine path — rules_from_config shape, shared
# Spark/DuckDB predicate subset; 'error' events and short props violate
# at every sf, so the gate rows are never vacuous
QUARANTINE_RULES: list[tuple[str, str]] = [
    ("value_between_0_400",
     "value IS NOT NULL AND (value < 0 OR value > 400)"),
    ("props_min_length_9", "props IS NOT NULL AND length(props) < 9"),
    ("event_type_known",
     "event_type IS NOT NULL AND event_type NOT IN "
     "('click', 'view', 'purchase', 'signup')"),
]


@register(
    "stream_quarantine_batch_twin",
    oracle=(
        "SELECT event_id, concat_ws(',', "
        "CASE WHEN value IS NOT NULL AND (value < 0 OR value > 400) "
        "THEN 'value_between_0_400' END, "
        "CASE WHEN props IS NOT NULL AND length(props) < 9 "
        "THEN 'props_min_length_9' END, "
        "CASE WHEN event_type IS NOT NULL AND event_type NOT IN "
        "('click', 'view', 'purchase', 'signup') "
        "THEN 'event_type_known' END) AS violations "
        "FROM events "
        "WHERE (value IS NOT NULL AND (value < 0 OR value > 400)) "
        "OR (props IS NOT NULL AND length(props) < 9) "
        "OR (event_type IS NOT NULL AND event_type NOT IN "
        "('click', 'view', 'purchase', 'signup')) "
        "ORDER BY event_id"))
def q_stream_quarantine_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming quarantine split (streaming/quality.py) gated
    through the hash oracle as a batch twin: the SAME split_quarantine
    the foreachBatch sink runs, applied to the events table — the
    quarantined rows with their comma-joined violation list must match
    a DuckDB recomputation of every predicate (concat_ws skips the
    NULL arms identically in both engines, so the violation STRING is
    order- and content-exact, not just the row set). The tagging is a
    pure projection — zero exchanges before the final ORDER BY."""
    from ..streaming.quality import split_quarantine

    e = load_table(spark, sf_dir, "events")
    _, bad = split_quarantine(e, QUARANTINE_RULES)
    return (bad.select("event_id",
                       F.array_join("violations", ",")
                       .alias("violations")))
