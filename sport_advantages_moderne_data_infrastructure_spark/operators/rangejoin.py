"""Interval (range) join — match point rows to interval rows by
containment: ``interval.start <= point.ts < interval.end``, with no
shared equi-key.

Spark has no native range join: writing the containment predicate
directly plans a BroadcastNestedLoopJoin (or a cartesian product when
neither side is broadcastable) — O(|points| x |intervals|) and a
non-starter at scale. The idiomatic composition (same shape as the range
join optimization Databricks ships as a join hint, and as the as-of
bucketing in operators/asof.py) turns it into an EQUI-join:

1. quantize time into fixed-width buckets (``floor(unix_micros/width)``);
2. explode each interval into the buckets it overlaps — for intervals
   bounded by ~bucket width that is <= 2 rows each, so the expansion is
   O(|intervals| * ceil(span/width)), not O(n^2);
3. hash-equi-join points to exploded intervals on the bucket id — a
   point lives in exactly ONE bucket, so each (point, interval) pair is
   produced at most once and no post-join dedup is needed;
4. apply the exact containment predicate as a residual filter.

Scale posture: the join is a plain shuffled hash join on an integer key;
both sides prune to (bucket, ts, payload-ids). Pick the bucket width
near the typical interval span: too narrow multiplies the interval
explosion, too wide piles points into few buckets. Hot buckets (burst
traffic) are ordinary skewed-join skew — AQE skew-split or salting
applies unchanged (plans/star.py salted_user_totals shows the salting
pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def interval_join(points: DataFrame, intervals: DataFrame, *,
                  point_ts: str, start_ts: str, end_ts: str,
                  bucket_seconds: int) -> DataFrame:
    """Inner interval join: every (point, interval) pair with
    ``start_ts <= point_ts < end_ts`` (half-open, so back-to-back
    intervals never double-match a boundary point). Returns all columns
    of both inputs; callers project/aggregate on top.

    Column names must not collide across the two inputs (rename before
    calling) — the bucket key is internal and dropped.
    """
    width = F.lit(bucket_seconds * _US)
    p = points.withColumn("__bucket", (F.unix_micros(point_ts) / width)
                          .cast("bigint"))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(
            (F.unix_micros(start_ts) / width).cast("bigint"),
            (F.unix_micros(end_ts) / width).cast("bigint"))))
    joined = p.join(iv, "__bucket").filter(
        (F.col(point_ts) >= F.col(start_ts))
        & (F.col(point_ts) < F.col(end_ts)))
    return joined.drop("__bucket")
