"""As-of join — for each left row, the single most recent right row at or
before its event time (per key). Spark has no native ASOF; the idiomatic
composition is:

    range-candidate equi-join on key  →  window row_number over
    (left row) ordered by right time desc  →  keep rank 1  →
    left-join back to preserve unmatched left rows

One shuffle on the key; the window is per left-row and rank-limited
(WindowGroupLimit in Spark 3.5+ keeps state at 1 row). At 100 TB, bound
the candidate join with a coarse time-bucket equi-condition (join on
(key, day) ± 1) so a key's whole history never multiplies — standard
as-of bucketing.

DuckDB's native ASOF JOIN is the oracle (plans/streamops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              right_cols: list[str]) -> DataFrame:
    """Left as-of join: all left columns + right_cols from the latest right
    row with right_ts <= left_ts (NULLs when no prior right row exists).

    Determinism: ties on right_ts broken by the first right_col (callers
    pass an id column first).

    The synthetic left-row id is materialized (localCheckpoint) before the
    plan forks into the candidate-join branch and the final join-back
    branch: monotonically_increasing_id is partition-order-dependent, so
    evaluating it independently in two branches (or on task retry) could
    disagree and silently drop rows (ADVICE.md r1). At 100 TB prefer a
    stable natural key for the join-back and skip the materialization.
    """
    lid = "__asof_lid"
    l_ = left.withColumn(lid, F.monotonically_increasing_id()).localCheckpoint()
    cand = l_.join(
        right.select(F.col(on).alias("__r_key"),
                     F.col(right_ts).alias("__r_ts"),
                     *[F.col(c).alias(f"__r_{c}") for c in right_cols]),
        (F.col(on) == F.col("__r_key")) & (F.col("__r_ts") <= F.col(left_ts)),
    )
    w = W.partitionBy(lid).orderBy(
        F.desc("__r_ts"), F.desc(f"__r_{right_cols[0]}"))
    best = (cand.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(lid, *[F.col(f"__r_{c}").alias(c) for c in right_cols]))
    return l_.join(best, lid, "left").drop(lid)


def asof_join_bucketed(left: DataFrame, right: DataFrame, on: str,
                       left_ts: str, right_ts: str,
                       right_cols: list[str],
                       bucket: str = "86400") -> DataFrame:
    """As-of join with COARSE TIME-BUCKET candidate bounding — the 100 TB
    form promised by :func:`asof_join`'s docstring, same results.

    The plain candidate join multiplies each left row by the key's ENTIRE
    right-side history (months of ticks for a hot key). Here both sides
    also bucket their timestamps (default: day, for seconds-typed
    epochs); a left row joins only right rows in ITS bucket or any
    EARLIER bucket *containing that key's latest prior row*. Concretely:

    - exact stage: equi-join on (key, bucket) — right rows in the same
      bucket, filtered to ts ≤ left_ts;
    - carry stage: per (key, bucket), the right side's LAST row of each
      bucket, forward-filled to the next bucket via a window — so a left
      row whose bucket has no prior right row still finds the latest
      earlier one;
    - union → rank 1 per left row, as in the plain operator.

    The join key gains the bucket, so a key's candidates shrink from its
    whole history to ~one bucket + one carried row. ``bucket`` is a SQL
    interval in the timestamp's own unit (numeric column: bucket width;
    timestamp column: seconds).
    """
    lid = "__asof_lid"
    bexpr_l = F.expr(f"CAST(floor(CAST({left_ts} AS DOUBLE) / {bucket}) "
                     "AS BIGINT)")
    l_ = (left.withColumn(lid, F.monotonically_increasing_id())
          .withColumn("__b", bexpr_l).localCheckpoint())

    r = right.select(
        F.col(on).alias("__r_key"), F.col(right_ts).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols])
    r = r.withColumn("__b", F.expr(
        f"CAST(floor(CAST(__r_ts AS DOUBLE) / {bucket}) AS BIGINT)"))

    # carry stage: latest right row per (key, bucket), then for each
    # OCCUPIED bucket the latest row of any STRICTLY EARLIER bucket — a
    # left bucket b probes (b) exact + (greatest earlier occupied bucket
    # ≤ b) carried. To keep it a pure equi-join we forward-fill the
    # per-bucket last row onto every later OCCUPIED bucket's successor
    # range by joining left buckets to the max earlier right bucket.
    wb = W.partitionBy("__r_key", "__b").orderBy(
        F.desc("__r_ts"), F.desc(f"__r_{right_cols[0]}"))
    last_per_bucket = (r.withColumn("__rn", F.row_number().over(wb))
                       .filter(F.col("__rn") == 1).drop("__rn"))

    # left (key, bucket) distinct → max earlier occupied right bucket
    lb = l_.select(F.col(on).alias("__l_key"), "__b").distinct()
    earlier = (lb.join(last_per_bucket.select("__r_key",
                                              F.col("__b").alias("__rb")),
                       (F.col("__l_key") == F.col("__r_key"))
                       & (F.col("__rb") < F.col("__b")))
               .groupBy("__l_key", "__b")
               .agg(F.max("__rb").alias("__rb")))
    lpb = last_per_bucket.withColumnRenamed("__b", "__rb")
    carried = (earlier.join(
        lpb, (earlier["__rb"] == lpb["__rb"])
        & (earlier["__l_key"] == lpb["__r_key"]))
        .select(F.col("__l_key").alias("__c_key"),
                F.col("__b").alias("__c_b"), "__r_ts",
                *[f"__r_{c}" for c in right_cols]))

    exact = l_.join(r, (F.col(on) == F.col("__r_key"))
                    & (l_["__b"] == r["__b"])
                    & (F.col("__r_ts") <= F.col(left_ts))) \
        .select(lid, "__r_ts", *[f"__r_{c}" for c in right_cols])
    carry = l_.join(carried, (F.col(on) == F.col("__c_key"))
                    & (l_["__b"] == F.col("__c_b"))) \
        .select(lid, "__r_ts", *[f"__r_{c}" for c in right_cols])

    cand = exact.unionAll(carry)
    w = W.partitionBy(lid).orderBy(
        F.desc("__r_ts"), F.desc(f"__r_{right_cols[0]}"))
    best = (cand.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(lid, *[F.col(f"__r_{c}").alias(c) for c in right_cols]))
    return l_.join(best, lid, "left").drop(lid, "__b")
