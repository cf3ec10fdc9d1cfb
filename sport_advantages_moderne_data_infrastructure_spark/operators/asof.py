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
