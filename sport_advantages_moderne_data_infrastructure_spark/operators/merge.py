"""MERGE/upsert emulation on plain parquet — the incremental-write path
that replaces the reference's full-overwrite rewrite at scale (SURVEY
§4.3; on a Delta deployment this is `MERGE INTO`, here the same semantics
as a join so the logic is testable without Delta jars).

Semantics (classic upsert):
- key matched   → take the update row's values
- key unmatched → keep the target row / insert the update row

Shape at 100 TB: the updates batch is small relative to the target →
broadcast it; with a date-partitioned target, rewrite only the partitions
containing matched keys (partition-overwrite), not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame,
                 key: str | list[str]) -> DataFrame:
    """Full-outer merge with ROW-wise precedence: when the key matches, the
    update row's values are taken wholesale — including columns the update
    legitimately sets to NULL (a per-column coalesce would silently keep the
    stale target value; ADVICE.md r1). Matching is detected via an
    update-side marker, not value nullness. Column set = target's (updates
    must share it). ``key``: one column name or a composite key (all
    equalities must hold)."""
    from functools import reduce

    marker = "__from_update"
    keys = [key] if isinstance(key, str) else list(key)
    cols = target.columns
    t = target.select(*cols).alias("t")
    u = updates.select(*cols).withColumn(marker, F.lit(True)).alias("u")
    # full-outer cannot broadcast-build (Spark ignores the hint) — the join
    # shuffles on the key; at 100 TB pair this with partition-overwrite of
    # only the partitions containing matched keys (module docstring)
    cond = reduce(lambda a, b: a & b,
                  [F.col(f"t.{k}") == F.col(f"u.{k}") for k in keys])
    joined = t.join(u, cond, "full_outer")
    matched = F.col(f"u.{marker}").isNotNull()
    return joined.select(*[
        F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in cols
    ])


def merge_upsert_sql(target_sql: str, updates_sql: str,
                     key: str | list[str],
                     cols: list[str]) -> str:
    """DuckDB twin — same marker-based row-wise CASE as merge_upsert."""
    keys = [key] if isinstance(key, str) else list(key)
    sel = ", ".join(
        f"CASE WHEN u.__from_update THEN u.{c} ELSE t.{c} END AS {c}"
        for c in cols)
    on = " AND ".join(f"t.{k} = u.{k}" for k in keys)
    return (
        f"WITH t AS ({target_sql}), "
        f"u AS (SELECT *, TRUE AS __from_update FROM ({updates_sql}) u0) "
        f"SELECT {sel} FROM t FULL OUTER JOIN u ON {on}"
    )
