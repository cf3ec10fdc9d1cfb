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


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Full-outer coalesce merge: updates win on conflict, both sides'
    unmatched rows survive. Column set = target's (updates must share it).
    """
    cols = target.columns
    t = target.select(*cols).alias("t")
    u = updates.select(*cols).alias("u")
    joined = t.join(F.broadcast(u), F.col(f"t.{key}") == F.col(f"u.{key}"),
                    "full_outer")
    return joined.select(*[
        F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}")).alias(c) for c in cols
    ])


def merge_upsert_sql(target_sql: str, updates_sql: str, key: str,
                     cols: list[str]) -> str:
    sel = ", ".join(f"COALESCE(u.{c}, t.{c}) AS {c}" for c in cols)
    return (
        f"WITH t AS ({target_sql}), u AS ({updates_sql}) "
        f"SELECT {sel} FROM t FULL OUTER JOIN u ON t.{key} = u.{key}"
    )
