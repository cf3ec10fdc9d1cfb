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


def merge_clauses(target: DataFrame, source: DataFrame,
                  key: str | list[str], *,
                  matched_delete: str | None = None,
                  not_matched_by_source_delete: str | None = None,
                  insert: bool | str = True
                  ) -> tuple[DataFrame, DataFrame]:
    """The full MERGE clause surface (Delta's WHEN MATCHED [AND cond]
    THEN DELETE / WHEN NOT MATCHED BY SOURCE THEN DELETE), generalizing
    :func:`merge_upsert`:

    - matched, ``matched_delete`` true  → row DELETED (the CDC-apply
      pattern: a source change feed carries a deleted flag);
    - matched otherwise                 → UPDATE to the source row
      (full-row precedence, like merge_upsert);
    - source-only                       → INSERT (``insert=True``; a
      SQL string makes it CONDITIONAL over source columns — Delta's
      WHEN NOT MATCHED AND cond THEN INSERT, e.g. "NOT __deleted" so
      a CDC tombstone for an unseen key inserts nothing);
    - target-only, ``not_matched_by_source_delete`` true → DELETED
      (the retention/sync pattern: rows absent from the source sweep);
    - target-only otherwise             → kept.

    ``matched_delete`` is a SQL condition over SOURCE columns (it may
    reference columns that are NOT table columns, e.g. a `__deleted`
    CDC flag — evaluated BEFORE the source is aligned to the table
    schema); ``not_matched_by_source_delete`` is a SQL condition over
    TARGET columns. Both evaluate PRE-join, which keeps the relational
    twin (and the DuckDB oracles) trivially mirrorable.

    Returns ``(merged, changes)``: the post-merge snapshot plus the
    row-level change frame (insert / update_preimage /
    update_postimage / delete) a CDF consumer needs — deletes carry
    the TARGET pre-image.

    Shape at 100 TB: same single full-outer shuffle on the key as
    merge_upsert; the clause flags ride as two boolean columns, so no
    extra scan or join is added by any clause."""
    from functools import reduce

    keys = [key] if isinstance(key, str) else list(key)
    cols = target.columns
    t = (target.withColumn(
        "__tdel", F.expr(not_matched_by_source_delete)
        if not_matched_by_source_delete else F.lit(False))
        .withColumn("__in_t", F.lit(True)).alias("t"))
    u = (source.withColumn(
        "__mdel", F.expr(matched_delete) if matched_delete
        else F.lit(False))
        .withColumn("__ins", F.expr(insert) if isinstance(insert, str)
                    else F.lit(bool(insert)))
        .select(*cols, "__mdel", "__ins")
        .withColumn("__in_u", F.lit(True)).alias("u"))
    cond = reduce(lambda a, b: a & b,
                  [F.col(f"t.{k}") == F.col(f"u.{k}") for k in keys])
    j = t.join(u, cond, "full_outer")
    matched = F.col("t.__in_t").isNotNull() & F.col("u.__in_u").isNotNull()
    t_only = F.col("u.__in_u").isNull()
    u_only = F.col("t.__in_t").isNull()
    keep = (
        (matched & ~F.coalesce(F.col("u.__mdel"), F.lit(False)))
        | (t_only & ~F.coalesce(F.col("t.__tdel"), F.lit(False)))
        | (u_only & F.coalesce(F.col("u.__ins"), F.lit(False))))
    merged = (j.filter(keep)
              .select(*[F.when(F.col("u.__in_u").isNotNull(),
                               F.col(f"u.{c}"))
                        .otherwise(F.col(f"t.{c}")).alias(c)
                        for c in cols]))
    mdel = F.coalesce(F.col("u.__mdel"), F.lit(False))
    tdel = F.coalesce(F.col("t.__tdel"), F.lit(False))
    t_row = [F.col(f"t.{c}").alias(c) for c in cols]
    u_row = [F.col(f"u.{c}").alias(c) for c in cols]
    ct = lambda s: F.lit(s).alias("_change_type")  # noqa: E731
    ins_on = F.coalesce(F.col("u.__ins"), F.lit(False))
    changes = (
        j.filter(u_only & ins_on).select(*u_row, ct("insert"))
        .unionByName(j.filter(matched & ~mdel)
                     .select(*t_row, ct("update_preimage")))
        .unionByName(j.filter(matched & ~mdel)
                     .select(*u_row, ct("update_postimage")))
        .unionByName(j.filter(matched & mdel)
                     .select(*t_row, ct("delete")))
        .unionByName(j.filter(t_only & tdel)
                     .select(*t_row, ct("delete"))))
    return merged, changes


def merge_clauses_sql(target_sql: str, source_sql: str,
                      key: str | list[str], cols: list[str], *,
                      matched_delete: str = "FALSE",
                      not_matched_by_source_delete: str = "FALSE",
                      insert: bool | str = True) -> str:
    """DuckDB twin of :func:`merge_clauses` (the merged snapshot):
    conditions are the same pre-join SQL, over the source/target CTEs."""
    keys = [key] if isinstance(key, str) else list(key)
    on = " AND ".join(f"t.{k} = u.{k}" for k in keys)
    sel = ", ".join(
        f"CASE WHEN u.__in_u THEN u.{c} ELSE t.{c} END AS {c}"
        for c in cols)
    ins = (insert if isinstance(insert, str)
           else ("TRUE" if insert else "FALSE"))
    return (
        f"WITH t0 AS ({target_sql}), "
        f"t AS (SELECT *, ({not_matched_by_source_delete}) AS __tdel, "
        f"TRUE AS __in_t FROM t0), "
        f"u0 AS ({source_sql}), "
        f"u AS (SELECT *, ({matched_delete}) AS __mdel, ({ins}) AS "
        f"__ins, TRUE AS __in_u FROM u0) "
        f"SELECT {sel} FROM t FULL OUTER JOIN u ON {on} "
        f"WHERE (t.__in_t IS NOT NULL AND u.__in_u IS NOT NULL "
        f"AND NOT COALESCE(u.__mdel, FALSE)) "
        f"OR (u.__in_u IS NULL AND NOT COALESCE(t.__tdel, FALSE)) "
        f"OR (t.__in_t IS NULL AND COALESCE(u.__ins, FALSE))"
    )


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
