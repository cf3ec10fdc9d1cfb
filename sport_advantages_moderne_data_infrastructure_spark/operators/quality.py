"""Data-quality expectations — the reference's Great Expectations suite
(airflow/dags/data_validation_dag.py:306-320, Q1-Q4) as composable,
oracle-verifiable DataFrame checks.

Unlike the GE DAG (driver-side, one pass per expectation), all expectations
evaluate in a SINGLE aggregation pass over the fact table (conditional
count-if per rule) — one scan + one reduce at any scale, no shuffle beyond
the final 1-row exchange, then exploded to one row per expectation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, violation predicate SQL — shared Spark/DuckDB syntax)
EXPECTATIONS: list[tuple[str, str]] = [
    # Q1 data_validation_dag.py:306
    ("start_datetime_not_null", "start_datetime IS NULL"),
    # Q2 :307
    ("sport_type_not_null", "sport_type IS NULL"),
    # Q3 :308-312 (mostly=1.0)
    ("activity_duration_non_negative",
     "activity_duration IS NOT NULL AND activity_duration < 0"),
    # Q4 :313-320 (ignore missing)
    ("distance_non_negative", "distance IS NOT NULL AND distance < 0"),
]


def quality_report(activities: DataFrame) -> DataFrame:
    """One row per expectation: (expectation, failing_rows, passed)."""
    return run_suite(activities, EXPECTATIONS)


def quality_report_sql(table: str = "sport_activities") -> str:
    return suite_sql(EXPECTATIONS, table)


def suite_sql(rules: list[tuple[str, str]], table: str) -> str:
    """Oracle twin of :func:`run_suite` for any rule list (predicates use
    the shared Spark/DuckDB SQL subset)."""
    selects = [
        f"SELECT '{name}' AS expectation, "
        f"CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS failing_rows "
        f"FROM {table}"
        for name, pred in rules
    ]
    union = " UNION ALL ".join(f"({s})" for s in selects)
    return (
        f"SELECT expectation, failing_rows, failing_rows = 0 AS passed "
        f"FROM ({union}) u"
    )


def rules_from_config(config: list[dict]) -> list[tuple[str, str]]:
    """GE-style declarative rule spec → :func:`run_suite` rules. Each entry
    is ``{"column": ..., "expectation": ..., **params}`` — exactly the
    shape ``yaml.safe_load`` produces from a Great-Expectations-like YAML
    suite (data_validation_dag.py:297-328), with no YAML/GE runtime needed.

    Supported expectations (violation predicates stay in the shared
    Spark/DuckDB SQL subset so suites remain oracle-checkable):
    not_null · non_negative · between(min,max) · in_set(values) ·
    min_length(n).
    """
    import re

    def _num(v) -> str:
        # numeric params must BE numeric — refuse to format anything else
        if not isinstance(v, (int, float)) or isinstance(v, bool):
            raise ValueError(f"numeric rule param expected, got {v!r}")
        return repr(v)

    out: list[tuple[str, str]] = []
    for r in config:
        col, exp = r["column"], r["expectation"]
        # column names are identifiers, not expressions — config values are
        # interpolated into SQL run by BOTH engines, so validate/escape
        # every one of them (ADVICE r2: quote-bearing values previously
        # produced malformed or injected predicates)
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", col):
            raise ValueError(f"invalid column name in rule config: {col!r}")
        name = r.get("name", f"{col}_{exp}")
        if exp == "not_null":
            pred = f"{col} IS NULL"
        elif exp == "non_negative":
            pred = f"{col} IS NOT NULL AND {col} < 0"
        elif exp == "between":
            pred = (f"{col} IS NOT NULL AND "
                    f"({col} < {_num(r['min'])} OR {col} > {_num(r['max'])})")
        elif exp == "in_set":
            vals = ", ".join(
                "'" + str(v).replace("'", "''") + "'" for v in r["values"])
            pred = f"{col} IS NOT NULL AND {col} NOT IN ({vals})"
        elif exp == "min_length":
            pred = f"{col} IS NOT NULL AND length({col}) < {int(r['n'])}"
        else:
            raise ValueError(f"unknown expectation type: {exp!r}")
        out.append((name, pred))
    return out


def run_suite(df: DataFrame,
              rules: list[tuple[str, str]] | None = None) -> DataFrame:
    """Declarative expectation runner over ANY table: rules are
    (name, violation-predicate SQL) pairs — the Great-Expectations-suite
    shape (data_validation_dag.py:297-328) without the GE/Airflow runtime.
    One scan + one reduce regardless of rule count."""
    rules = rules if rules is not None else EXPECTATIONS
    agg = df.agg(*[
        F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END"))
        .cast("bigint").alias(name)
        for name, pred in rules
    ])
    pairs = [F.struct(F.lit(n).alias("expectation"),
                      F.col(n).alias("failing_rows")) for n, _ in rules]
    return (
        agg.select(F.explode(F.array(*pairs)).alias("e"))
        .select(F.col("e.expectation").alias("expectation"),
                F.col("e.failing_rows").alias("failing_rows"),
                (F.col("e.failing_rows") == 0).alias("passed"))
    )


def fk_integrity(fact: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """J4 (init-db.sql:34,48): FK check as a left-anti join — rows in the
    fact whose key has no match in the dim. Empty result = constraint holds.
    At scale: broadcast the dim key set; anti-join never shuffles the fact."""
    return fact.join(F.broadcast(dim.select(key).distinct()), key, "left_anti")
