"""Relational core: the reference's batch join pipeline and analytics
queries, re-expressed as idiomatic DataFrame transforms.

Reference anchors:
- activity aggregation  A1  — airflow/config/read_delta.py:114-127
- projection            P3  — read_delta.py:261
- type-align casts      P9  — read_delta.py:130-161
- inner + left joins    J1/J2 — read_delta.py:280,285
- flagship prime query  J3/F4-F7 — README.md:140-164
- top-sports top-k      A2/O1/O2 — spark/SaveDelta.scala:236-242
- masked view           P4/F8 — init-scripts/init-db.sql:74-89
- notifier filter       P6/F9 — slack_notifier/slack_notification.py:119-124
- commute validation    P7/P8/F13 — commute_validation/commute_validation.py:84-112

Scale posture: the dimension side (employees ⋈ commute_validations) is
explicitly broadcast — at 100 TB the fact table (activities) dominates and
must never shuffle for a dim join; the aggregation is a partial+final hash
agg on the join key, done BEFORE the join so the shuffled payload is one row
per employee, not one per activity (same authoring choice as the reference,
read_delta.py:270).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def activity_agg(activities: DataFrame) -> DataFrame:
    """Per-employee activity count + mean duration (A1, read_delta.py:123-127).

    Partial aggregation (map-side combine) happens automatically; the only
    shuffle is on id_employee, already the downstream join key.
    mean_duration is rounded in-engine to make the value hash-stable across
    engines (sum-of-ints / count is exact in both, round(x,4) is cosmetic).
    """
    return activities.groupBy("id_employee").agg(
        F.count("id_employee").alias("count_activity"),
        F.round(F.avg("activity_duration"), 4).alias("mean_duration"),
    )


ACTIVITY_AGG_SQL = (
    "SELECT id_employee, COUNT(id_employee) AS count_activity, "
    "ROUND(AVG(activity_duration), 4) AS mean_duration "
    "FROM sport_activities GROUP BY id_employee"
)


def employee_projection(employees: DataFrame) -> DataFrame:
    """P3 (read_delta.py:261): the 4 columns the join pipeline needs.
    Column pruning reaches the scan via Catalyst either way; the explicit
    select documents intent and fixes the output schema."""
    return employees.select(
        "id_employee", "gross_salary", "business_unity", "constract_type")


def final_table(employees: DataFrame, validations: DataFrame,
                activities: DataFrame) -> DataFrame:
    """The full batch pipeline (read_delta.py:234-294): project → cast →
    inner join validations → left join aggregated activities.

    Left-join NULL semantics preserved: employees with zero activities get
    NULL count_activity / mean_duration (no coalesce — the flagship query's
    CASE relies on it, README.md:157-160).
    """
    emp = employee_projection(employees).withColumn(
        "id_employee", F.col("id_employee").cast("int"))  # P9
    val = validations.withColumn(
        "id_employee", F.col("id_employee").cast("int"))
    agg = activity_agg(activities)
    joined = emp.join(val, "id_employee")            # J1 (broadcast by AQE/size)
    return joined.join(agg, "id_employee", "left")   # J2


FINAL_TABLE_SQL = (
    "SELECT e.id_employee, e.gross_salary, e.business_unity, e.constract_type, "
    "v.id_validate, v.calculed_distance, v.calculed_duration, v.is_valid, "
    "v.error_message, v.created_at, a.count_activity, a.mean_duration "
    "FROM employees e "
    "JOIN commute_validations v ON e.id_employee = v.id_employee "
    f"LEFT JOIN ({ACTIVITY_AGG_SQL}) a ON e.id_employee = a.id_employee"
)


def prime_query(final: DataFrame) -> DataFrame:
    """Flagship analytics query (README.md:140-164): commute prime CTE +
    self-join, expressed as a single pass (Catalyst would collapse the
    self-join anyway; authoring it collapsed avoids a shuffle at scale).

    commute_prime = ROUND(gross_salary * 0.05, 2) if is_valid else 0
    is_valid_activities = count_activity >= 15 (NULL → false, CASE semantics)
    total_salary = gross_salary + commute_prime
    """
    commute_prime = F.when(
        F.col("is_valid"), F.round(F.col("gross_salary") * 0.05, 2)
    ).otherwise(F.lit(0.0))
    return (
        final
        .withColumn("commute_prime", commute_prime)
        .withColumn(
            "is_valid_activities",
            F.when(F.col("count_activity") >= 15, F.lit(True)).otherwise(F.lit(False)),
        )
        .withColumn(
            "total_salary",
            (F.col("gross_salary") + F.col("commute_prime")).cast("double"),
        )
        .select(
            "id_employee", "gross_salary", "business_unity", "constract_type",
            "is_valid", "count_activity", "mean_duration",
            "commute_prime", "is_valid_activities", "total_salary",
        )
    )


PRIME_QUERY_SQL = (
    f"WITH final AS ({FINAL_TABLE_SQL}) "
    "SELECT id_employee, gross_salary, business_unity, constract_type, "
    "is_valid, count_activity, mean_duration, "
    "CASE WHEN is_valid THEN ROUND(gross_salary * CAST(0.05 AS DOUBLE), 2) "
    "ELSE CAST(0 AS DOUBLE) END AS commute_prime, "
    "CASE WHEN count_activity >= 15 THEN true ELSE false END AS is_valid_activities, "
    "CAST(gross_salary + (CASE WHEN is_valid THEN "
    "ROUND(gross_salary * CAST(0.05 AS DOUBLE), 2) ELSE 0 END) AS DOUBLE) "
    "AS total_salary "
    "FROM final"
)


def top_sports(activities: DataFrame, k: int = 5) -> DataFrame:
    """A2/O1/O2 (SaveDelta.scala:236-242): activity count per sport, top-k.
    Catalyst plans TakeOrderedAndProject — no full sort at scale.
    sport_type added as tie-break for cross-engine determinism."""
    return (
        activities.groupBy("sport_type")
        .agg(F.count(F.lit(1)).alias("activity_count"))
        .orderBy(F.desc("activity_count"), F.asc("sport_type"))
        .limit(k)
    )


TOP_SPORTS_SQL = (
    "SELECT sport_type, COUNT(*) AS activity_count FROM sport_activities "
    "GROUP BY sport_type ORDER BY activity_count DESC, sport_type ASC LIMIT 5"
)


def masked_employees(employees: DataFrame, mask: bool = True) -> DataFrame:
    """P4/F8 (init-db.sql:74-89): the employees_masked view — conditional
    NULLing of PII columns. The reference keys on current_user; here the
    caller passes the flag (role resolution is deployment wiring)."""
    def m(c: str):
        return F.when(F.lit(mask), F.lit(None).cast("string")).otherwise(
            F.col(c)).alias(c)
    # dates surface as ISO strings: Spark DateType→datetime.date and DuckDB
    # DATE→datetime64 stringify differently through pandas, breaking the
    # driver's value hash — CAST(... AS STRING) is identical in both.
    return employees.select(
        "id_employee", m("first_name"), m("last_name"),
        F.col("birthday").cast("string").alias("birthday"),
        "business_unity",
        F.col("hire_date").cast("string").alias("hire_date"),
        "gross_salary", "constract_type",
        m("address"), "transport_mode", "paid_leaved_days",
    )


MASKED_EMPLOYEES_SQL = (
    "SELECT id_employee, CAST(NULL AS STRING) AS first_name, "
    "CAST(NULL AS STRING) AS last_name, "
    "CAST(birthday AS STRING) AS birthday, business_unity, "
    "CAST(hire_date AS STRING) AS hire_date, "
    "gross_salary, constract_type, CAST(NULL AS STRING) AS address, "
    "transport_mode, paid_leaved_days FROM employees"
)

# the privileged-role branch of the CASE (init-db.sql:74-89 masks only for
# sportadvantagebiuser; any other role sees the raw columns)
UNMASKED_EMPLOYEES_SQL = (
    "SELECT id_employee, first_name, last_name, "
    "CAST(birthday AS STRING) AS birthday, business_unity, "
    "CAST(hire_date AS STRING) AS hire_date, "
    "gross_salary, constract_type, address, "
    "transport_mode, paid_leaved_days FROM employees"
)


def notifier_events(parsed: DataFrame) -> DataFrame:
    """P6/F9 (slack_notification.py:119-124, payload :63-72): comment-bearing
    activity events, formatted as the Slack message fields."""
    return (
        parsed
        .filter(F.col("comment").isNotNull() & (F.col("comment") != ""))
        .select(
            "id",
            F.concat_ws(" ", F.col("first_name"), F.col("last_name"))
            .alias("author"),
            "sport_type",
            F.col("comment"),
            F.concat(
                F.lit("Auteur: "), F.col("first_name"), F.lit(" "),
                F.col("last_name"), F.lit(" - Sport: "), F.col("sport_type"),
                F.lit(" - Commentaire: "), F.col("comment"),
            ).alias("message"),
        )
    )


def notifier_sql(parsed_sql: str) -> str:
    return (
        f"WITH parsed AS ({parsed_sql}) "
        "SELECT id, concat(first_name, ' ', last_name) AS author, sport_type, "
        "comment, concat('Auteur: ', first_name, ' ', last_name, ' - Sport: ', "
        "sport_type, ' - Commentaire: ', comment) AS message "
        "FROM parsed WHERE comment IS NOT NULL AND comment <> ''"
    )
