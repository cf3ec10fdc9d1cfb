"""Deterministic domain-table derivations (the reference's OLTP schema,
/root/reference/init-scripts/init-db.sql:11-49, re-materialized from the
driver's star schema so the DuckDB oracle can reproduce them exactly).

Each table is specified ONCE as a list of (column, shared-SQL-fragment)
pairs; the Spark side applies the fragments with ``selectExpr`` (Catalyst
parses them into the same logical plan a DataFrame chain would produce) and
the oracle side joins them into a CTE string. Only genuinely
dialect-specific functions go through ``Dialect`` methods.

Mapping choices (all deterministic, seedless):
- employees           ← customer  (id_employee = c_custkey; 1 row each)
- commute_validations ← employees (1 row each; all four reference cases:
                        valid / over-limit / non-sportif NULL-distance /
                        lookup-failure — commute_validation.py:84-112)
- sport_activities    ← events    (id = event_id, id_employee = user_id;
                        user_id cardinality ≪ customer cardinality, so most
                        employees have ZERO activities → exercises the
                        left-join NULL path, read_delta.py:285)
- cdc_events          ← sport_activities (Debezium JSON envelope per
                        spark/SaveDelta.scala:134-149, µs-epoch
                        start_datetime, ~1% schema-only frames, ~1% NULL
                        tombstones)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.dialect import DUCKDB, SPARK, Dialect, case_int, km_1dp

# ---------------------------------------------------------------------------
# Reference value domains (activity_generator/sport_generation.py:18-23 lists
# 21 sports; stationary ones have NULL distance, :51-67).

SPORT_TYPES = [
    "Course à pied", "Marche", "Vélo", "Natation", "Randonnée",
    "Trottinette", "Roller", "Escalade", "Football", "Basketball",
    "Tennis", "Badminton", "Yoga", "Musculation", "Pilates",
    "Boxe", "Danse", "Gymnastique", "Judo", "Karaté", "Escrime",
]
STATIONARY_MIN_IDX = 12  # Yoga.. have no distance

SPORTIF_MODES = ("Marche/running", "Vélo/Trottinette/Autres")
TRANSPORT_MODES = [
    "Marche/running", "Vélo/Trottinette/Autres",
    "Transports en commun", "véhicule thermique/électrique",
]
# TRANSPORT_LIMITS, commute_validation/commute_validation.py:14-18
WALK_LIMIT_M, BIKE_LIMIT_M = 15000, 25000

COMMENTS = [
    "Super seance", "Tres bonne session", "Fatigue mais content",
    "Record personnel battu", "Seance difficile",
]

CDC_TOPIC = "sport.sport_advantages.sport_activities"


# ---------------------------------------------------------------------------
# employees ← customer   (init-db.sql:11-23; Excel headers
# commute_validation.py:193-203)

# DATE + INTEGER-days addition works identically in Spark SQL and DuckDB
# (verified in tests/test_domain_parity.py).
def _employees_cols(d: Dialect) -> list[tuple[str, str]]:
    mode_case = case_int("CAST(c_custkey % 4 AS INT)", TRANSPORT_MODES)
    return [
        ("id_employee", "CAST(c_custkey AS INT)"),
        ("first_name", "concat('Fn_', CAST(c_custkey AS STRING))"),
        ("last_name", "concat('Ln_', CAST(c_custkey AS STRING))"),
        ("birthday",
         "CAST('1970-01-01' AS DATE) + CAST(c_custkey % 10958 AS INT)"),
        ("business_unity", "c_mktsegment"),
        ("hire_date",
         "CAST('2010-01-01' AS DATE) + CAST(c_custkey % 5478 AS INT)"),
        ("gross_salary", "CAST(22000 + (c_custkey * 7919) % 68001 AS INT)"),
        ("constract_type", "CASE WHEN c_custkey % 5 = 0 THEN 'CDD' ELSE 'CDI' END"),
        ("address",
         "concat(CAST(c_custkey % 100 AS STRING), ' rue de la Republique, Ville-', "
         "CAST(c_nationkey AS STRING))"),
        ("transport_mode", mode_case),
        ("paid_leaved_days", "CAST(c_custkey % 36 AS INT)"),
    ]


# ---------------------------------------------------------------------------
# commute_validations ← employees  (init-db.sql:26-35; logic
# commute_validation.py:84-112). Two-stage: helpers then final columns.

_CV_STAGE1 = [
    ("id_employee", "id_employee"),
    ("transport_mode", "transport_mode"),
    ("sportif",
     "transport_mode IN ('Marche/running', 'Vélo/Trottinette/Autres')"),
    ("fail",
     "transport_mode IN ('Marche/running', 'Vélo/Trottinette/Autres') "
     "AND id_employee % 97 = 0"),
    ("raw_m", "CAST(500 + (id_employee * 131) % 30000 AS INT)"),
    ("limit_m",
     f"CASE WHEN transport_mode = 'Marche/running' THEN {WALK_LIMIT_M} "
     f"ELSE {BIKE_LIMIT_M} END"),
]


def _cv_cols(d: Dialect) -> list[tuple[str, str]]:
    ok = "sportif AND NOT fail"
    over = "raw_m > limit_m"
    return [
        ("id_validate", "CAST(id_employee + 1 AS INT)"),
        ("id_employee", "id_employee"),
        # doubles, not DECIMAL(10,2): every value is exactly representable
        # (integer meters; duration = 2·m/5 has one decimal digit) and
        # decimal-object vs float64 representation divergence between
        # Spark.toPandas and DuckDB.df would break the driver's value hash.
        ("calculed_distance",
         f"CASE WHEN {ok} THEN CAST(raw_m AS DOUBLE) END"),
        ("calculed_duration",
         f"CASE WHEN {ok} THEN CAST(raw_m * 2 AS DOUBLE) / 5 END"),
        ("is_valid",
         f"CASE WHEN NOT sportif OR fail THEN false ELSE raw_m <= limit_m END"),
        ("error_message",
         "CASE WHEN NOT sportif THEN "
         "concat('Mode de transport ''', transport_mode, ''' non sportif') "
         "WHEN fail THEN 'Impossible de calculer la distance' "
         f"WHEN {over} THEN concat('Distance (', {km_1dp('raw_m')}, "
         f" ' km) > limite (', CAST({int_km('limit_m')} AS STRING), ' km)') "
         "END"),
        ("created_at", d.ts_from_seconds("1704067200 + id_employee")),
    ]


def int_km(expr: str) -> str:
    return f"CAST(FLOOR(({expr}) / 1000.0) AS INT)"


# ---------------------------------------------------------------------------
# sport_activities ← events  (init-db.sql:38-49; value ranges
# sport_generation.py:42-113)

_SA_STAGE1 = [
    ("event_id", "event_id"),
    ("user_id", "user_id"),
    ("ts", "ts"),
    ("sidx", "CAST(event_id % 21 AS INT)"),
    ("dist_m", "CAST(500 + (event_id * 37) % 49500 AS INT)"),
]


def _sa_cols(d: Dialect) -> list[tuple[str, str]]:
    stationary = f"sidx >= {STATIONARY_MIN_IDX}"
    comment_case = case_int("CAST(event_id % 5 AS INT)", COMMENTS)
    return [
        ("id", "CAST(event_id AS INT)"),
        ("id_employee", "CAST(user_id AS INT)"),
        ("first_name", "concat('Fn_', CAST(user_id AS STRING))"),
        ("last_name", "concat('Ln_', CAST(user_id AS STRING))"),
        ("start_datetime", "ts"),
        ("sport_type", case_int("sidx", SPORT_TYPES)),
        ("distance",
         f"CASE WHEN {stationary} THEN CAST(NULL AS INT) ELSE dist_m END"),
        ("activity_duration",
         f"CASE WHEN {stationary} THEN CAST(1800 + (event_id * 13) % 5400 AS INT) "
         f"ELSE CAST(FLOOR(dist_m * 2 / 5.0) AS INT) END"),
        ("comment",
         f"CASE WHEN event_id % 10 < 3 THEN {comment_case} "
         "ELSE CAST(NULL AS STRING) END"),
    ]


# ---------------------------------------------------------------------------
# cdc_events ← sport_activities  (Debezium JsonConverter envelope,
# docker-compose.yaml:159-160; consumed at spark/SaveDelta.scala:134-149)

def _cdc_cols(d: Dialect) -> list[tuple[str, str]]:
    us = d.micros_from_ts("start_datetime")
    envelope = (
        "concat("
        "'{\"payload\":{\"before\":null,\"after\":{\"id\":', CAST(id AS STRING), "
        "',\"id_employee\":', CAST(id_employee AS STRING), "
        "',\"first_name\":\"', first_name, "
        "'\",\"last_name\":\"', last_name, "
        f"'\",\"start_datetime\":', CAST({us} AS STRING), "
        "',\"sport_type\":\"', sport_type, "
        "'\",\"distance\":', COALESCE(CAST(distance AS STRING), 'null'), "
        "',\"activity_duration\":', CAST(activity_duration AS STRING), "
        "',\"comment\":', CASE WHEN comment IS NULL THEN 'null' "
        "ELSE concat('\"', comment, '\"') END, "
        "'},\"op\":\"c\"}}'"
        ")"
    )
    return [
        ("key", "concat('{\"payload\":{\"id\":', CAST(id AS STRING), '}}')"),
        ("value",
         "CASE WHEN id % 103 = 0 THEN CAST(NULL AS STRING) "
         "WHEN id % 101 = 0 THEN '{\"schema\":{\"type\":\"struct\"}}' "
         f"ELSE {envelope} END"),
        ("topic", f"'{CDC_TOPIC}'"),
        ("partition", "CAST(0 AS INT)"),
        ("offset", "CAST(id AS BIGINT)"),
        ("timestamp", "start_datetime"),
    ]


# ---------------------------------------------------------------------------
# Spark side (DataFrame API via selectExpr — same Catalyst plan as a
# column-object chain, single source of truth with the oracle)

def _apply(df: DataFrame, cols: list[tuple[str, str]]) -> DataFrame:
    return df.selectExpr(*[f"{frag} AS `{name}`" for name, frag in cols])


def employees(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .tables import load_table
    return _apply(load_table(spark, sf_dir, "customer"), _employees_cols(SPARK))


def commute_validations(spark: SparkSession, sf_dir: str) -> DataFrame:
    emp = employees(spark, sf_dir)
    s1 = _apply(emp, _CV_STAGE1)
    return _apply(s1, _cv_cols(SPARK))


def sport_activities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .tables import load_table
    s1 = _apply(load_table(spark, sf_dir, "events"), _SA_STAGE1)
    return _apply(s1, _sa_cols(SPARK))


def cdc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _apply(sport_activities(spark, sf_dir), _cdc_cols(SPARK))


DOMAIN_TABLES = {
    "employees": employees,
    "commute_validations": commute_validations,
    "sport_activities": sport_activities,
    "cdc_events": cdc_events,
}


def register_domain_views(spark: SparkSession, sf_dir: str) -> None:
    for name, fn in DOMAIN_TABLES.items():
        fn(spark, sf_dir).createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# Oracle side (DuckDB CTE prefix over the driver-registered star views)

def _select(cols: list[tuple[str, str]], src: str) -> str:
    exprs = ", ".join(f'{frag} AS "{name}"' for name, frag in cols)
    return f"SELECT {exprs} FROM {src}"


def domain_cte_sql() -> str:
    """``WITH``-clause text defining all four domain tables for DuckDB."""
    d = DUCKDB
    emp = _select(_employees_cols(d), "customer")
    cv1 = _select(_CV_STAGE1, "employees")
    cv = _select(_cv_cols(d), "cv_stage1")
    sa1 = _select(_SA_STAGE1, "events")
    sa = _select(_sa_cols(d), "sa_stage1")
    cdc = _select(_cdc_cols(d), "sport_activities")
    return (
        f"WITH employees AS ({emp}), "
        f"cv_stage1 AS ({cv1}), "
        f"commute_validations AS ({cv}), "
        f"sa_stage1 AS ({sa1}), "
        f"sport_activities AS ({sa}), "
        f"cdc_events AS ({cdc})"
    )


def oracle_with_domain(body_sql: str) -> str:
    """Wrap an oracle query body with the domain CTE prefix, merging the
    WITH-clauses if the body already has its own."""
    body = body_sql.lstrip()
    if body.upper().startswith("WITH "):
        return f"{domain_cte_sql()}, {body[5:]}"
    return f"{domain_cte_sql()} {body}"
