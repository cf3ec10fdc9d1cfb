"""Debezium CDC envelope parsing — the idiomatic replacement of the
reference's 7× get_json_object + cast chain (spark/SaveDelta.scala:134-149).

One ``from_json`` with a nested StructType instead of seven JSONPath probes:
a single JSON parse per record, fully inside whole-stage codegen, and
malformed/tombstone frames degrade to NULL structs that the ``id IS NOT
NULL`` filter drops — exactly the reference's semantics (SaveDelta.scala:149)
without per-field error handling.

Works identically on a batch DataFrame (oracle-testable) and on a streaming
DataFrame from the Kafka/file source (streaming/pipeline.py) — same function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Debezium payload.after for sport_activities (init-db.sql:38-49; Spark-side
# declared schema at spark/SaveDelta.scala:87-95). start_datetime arrives as
# Debezium MicroTimestamp = int64 µs since epoch.
AFTER_SCHEMA = T.StructType([
    T.StructField("id", T.IntegerType()),
    T.StructField("id_employee", T.IntegerType()),
    T.StructField("first_name", T.StringType()),
    T.StructField("last_name", T.StringType()),
    T.StructField("start_datetime", T.LongType()),
    T.StructField("sport_type", T.StringType()),
    T.StructField("distance", T.IntegerType()),
    T.StructField("activity_duration", T.IntegerType()),
    T.StructField("comment", T.StringType()),
])

ENVELOPE_SCHEMA = T.StructType([
    T.StructField("payload", T.StructType([
        T.StructField("before", AFTER_SCHEMA),
        T.StructField("after", AFTER_SCHEMA),
        T.StructField("op", T.StringType()),
    ])),
])


def parse_cdc(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka-record frame (binary-or-string key/value) → typed activity rows.

    Replaces spark/SaveDelta.scala:134-149 (P1, P2, F1, F2, F3, P5).
    """
    # explode(array(env)) is a semantic no-op (one row in, one row out,
    # NULL passes through) whose Generate node blocks filter pushdown:
    # without it Catalyst pushes the ``id IS NOT NULL`` predicate below
    # the projection by SUBSTITUTING the whole from_json expression into
    # the filter, so every record paid the JSON parse twice — once in the
    # pushed filter, once in the surviving-row projection (the guide §4.4
    # duplicated-expensive-expression shape, with from_json in place of a
    # UDF). One parse per record now, batch and streaming alike.
    env = F.from_json(F.col(value_col).cast("string"), ENVELOPE_SCHEMA)
    after = (
        raw.select(F.explode(F.array(env)).alias("env"))
        .select("env.payload.after.*")
    )
    return (
        after
        .withColumn("start_datetime", F.timestamp_micros(F.col("start_datetime")))
        .filter(F.col("id").isNotNull())
    )


def oracle_parse_cdc_sql() -> str:
    """DuckDB equivalent over the ``cdc_events`` CTE (json_extract_string
    returns NULL for missing paths / NULL input — mirrors from_json)."""
    g = "value->>'$.payload.after.{f}'"
    def x(f: str, cast: str) -> str:
        return f"CAST({g.format(f=f)} AS {cast}) AS {f}"
    return (
        "SELECT "
        + ", ".join([
            x("id", "INT"),
            x("id_employee", "INT"),
            x("first_name", "STRING"),
            x("last_name", "STRING"),
            f"make_timestamp(CAST({g.format(f='start_datetime')} AS BIGINT)) AS start_datetime",
            x("sport_type", "STRING"),
            x("distance", "INT"),
            x("activity_duration", "INT"),
            x("comment", "STRING"),
        ])
        + " FROM cdc_events WHERE CAST(value->>'$.payload.after.id' AS INT) IS NOT NULL"
    )
