"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference CDC lakehouse pipeline
(yanggautier/Sport_Advantages_Moderne_Data_Infrastructure).

Architecture (Spark-first, not a port):

- ``sources/``   — parquet star-schema loaders + deterministic domain-table
                   derivations (employees / commute_validations /
                   sport_activities / cdc_events) shared with the DuckDB
                   oracle via a common SQL-fragment spec.
- ``operators/`` — relational core (agg / join / final-table / prime),
                   CDC envelope parse, data-quality expectations, dedup,
                   similarity search, text analysis, multimodal plumbing.
- ``functions/`` — cross-dialect scalar fragment builders and vector math.
- ``plans/``     — the query catalog: every public query registered with
                   its Spark callable and its DuckDB oracle SQL.
- ``streaming/`` — Structured Streaming wrappers (file/Kafka source, CDC
                   parse, watermarked windows, availableNow test harness).

All logic is designed for a 1000-executor / 100 TB deployment but is
testable on local[*] parquet fixtures: partition-count-aware shuffles,
broadcast dimension joins, AQE on, no driver-side collects in any
operator path.
"""

__version__ = "0.1.0"
