"""Streaming data-quality quarantine (dead-letter routing).

The reference runs its Great-Expectations suite as a BATCH DAG after
load (airflow/dags/data_validation_dag.py:297-328) — bad rows land in
the table first and are found later. This module moves the same
declarative rules (operators/quality.rules_from_config shape) into the
streaming ingest path: every micro-batch is split row-wise into clean
rows → the target table and violating rows → a quarantine table, each
violating row annotated with WHICH expectations it failed. Both legs
are transactional txn tables with the txn-append replay guard, so the
split is exactly-once end-to-end:

- per-table guards: each table independently skips a batch id it has
  already committed, so a crash BETWEEN the two commits replays the
  batch and re-commits only the missing leg — same idempotent-replay
  argument as streaming/dedup.py's corpus-then-index ordering;
- the violation tagging is a pure projection (one ``filter`` over an
  array of (name, failed) structs — no UDF, no shuffle), so the split
  adds zero exchanges to the micro-batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def violations_col(rules: list[tuple[str, str]]):
    """Array<string> of the rule names the row violates — pure
    projection over (name, predicate) pairs in the shared Spark/DuckDB
    SQL subset (same rule shape as operators/quality.run_suite)."""
    structs = [
        F.struct(F.lit(name).alias("name"),
                 F.expr(f"CASE WHEN {pred} THEN true ELSE false END")
                 .alias("failed"))
        for name, pred in rules
    ]
    arr = F.array(*structs)
    return F.transform(F.filter(arr, lambda x: x["failed"]),
                       lambda x: x["name"])


def split_quarantine(df: DataFrame, rules: list[tuple[str, str]]
                     ) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): quarantined carries a ``violations``
    array column naming every failed expectation; clean rows drop it."""
    tagged = df.withColumn("violations", violations_col(rules))
    clean = tagged.filter(F.size("violations") == 0).drop("violations")
    bad = tagged.filter(F.size("violations") > 0)
    return clean, bad


def write_stream_quarantine(df: DataFrame, rules: list[tuple[str, str]],
                            target: str, quarantine: str, checkpoint: str,
                            app_id: str | None = None,
                            available_now: bool = True):
    """Exactly-once streaming ingest with row-level quality routing:
    clean rows append to ``target``, violating rows (tagged with their
    failed expectations, serialized to a CSV string for a stable
    parquet schema) append to ``quarantine``. Each leg is one atomic
    txn commit guarded by (app_id, batch_id) — replay after any crash
    re-commits only the leg that is missing."""
    import os
    import shutil as _shutil

    from ..sources.txnlog import TxnConflictError, TxnTable

    def _append_leg(path: str, batch_df: DataFrame, batch_id: int) -> None:
        table = TxnTable(path)
        seen = table.max_stream_batch_id(app_id)
        if seen is not None and batch_id <= seen:
            return  # this leg already committed this batch
        rel = table._write_data(batch_df)  # noqa: SLF001
        meta = {"stream_batch_id": batch_id,
                "operation": "stream_quarantine_append"}
        if app_id is not None:
            meta["stream_app_id"] = app_id
        for _ in range(5):
            try:
                table.commit([rel], [], meta)
                table.checkpoint_if_needed()
                return
            except TxnConflictError:
                if (table.max_stream_batch_id(app_id) or -1) >= batch_id:
                    _shutil.rmtree(os.path.join(path, rel),
                                   ignore_errors=True)
                    return
        table.commit([rel], [], meta)
        table.checkpoint_if_needed()

    def _route(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.persist()
        try:
            clean, bad = split_quarantine(batch_df, rules)
            _append_leg(target, clean, batch_id)
            _append_leg(
                quarantine,
                bad.withColumn("violations",
                               F.array_join("violations", ",")),
                batch_id)
        finally:
            batch_df.unpersist()

    w = (df.writeStream.foreachBatch(_route)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
