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


def _txn_append_leg(path: str, batch_df: DataFrame, batch_id: int,
                    app_id: str | None,
                    op: str = "stream_quarantine_append") -> None:
    """One replay-guarded txn append — the per-table leg both routing
    sinks share (quality quarantine and the decontamination gate): a
    crash between a batch's two legs replays the batch and re-commits
    only the missing one."""
    import os
    import shutil as _shutil

    from ..sources.txnlog import TxnConflictError, TxnTable

    table = TxnTable(path)
    seen = table.max_stream_batch_id(app_id)
    if seen is not None and batch_id <= seen:
        return  # this leg already committed this batch
    meta = {"stream_batch_id": batch_id, "operation": op}
    if app_id is not None:
        meta["stream_app_id"] = app_id
    if table.generation_config():
        # generated/identity/partition-declared target: route through
        # append() so the writer computes/allocates/lays out inside
        # the same commit (a raw _write_data here would bypass
        # generation and strand rows outside a declared partition
        # layout); same-batch replica races are absorbed via the
        # in-commit ledger raise + the shared None-safe re-check
        from .scd2 import _routed_append

        _routed_append(table, batch_df, batch_id, app_id, meta)
        return
    rel = table._write_data(batch_df)  # noqa: SLF001
    for _ in range(5):
        try:
            table.commit([rel], [], meta)
            table.checkpoint_if_needed()
            return
        except TxnConflictError:
            from .scd2 import _ledger_seen
            if _ledger_seen(table, app_id, batch_id):
                _shutil.rmtree(os.path.join(path, rel),
                               ignore_errors=True)
                return
    table.commit([rel], [], meta)
    table.checkpoint_if_needed()


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

    def _append_leg(path: str, batch_df: DataFrame, batch_id: int) -> None:
        _txn_append_leg(path, batch_df, batch_id, app_id)

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


# --- decontamination at ingest (r11): the eval-overlap gate ---------------


def contamination_hits(batch_docs: DataFrame, eval_hashes: DataFrame,
                       min_shared: int = 2) -> DataFrame:
    """(doc_id, eval_id, n_shared) for batch documents sharing at
    least ``min_shared`` distinct word shingles with an eval document
    — the plans/textops.eval_contamination rule applied to ONE batch:
    shingle the batch (O(batch)), equi-join the broadcast eval hash
    set, one (doc, eval) rollup. ``eval_hashes`` is a materialized
    (doc_id, h) artifact (operators/dedup.word_shingle_hashes over the
    benchmark set) — fixed and tiny, the FAISS-centroid discipline:
    frozen at sink construction, broadcast per batch."""
    from ..operators import dedup as DD

    sh = DD.word_shingle_hashes(batch_docs)
    ev = eval_hashes.select(F.col("doc_id").alias("eval_id"), "h")
    return (sh.join(F.broadcast(ev), "h")
            .groupBy("doc_id", "eval_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


def write_stream_decontaminate(df: DataFrame, eval_hashes: DataFrame,
                               target: str, quarantine: str,
                               checkpoint: str,
                               app_id: str | None = None,
                               min_shared: int = 2,
                               available_now: bool = True):
    """Decontamination AT INGEST: instead of sweeping the corpus after
    the fact (plans/textops.eval_contamination), every arriving batch
    is checked against the frozen eval shingle set and contaminated
    documents are dead-lettered — clean rows append to ``target``,
    flagged rows to ``quarantine`` annotated with their worst hit
    (eval_id, n_shared). Same two replay-guarded legs as the quality
    quarantine sink, so routing is exactly-once across restarts; the
    admitted corpus is contamination-free BY CONSTRUCTION at every
    point in time, which is the production property (a post-hoc sweep
    leaves a window where training reads tainted docs)."""

    def _route(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.persist()
        try:
            hits = contamination_hits(batch_df, eval_hashes,
                                      min_shared)
            worst = (hits.groupBy("doc_id")
                     .agg(F.max(F.struct("n_shared", "eval_id"))
                          .alias("w"))
                     .select("doc_id",
                             F.col("w.eval_id").alias("eval_id"),
                             F.col("w.n_shared").alias("n_shared")))
            tagged = batch_df.join(F.broadcast(worst), "doc_id",
                                   "left")
            clean = (tagged.filter(F.col("n_shared").isNull())
                     .drop("eval_id", "n_shared"))
            bad = tagged.filter(F.col("n_shared").isNotNull())
            _txn_append_leg(target, clean, batch_id, app_id,
                            op="stream_decontaminate_append")
            _txn_append_leg(quarantine, bad, batch_id, app_id,
                            op="stream_decontaminate_append")
        finally:
            batch_df.unpersist()

    w = (df.writeStream.foreachBatch(_route)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
