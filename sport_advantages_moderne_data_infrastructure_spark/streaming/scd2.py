"""Incremental SCD2 dimension maintenance over a change stream.

Batch-side, ``plans/core.scd2_runs`` derives the type-2 dimension in one
keyed window pass. This module keeps that dimension CONTINUOUSLY
maintained while events stream in — the lakehouse pattern the
reference's append-only landing table (spark/SaveDelta.scala:157-163)
leaves to a nightly rebuild:

- **raw leg**: every micro-batch appends atomically to an append-only
  raw txn table (the replayable system of record), guarded by
  (app_id, batch_id) so crash-replay never double-lands a batch;
- **dim leg**: the dimension txn table is partitioned by
  ``key_bucket = key % N``. Each batch recomputes SCD2 runs ONLY for
  the buckets its keys touch — read raw restricted to those buckets
  (partition-pruned), re-run the keyed window, atomically
  ``overwrite_partitions`` just those buckets. Cost per batch is
  O(history of affected buckets), never O(table); the affected-bucket
  set collected to the driver is ≤ N values regardless of batch size.

Because the dim leg recomputes from RAW (not from the collapsed
dimension state), the maintained table equals the batch derivation for
ANY arrival order — late events that retroactively split a run are
handled exactly, with no watermark caveat. Both legs carry independent
replay guards: a crash between them re-commits only the missing leg.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.txnlog import TxnConflictError, TxnTable


def _guarded_commit(table: TxnTable, batch_id: int, app_id: str | None,
                    attempt) -> None:
    """Run ``attempt()`` (which must raise TxnConflictError on a lost
    commit race) unless the (app_id, batch_id) guard says this leg
    already committed; re-check the guard after every lost race."""
    seen = (table.max_stream_batch_id(app_id)
            if table.latest_version() is not None else None)
    if seen is not None and batch_id <= seen:
        return
    for _ in range(5):
        try:
            attempt()
            table.checkpoint_if_needed()
            return
        except TxnConflictError:
            if (table.max_stream_batch_id(app_id) or -1) >= batch_id:
                return
    attempt()
    table.checkpoint_if_needed()


def _stream_meta(batch_id: int, app_id: str | None, operation: str) -> dict:
    meta = {"stream_batch_id": batch_id, "operation": operation}
    if app_id is not None:
        meta["stream_app_id"] = app_id
    return meta


def write_stream_scd2(df: DataFrame, raw_path: str, dim_path: str,
                      checkpoint: str, key: str, attr: str, ts: str,
                      tie: str, n_buckets: int = 32,
                      app_id: str | None = None,
                      available_now: bool = True):
    """Start the two-leg SCD2 maintenance sink over ``df`` (a streaming
    frame carrying at least the key/attr/ts/tie columns). Returns the
    StreamingQuery. Read the dimension back with :func:`read_dim`."""
    from ..plans.core import scd2_runs

    bucket = (F.col(key) % n_buckets).cast("int")

    def _maintain(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.persist()
        try:
            spark = batch_df.sparkSession
            raw = TxnTable(raw_path)

            def _raw_leg():
                rel = raw._write_data(batch_df)  # noqa: SLF001
                try:
                    raw.commit([rel], [],
                               _stream_meta(batch_id, app_id,
                                            "scd2_raw_append"),
                               expected_version=raw.latest_version())
                except TxnConflictError:
                    shutil.rmtree(os.path.join(raw_path, rel),
                                  ignore_errors=True)
                    raise

            _guarded_commit(raw, batch_id, app_id, _raw_leg)

            dim = TxnTable(dim_path)
            affected = sorted(
                r[0] for r in
                batch_df.select(bucket.alias("b")).distinct().collect())
            full = raw.read(spark)
            hist = (full.select(key, attr, ts, tie)
                    .filter(bucket.isin(affected)))
            rows = (scd2_runs(hist, key=key, attr=attr, ts=ts, tie=tie)
                    .withColumn("key_bucket", bucket))

            def _dim_leg():
                dim.overwrite_partitions(
                    rows, "key_bucket",
                    _stream_meta(batch_id, app_id, "scd2_dim_maintain"))

            _guarded_commit(dim, batch_id, app_id, _dim_leg)
        finally:
            batch_df.unpersist()

    w = (df.writeStream.foreachBatch(_maintain)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_dim(spark: SparkSession, dim_path: str) -> DataFrame:
    """The maintained dimension, minus the physical bucketing column."""
    return TxnTable(dim_path).read(spark).drop("key_bucket")
