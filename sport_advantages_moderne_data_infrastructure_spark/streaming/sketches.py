"""Streaming Misra-Gries maintenance: the heavy-hitter sketch kept
continuously up to date as events arrive — the frequency-sketch twin
of the streaming index sinks (annindex.py IVF r6 / IVF-PQ r7, bm25.py
r8), extending "every index artifact has a streaming twin" to sketch
artifacts. MG summaries are mergeable (Agarwal et al. 2012), so the
persisted sketch is just a bounded materialized view of the event
stream: per micro-batch, merge the batch's own MG sketch into the
stored counters and truncate back to k — O(batch) work, <= k rows of
state, regardless of how much history has streamed through.

Per micro-batch (the foreachBatch sink and the driver-gated batch twin
``stream_heavy_hitters_equiv`` run the SAME ``ingest_batch``):

- events leg: append the batch's key column to the events table,
  replay-guarded; the running row count ACCUMULATES in commit meta
  (``mg_n_rows``), so the sketch-only serving path gets n in O(1).
- sketch leg: fold the events CHANGE FEED since the sketch's recorded
  high-water into the stored sketch (batch MG sketch -> pointwise sum
  -> one truncation) and atomically overwrite the <= k-row sketch
  table. Reading the feed (not the batch frame) gives the join-MV
  crash discipline for free: a crash between legs leaves the events
  table ahead, and the next batch's feed covers both batches.

Serving:

- :func:`heavy_hitters_served` — EXACT: the stored sketch proposes
  candidates, one bounded aggregation over the accumulated events
  counts them exactly (operators/sketches.exact_pass). Row-identical
  to the batch two-pass at every point in time (the gate's contract).
- :func:`sketch_estimates` — APPROXIMATE, O(1) data touched: the
  stored counters themselves, each within [true - n/(k+1), true]
  by the mergeability bound (pinned in tests/test_sketches.py).

Reference context: the reference's only streaming aggregate is a
console row counter (spark/SaveDelta.scala:104-163); this is the
SURVEY §2 extension class — frequency analytics a 100 TB event
stream needs without a full key-column shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mv import _last_meta_with
from ..operators.sketches import (exact_pass, grouped_exact_pass,
                                  grouped_mg_merge, grouped_mg_partial,
                                  mg_merge, mg_partial)
from ..sources.txnlog import TxnTable
from .scd2 import _guarded_commit, _stream_meta


def _tables(root: str) -> tuple[TxnTable, TxnTable]:
    return TxnTable(root + "/events"), TxnTable(root + "/sketch")


def ingest_batch(events: TxnTable, sketch: TxnTable,
                 batch_df: DataFrame, batch_id: int, col: str, k: int,
                 app_id: str | None = None) -> None:
    """One micro-batch of sketch maintenance (see module doc). Two
    legs, each individually (app_id, batch_id) replay-guarded."""
    spark = batch_df.sparkSession

    def _events_leg():
        prev = (_last_meta_with(events, "mg_n_rows")
                if events.latest_version() is not None else {})
        meta = _stream_meta(batch_id, app_id, "mg_events_append")
        meta["mg_n_rows"] = (prev.get("mg_n_rows", 0)
                             + batch_df.count())
        rel = events._write_data(batch_df.select(col))  # noqa: SLF001
        events.commit([rel], [], meta,
                      expected_version=events.latest_version())

    _guarded_commit(events, batch_id, app_id, _events_leg)

    # sketch leg: fold the events feed since the sketch's high-water.
    # On replay the guard skips; on crash-between-legs the next
    # batch's feed covers the gap (the bm25 df-leg discipline).
    sv = events.latest_version()
    last = (_last_meta_with(sketch, "mg_source_version")
            .get("mg_source_version", -1)
            if sketch.latest_version() is not None else -1)
    if sv > last:
        ch = (events.read_changes(spark, since_version=last, upto=sv)
              .filter(F.col("_change_type") == "insert"))
        fresh = mg_partial(ch.select(col), col, k)
        if sketch.latest_version() is not None:
            fresh = fresh.unionByName(sketch.read(spark))
        merged = mg_merge(fresh, col, k)

        def _sketch_leg():
            meta = _stream_meta(batch_id, app_id, "mg_sketch_merge")
            meta["mg_source_version"] = sv
            meta["mg_k"] = k
            sketch.overwrite(merged, meta)

        _guarded_commit(sketch, batch_id, app_id, _sketch_leg)


def ingest_batch_grouped(events: TxnTable, sketch: TxnTable,
                         batch_df: DataFrame, batch_id: int,
                         group_col: str, col: str, k: int,
                         app_id: str | None = None) -> None:
    """Grouped micro-batch maintenance — :func:`ingest_batch` with one
    k-counter sketch PER GROUP (the streaming twin of
    grouped_heavy_hitters_exact, pairing with the grouped quantile
    twin): events leg appends (group, value), sketch leg folds the
    feed since its high-water through grouped_mg_partial +
    grouped_mg_merge. State is <= n_groups x k rows (the
    low-cardinality-group contract); both legs replay-guarded with
    the same crash-between-legs feed coverage as the flat path."""
    spark = batch_df.sparkSession

    def _events_leg():
        meta = _stream_meta(batch_id, app_id, "gmg_events_append")
        rel = events._write_data(  # noqa: SLF001
            batch_df.select(group_col, col))
        events.commit([rel], [], meta,
                      expected_version=events.latest_version())

    _guarded_commit(events, batch_id, app_id, _events_leg)

    sv = events.latest_version()
    last = (_last_meta_with(sketch, "mg_source_version")
            .get("mg_source_version", -1)
            if sketch.latest_version() is not None else -1)
    if sv > last:
        ch = (events.read_changes(spark, since_version=last, upto=sv)
              .filter(F.col("_change_type") == "insert"))
        fresh = grouped_mg_partial(ch.select(group_col, col),
                                   group_col, col, k)
        if sketch.latest_version() is not None:
            fresh = fresh.unionByName(sketch.read(spark))
        merged = grouped_mg_merge(fresh, group_col, col, k)

        def _sketch_leg():
            meta = _stream_meta(batch_id, app_id, "gmg_sketch_merge")
            meta["mg_source_version"] = sv
            meta["mg_k"] = k
            sketch.overwrite(merged, meta)

        _guarded_commit(sketch, batch_id, app_id, _sketch_leg)


def write_stream_grouped_mg_sketch(df: DataFrame, root: str,
                                   checkpoint: str, group_col: str,
                                   col: str, phi: float,
                                   app_id: str | None = None,
                                   available_now: bool = True):
    """Start the grouped maintenance sink; serve with
    :func:`grouped_heavy_hitters_served`."""
    events, sketch = _tables(root)
    k = math.ceil(1.0 / phi)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_batch_grouped(events, sketch, batch_df, batch_id,
                             group_col, col, k, app_id)

    w = (df.writeStream.foreachBatch(_ingest)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def compact_if_needed(spark: SparkSession, root: str,
                      max_live_dirs: int = 32) -> int | None:
    """Scheduled maintenance (the quantiles/splits/CC policy
    discipline): the events table accretes one dir per appending
    micro-batch; fold it through ``TxnTable.compact_if_needed`` — the
    sketch leg's change-feed fold is unaffected because
    ``read_changes`` skips compaction commits as layout-only, so
    ingest continues straight across a fold. The <= k-row (or
    <= n_groups x k) sketch table never needs it. Vacuum afterwards
    with ``retain_from_version=<the sketch's mg_source_version>`` so
    the pinned serve stays readable. Returns the compaction commit
    version, or None below the threshold."""
    events, _ = _tables(root)
    if events.latest_version() is None:
        return None
    return events.compact_if_needed(spark, max_live_dirs=max_live_dirs)


def _pinned_pair(spark: SparkSession, root: str):
    """(events_df, sketch_df) as a CONSISTENT snapshot: events read AT
    the version the stored sketch was folded from (time travel). The
    two tables commit in separate legs, so reading both at latest
    would let an ingest land between the reads — a stale sketch
    counted against fresher events can MISS a just-arrived heavy
    hitter, breaking the candidate-superset guarantee the exact pass
    rests on. Pinning trades freshness (answers as of the sketch's
    high-water) for that guarantee; requires the pinned version's
    files to be retained (the time-travel contract)."""
    from ..operators.mv import _last_meta_version_with

    events, sketch = _tables(root)
    if sketch.latest_version() is None:
        raise ValueError(f"no maintained sketch under {root}")
    meta, kv = _last_meta_version_with(sketch, "mg_source_version")
    if "mg_source_version" not in meta:
        raise ValueError(f"sketch under {root} records no source version")
    sv = int(meta["mg_source_version"])
    # the sketch read pins at the commit its meta came from — a fold
    # landing between the meta read and this read must not pair a
    # fresher sketch with events pinned at the stale source version
    return events.read(spark, version=sv), sketch.read(spark, version=kv)


def grouped_heavy_hitters_served(spark: SparkSession, root: str,
                                 group_col: str, col: str,
                                 phi: float) -> DataFrame:
    """EXACT per-group heavy hitters from a maintained grouped-sketch
    root: the stored <= n_groups x k sketch proposes, one bounded
    grouped aggregation over the accumulated events — read at the
    sketch's recorded source version (:func:`_pinned_pair`) — counts
    exactly. Returns (group_col, col, cnt, share)."""
    events_df, sketch_df = _pinned_pair(spark, root)
    return grouped_exact_pass(events_df, sketch_df,
                              group_col, col, phi)


def write_stream_mg_sketch(df: DataFrame, root: str, checkpoint: str,
                           col: str, phi: float,
                           app_id: str | None = None,
                           available_now: bool = True):
    """Start the maintenance sink over ``df`` (a streaming frame
    containing ``col``). k = ceil(1/phi) counters. Returns the
    StreamingQuery; serve with :func:`heavy_hitters_served`."""
    events, sketch = _tables(root)
    k = math.ceil(1.0 / phi)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_batch(events, sketch, batch_df, batch_id, col, k,
                     app_id)

    w = (df.writeStream.foreachBatch(_ingest)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def heavy_hitters_served(spark: SparkSession, root: str, col: str,
                         phi: float) -> DataFrame:
    """EXACT heavy hitters from a maintained sketch root: the stored
    <= k-row sketch proposes, one bounded aggregation over the
    accumulated events — read at the sketch's recorded source version
    (:func:`_pinned_pair`) — counts exactly. Returns
    (col, cnt, share)."""
    events_df, sketch_df = _pinned_pair(spark, root)
    return exact_pass(events_df, sketch_df, col, phi)


def sketch_estimates(spark: SparkSession, root: str) -> tuple[DataFrame, int]:
    """(stored sketch frame, accumulated n) — the O(1) approximate
    serving path: weights are within [true - n/(k+1), true]; n comes
    from the events commit meta AT the sketch's recorded source
    version (not latest — the error bound pairs each counter with the
    n it was folded against), never a scan."""
    events, sketch = _tables(root)
    if sketch.latest_version() is None:
        raise ValueError(f"no maintained sketch under {root}")
    from ..operators.mv import _last_meta_version_with

    kmeta, kv = _last_meta_version_with(sketch, "mg_source_version")
    sv = int(kmeta["mg_source_version"])
    v = sv
    while v >= 0:  # newest events commit at/before the fold version
        meta = events._doc(v).get("meta", {})  # noqa: SLF001
        if "mg_n_rows" in meta:
            # pinned at the meta's own commit: a fold between the two
            # reads must not pair a fresher sketch with the stale n
            return sketch.read(spark, version=kv), int(meta["mg_n_rows"])
        v -= 1
    raise ValueError(f"no mg_n_rows recorded at/before version {sv}")
