"""Continuously-maintained materialized view: the batch refresh of
``operators/mv.py`` turned into a Structured Streaming job over the
``format("txnlog")`` change-feed source.

The composition is the point: the CDF stream delivers row-level changes
(inserts, update pre/postimages, deletes with ``_commit_version``)
exactly-once via version offsets, ``agg_delta_from_changes`` turns each
micro-batch into signed per-group deltas, and the view txn table
absorbs them as one guarded atomic commit per batch. The view is never
more than one trigger behind the source, each trigger costs O(changed
rows) + O(groups), and a crash replays only unapplied batches (the
(app_id, batch_id) guard skips applied ones — the same exactly-once
contract as every other sink in this package).

A full overwrite or compaction on the source has no row-level delta;
the CDF source fails the stream there by design (Delta's rule) —
restart the view from a batch ``maintain_agg_view`` resync, then resume
streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.mv import apply_delta
from ..sources.txnlog import TxnTable, agg_delta_from_changes
from .scd2 import _guarded_commit, _stream_meta


def write_stream_agg_view(spark: SparkSession, source_path: str,
                          view_path: str, checkpoint: str,
                          group_cols: list[str], value_col: str,
                          app_id: str | None = None,
                          available_now: bool = True):
    """Start the view-maintenance stream; returns the StreamingQuery.
    Read the view with ``operators.mv.read_agg_view``."""
    from ..sources.txnstream import TxnLogDataSource

    spark.dataSource.register(TxnLogDataSource)
    feed = (spark.readStream.format("txnlog")
            .option("readChangeFeed", "true").load(source_path))

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.persist()
        try:
            view = TxnTable(view_path)
            delta = agg_delta_from_changes(batch_df, group_cols, value_col)

            def _leg():
                view.overwrite(
                    apply_delta(spark, view, delta, group_cols),
                    _stream_meta(batch_id, app_id, "mv_stream_refresh"))

            _guarded_commit(view, batch_id, app_id, _leg)
        finally:
            batch_df.unpersist()

    w = (feed.writeStream.foreachBatch(_apply)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
