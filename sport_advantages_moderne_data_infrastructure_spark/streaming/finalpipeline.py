"""The COMPOSED reference DAG as ONE continuous streaming job: a
single ``writeStream`` whose one checkpoint coordinates ALL THREE
source change feeds (employees, validations, CDC-parsed activities),
driving every maintained layer — jmv1 (emp ⋈ val), the bucketed
activity aggregate, jmv2 (= the reference's ``final``,
read_delta.py:280-294) and the flagship prime projection
(README.md:140-164) — inside each trigger.

This generalizes ``streaming/joinmv.py``'s two-feed union to the full
four-layer chain (VERDICT r8 #4). The three CDF streams are tagged,
schema-conformed and UNIONED into one query, so a micro-batch carries
every source's row-level changes and one foreachBatch advances the
whole DAG:

1. emp/val rows → ``JoinMaterializedView.apply_change_batch`` (jmv1) —
   each of its three commits (left state, right state, view)
   individually (app_id, batch_id)-replay-guarded;
2. act rows → ``AggMaterializedView.apply_change_batch`` — one guarded
   bucket-granular commit, change-capturing;
3. ``jmv2.refresh(jmv1.view, aggv.view)`` — the layers just committed
   inside THIS trigger are intermediate, not external feeds, so jmv2
   follows them through the batch high-water refresh (per-leg (lv, rv)
   meta, crash-idempotent since r8): it reads exactly the view deltas
   steps 1-2 produced, O(changed buckets);
4. ``prime.refresh(jmv2.view)`` — same discipline.

Exactly-once across a crash ANYWHERE in the trigger: the checkpoint
only advances after foreachBatch returns, so a crash replays the same
batch — steps 1-2 skip their already-applied commits via the ledger,
and steps 3-4 are high-water no-ops when nothing new was produced
(and catch-up refreshes when the crash tore between layers). Do not
mix with batch refreshes of jmv1/aggv on the same tables (ledger vs
``mv_*_version`` bookkeeping); jmv2/prime here use ONLY the batch
high-water path and must not also be fed by separate streams.

Scale shape: per trigger cost is O(batch rows + changed ``__kb``
buckets) at every layer — the chain never rescans a source, and the
single checkpoint means ONE set of stream offsets to operate/monitor
instead of four (the r8 test's four-stream form), with no possibility
of the layers drifting apart across restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.txnlog import TxnTable
from .joinmv import apply_join_mv_stream_batch
from .scd2 import _guarded_commit, _stream_meta

#: union tag column; change-feed frames never carry it
_SIDE = "__side"


def _conform(feed: DataFrame, side: str, keys: list[str],
             own: list, pads: list) -> DataFrame:
    """Tag one source's change feed and pad it to the three-way union
    schema: key, own value columns, the other sources' value columns
    as typed NULLs, ``_change_type``, tag."""
    null_cols = [F.lit(None).cast(f.dataType).alias(f.name)
                 for f in pads]
    return feed.select(
        *[F.col(k) for k in keys],
        *[F.col(f.name) for f in own], *null_cols,
        F.col("_change_type"), F.lit(side).alias(_SIDE))


def write_stream_final_pipeline(spark: SparkSession, emp_path: str,
                                val_path: str, act_path: str,
                                jmv1, aggv, jmv2, prime,
                                checkpoint: str,
                                app_id: str | None = None,
                                available_now: bool = True):
    """Start the whole-DAG maintenance stream; returns the
    StreamingQuery. ``jmv1``/``aggv`` are change-capturing
    (``capture_changes=True``) Join-/AggMaterializedViews over the
    employee/validation and activity feeds; ``jmv2`` is the LEFT-join
    view (= ``final``); ``prime`` the MapMaterializedView serving the
    flagship projection. Read the output with ``prime.read``."""
    from ..sources.txnstream import TxnLogDataSource

    spark.dataSource.register(TxnLogDataSource)
    keys = list(jmv1.keys)
    ef = [f for f in TxnTable(emp_path).read(spark).schema.fields
          if f.name not in keys and f.name != "__kb"]
    vf = [f for f in TxnTable(val_path).read(spark).schema.fields
          if f.name not in keys and f.name != "__kb"]
    af = [f for f in TxnTable(act_path).read(spark).schema.fields
          if f.name not in keys and f.name != "__kb"]
    names = [f.name for f in ef + vf + af]
    if len(set(names)) != len(names):
        raise ValueError(
            "value columns must be distinct across the three sources")

    def _feed(path):
        return (spark.readStream.format("txnlog")
                .option("readChangeFeed", "true").load(path))

    unioned = (
        _conform(_feed(emp_path), "e", keys, ef, vf + af)
        .unionByName(_conform(_feed(val_path), "v", keys, vf, ef + af))
        .unionByName(_conform(_feed(act_path), "a", keys, af, ef + vf)))
    ecols = [f.name for f in ef]
    vcols = [f.name for f in vf]
    acols = [f.name for f in af]

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.persist()
        try:
            # layer 1: emp ⋈ val join view (three guarded legs inside)
            apply_join_mv_stream_batch(
                spark, jmv1,
                batch_df.filter(F.col(_SIDE).isin("e", "v"))
                .withColumn(_SIDE, F.when(F.col(_SIDE) == "e", "l")
                            .otherwise("r")),
                batch_id, app_id, ecols, vcols)
            # layer 2: bucketed activity aggregate (one guarded leg)
            ach = (batch_df.filter(F.col(_SIDE) == "a")
                   .select(*keys, *acols, "_change_type"))
            aggv.apply_change_batch(
                spark, ach,
                _stream_meta(batch_id, app_id, "final_pipe_agg"),
                guard=lambda table, fn: _guarded_commit(
                    table, batch_id, app_id, fn))
            # layers 3-4: intermediate views produced inside THIS
            # trigger — followed via the crash-idempotent batch
            # high-water refresh (reads exactly the deltas above).
            # Empty-activity corner (ADVICE r9): once jmv1 exists,
            # final/prime must materialize even if the activity feed
            # never delivers — the reference's `final` is a LEFT join
            # (employee rows with NULL aggregates, read_delta.py:
            # 280-294) — so an undelivered agg layer is initialized
            # with zero partials and the chain proceeds
            if jmv1.view.latest_version() is not None:
                if aggv.view.latest_version() is None:
                    _guarded_commit(
                        aggv.view, batch_id, app_id,
                        lambda: aggv.initialize_empty(
                            spark, TxnTable(act_path),
                            _stream_meta(batch_id, app_id,
                                         "final_pipe_agg_init")))
                jmv2.refresh(spark, jmv1.view, aggv.view)
                prime.refresh(spark, jmv2.view)
        finally:
            batch_df.unpersist()

    w = (unioned.writeStream.foreachBatch(_apply)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
