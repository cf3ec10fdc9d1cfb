"""Streaming ANN index maintenance: the IVF inverted lists kept
continuously up to date as embeddings arrive.

The batch path (`operators/ivf.build_ivf_index`) materializes the
assigned corpus partitioned by centroid_id once per corpus snapshot. A
training-data pipeline doesn't get a static corpus — embeddings stream
in with the documents — so this sink maintains the SAME layout
incrementally: each micro-batch is assigned to its nearest centroids
(map-side argmin projection, no shuffle) and appended to a txn table as
``centroid_id=`` partition subdirs, one atomic commit per batch with
the (app_id, batch_id) replay guard the other streaming sinks use.

Scale shape: per-batch cost is O(batch) — assignment is a projection,
the append touches only the batch's partition subdirs, and the commit
is O(1) metadata. Queries read the maintained table exactly like the
batch-built index (partition-pruned probe equi-join); because centroids
are FIXED (trained once on the bounded sample, the IVF contract), the
maintained index is row-identical to a batch rebuild over the same
corpus at every point in time — pinned by tests and the
``stream_ann_index_equiv`` driver row. Centroid drift over a growing
corpus is handled the way production IVF deployments do: periodic
retrain + full rebuild (the batch path), with this sink keeping the
index fresh between rebuilds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import dot_expr
from ..sources.txnlog import TxnTable
from .scd2 import _guarded_commit, _stream_meta


def write_stream_ivf_index(df: DataFrame, index_path: str,
                           centroids: list[list[float]], checkpoint: str,
                           app_id: str | None = None,
                           available_now: bool = True):
    """Start the maintenance sink over ``df`` (a streaming frame with
    vec_id + embedding). Returns the StreamingQuery; read the index
    back with :func:`read_index`."""
    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_batch(TxnTable(index_path), batch_df, centroids,
                     batch_id, app_id)

    w = (df.writeStream.foreachBatch(_ingest)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def _append_partitioned(idx: TxnTable, frame: DataFrame, batch_id: int,
                        app_id: str | None, op: str) -> None:
    """Shared commit leg: write the batch's rows as ``centroid_id=``
    partition subdirs and commit them atomically, cleaning up the
    orphaned dirs if the commit loses a race."""
    import os
    import shutil

    def _leg():
        adds = idx._write_data_partitioned(  # noqa: SLF001
            frame, "centroid_id")
        try:
            idx.commit(adds, [], _stream_meta(batch_id, app_id, op),
                       expected_version=idx.latest_version())
        except Exception:
            for rel in {os.path.dirname(a) for a in adds}:
                shutil.rmtree(os.path.join(idx.path, rel),
                              ignore_errors=True)
            raise

    _guarded_commit(idx, batch_id, app_id, _leg)


def ingest_batch(idx: TxnTable, batch_df: DataFrame,
                 centroids: list[list[float]], batch_id: int,
                 app_id: str | None = None) -> None:
    """One micro-batch's worth of index maintenance — the exact function
    the foreachBatch sink runs, exposed so the driver-gated batch twin
    (``stream_ann_index_equiv``) exercises identical code."""
    from ..operators.ivf import assign_centroids

    assigned = assign_centroids(
        batch_df.select(
            "vec_id", "embedding",
            F.sqrt(F.expr(dot_expr("embedding", "embedding")))
            .alias("e_norm")),
        centroids)
    _append_partitioned(idx, assigned, batch_id, app_id,
                        "ivf_index_append")


def write_stream_ivfpq_index(df: DataFrame, index_path: str,
                             centroids: list[list[float]],
                             codebooks: list[list[list[float]]],
                             checkpoint: str,
                             app_id: str | None = None,
                             available_now: bool = True):
    """Maintain the COMPRESSED index — the one a deployment actually
    serves at scale: each micro-batch is PQ-encoded with the FIXED
    codebooks and appended to the centroid-partitioned code table
    (the `build_ivfpq_index` layout, kept fresh incrementally).
    Codebooks and centroids are both frozen training artifacts, so the
    maintained code table is row-identical to a batch re-encode at
    every point in time; drift is handled by periodic retrain+rebuild,
    exactly as for the raw-embedding sink above."""
    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_batch_pq(TxnTable(index_path), batch_df, centroids,
                        codebooks, batch_id, app_id)

    w = (df.writeStream.foreachBatch(_ingest)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def ingest_batch_pq(idx: TxnTable, batch_df: DataFrame,
                    centroids: list[list[float]],
                    codebooks: list[list[list[float]]], batch_id: int,
                    app_id: str | None = None) -> None:
    """One micro-batch of compressed-index maintenance: centroid
    assignment and PQ encoding compose as ONE map-side projection (the
    assignment column rides through ``pq_encode(keep=...)`` — no
    re-join on vec_id, no shuffle), then the same atomic partitioned
    append as the raw sink. Per-batch cost is O(batch)."""
    from ..operators.ivf import assign_centroids
    from ..operators.pq import pq_encode

    assigned = assign_centroids(
        batch_df.select("vec_id", "embedding"), centroids)
    coded = pq_encode(assigned, codebooks, keep=("centroid_id",))
    _append_partitioned(idx, coded, batch_id, app_id,
                        "ivfpq_index_append")


def read_index(spark: SparkSession, index_path: str) -> DataFrame:
    """The maintained inverted lists — drop-in for the ``assigned``
    frame `ivf_topk` takes (vec_id, embedding, e_norm, centroid_id),
    or for the ``codes_index`` frame `ivfpq_topk` takes when the table
    was maintained by the PQ sink."""
    return TxnTable(index_path).read(spark)
