"""Streaming BM25 index maintenance: the postings/df/scalars triple
(plans/textops.bm25_index) kept continuously up to date as documents
arrive — the text-retrieval twin of the streaming ANN index sinks
(annindex.py), completing "every index artifact has a streaming twin".

Per micro-batch (documents arrive WHOLE — a doc never spans batches,
the file/Kafka-source contract the other document streams share):

- postings: tokenize the BATCH only (O(batch) — the corpus is never
  re-tokenized), attach batch-local per-doc lengths, append atomically
  with the (app_id, batch_id) replay guard. The two corpus scalars
  (n_docs, total token length -> avgdl) ACCUMULATE in the commit meta,
  so reading them back is O(1) log inspection, never a corpus scan.
- df: maintained as a bucketed ``AggMaterializedView`` over the
  postings table's change feed — postings rows are distinct per
  (doc_id, tok), so the view's ``cnt`` partial IS the document
  frequency; each batch touches only the affected ``__kb`` buckets
  (O(batch vocabulary), never O(corpus vocabulary)).

Because tokenization is a pure per-doc projection and df/scalars are
associative rollups, the maintained index is row-identical to a batch
rebuild over the same corpus at every point in time — pinned by the
``stream_bm25_index_equiv`` driver row and the restart test
(tests/test_retrieval.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mv import (AggMaterializedView, _last_meta_version_with,
                            _last_meta_with)
from ..sources.txnlog import TxnTable
from .scd2 import _guarded_commit, _stream_meta


def make_df_view(index_root: str, n_buckets: int = 32,
                 ) -> AggMaterializedView:
    """The df side of a maintained index rooted at ``index_root``."""
    return AggMaterializedView(index_root + "/df_view", "tok",
                               value_col="tf", n_buckets=n_buckets)


def ingest_batch(postings: TxnTable, df_view: AggMaterializedView,
                 batch_docs: DataFrame, batch_id: int,
                 app_id: str | None = None) -> None:
    """One micro-batch of index maintenance — the exact function the
    foreachBatch sink runs, exposed so the driver-gated batch twin
    (``stream_bm25_index_equiv``) exercises identical code. Two legs,
    each individually replay-guarded (the join-MV per-leg ledger
    discipline): postings append, then the df view consumes the
    postings change feed up to the version that append produced."""
    from ..operators import retrieval as R

    post = R.postings_frame(batch_docs)
    post.persist()
    try:
        row = (post.select("doc_id", "dl").distinct()
               .agg(F.count(F.lit(1)), F.sum("dl")).first())
        b_docs, b_len = int(row[0]), int(row[1] or 0)

        def _postings_leg():
            prev = (_last_meta_with(postings, "bm25_n_docs")
                    if postings.latest_version() is not None else {})
            meta = _stream_meta(batch_id, app_id,
                                "bm25_postings_append")
            meta["bm25_n_docs"] = prev.get("bm25_n_docs", 0) + b_docs
            meta["bm25_total_len"] = (prev.get("bm25_total_len", 0)
                                      + b_len)
            rel = postings._write_data(post)  # noqa: SLF001
            postings.commit([rel], [], meta,
                            expected_version=postings.latest_version())

        _guarded_commit(postings, batch_id, app_id, _postings_leg)

        # df leg: fold the postings feed into the bucketed view. The
        # change rows since the view's high-water are exactly this
        # batch's inserts (single-writer stream) — on replay the guard
        # skips the commit, on crash-between-legs the next batch's
        # feed covers both.
        sv = postings.latest_version()
        last = (_last_meta_with(df_view.view, "mv_source_version")
                .get("mv_source_version", -1)
                if df_view.view.latest_version() is not None else -1)
        if sv > last:
            ch = postings.read_changes(
                batch_docs.sparkSession, since_version=last, upto=sv)
            df_view.apply_change_batch(
                batch_docs.sparkSession, ch,
                {**_stream_meta(batch_id, app_id, "bm25_df_refresh"),
                 "mv_source_version": sv},
                guard=lambda table, fn: _guarded_commit(
                    table, batch_id, app_id, fn))
    finally:
        post.unpersist()


def write_stream_bm25_index(df: DataFrame, index_root: str,
                            checkpoint: str,
                            app_id: str | None = None,
                            n_buckets: int = 32,
                            available_now: bool = True):
    """Start the maintenance sink over ``df`` (a streaming frame with
    doc_id + text). Returns the StreamingQuery; read the index back
    with :func:`read_bm25_index`."""
    postings = TxnTable(index_root + "/postings")
    df_view = make_df_view(index_root, n_buckets)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_batch(postings, df_view, batch_df, batch_id, app_id)

    w = (df.writeStream.foreachBatch(_ingest)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def compact_if_needed(spark: SparkSession, index_root: str,
                      max_live_dirs: int = 32) -> int | None:
    """Scheduled maintenance (the quantiles/splits/CC policy
    discipline): the postings table accretes one dir per appending
    micro-batch; fold it through ``TxnTable.compact_if_needed`` — the
    df view's change-feed fold is unaffected because ``read_changes``
    skips compaction commits as layout-only. Vacuum afterwards with
    ``retain_from_version=<the df view's mv_source_version>`` so the
    pinned :func:`read_bm25_index` stays readable. Returns the
    compaction commit version, or None below the threshold."""
    postings = TxnTable(index_root + "/postings")
    if postings.latest_version() is None:
        return None
    return postings.compact_if_needed(spark,
                                      max_live_dirs=max_live_dirs)


def read_bm25_index(spark: SparkSession, index_root: str,
                    n_buckets: int = 32):
    """(postings, df, n_docs, avgdl) from a maintained index — the same
    quadruple ``plans/textops.bm25_index`` returns for the batch build,
    so ``operators/retrieval.bm25_topk`` serves from either. The
    quadruple is a CONSISTENT snapshot (the r10 serve-pinning
    discipline shared with streaming/sketches.py): postings are read
    AT the df view's recorded fold version, and the corpus scalars
    come from the postings commit meta at/before it — an ingest
    landing between the serve's reads can never pair fresher postings
    (whose new tokens would be unscored and whose n_docs/avgdl would
    be ahead) with a stale df view. Scalars stay O(1), no corpus
    scan."""
    postings = TxnTable(index_root + "/postings")
    dfv_t = make_df_view(index_root, n_buckets)
    if dfv_t.view.latest_version() is None:
        raise ValueError(f"no maintained df view under {index_root}")
    # the df view's own version is captured WITH the fold meta and the
    # df read pinned at it below — same one-snapshot discipline as the
    # chunk serve (a refresh between the meta read and the df read
    # must not pair fresher df counts with postings pinned at sv)
    dfv_meta, dfv_version = _last_meta_version_with(
        dfv_t.view, "mv_source_version")
    sv = int(dfv_meta["mv_source_version"])
    v = sv
    while v >= 0:  # newest postings commit at/before the fold version
        meta = postings._doc(v).get("meta", {})  # noqa: SLF001
        if "bm25_n_docs" in meta:
            break
        v -= 1
    else:
        raise ValueError(f"no bm25 scalars at/before version {sv}")
    n_docs = meta["bm25_n_docs"]
    # same guard as the chunk serve: an empty accumulated corpus is a
    # legal state (the sink skips empty batches, but a caller may read
    # before the first non-empty one lands via the batch-twin path)
    avgdl = (meta["bm25_total_len"] / n_docs) if n_docs else 0.0
    dfv = (dfv_t.read(spark, version=dfv_version)
           .select("tok", F.col("cnt").alias("df")))
    return postings.read(spark, version=sv), dfv, n_docs, avgdl
