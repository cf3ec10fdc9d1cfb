"""Streaming IVF index maintenance (streaming/annindex.py): the
incrementally-maintained inverted lists must equal a batch rebuild at
every point, restart on the same checkpoint must be exactly-once, and
queries through the maintained index must match the batch index."""

from __future__ import annotations

from pyspark.sql import functions as F

from sport_advantages_moderne_data_infrastructure_spark.functions.vectors import (
    dot_expr,
)
from sport_advantages_moderne_data_infrastructure_spark.operators.ivf import (
    assign_centroids,
    train_centroids,
)
from sport_advantages_moderne_data_infrastructure_spark.sources.tables import (
    load_table,
)
from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (
    TxnTable,
)
from sport_advantages_moderne_data_infrastructure_spark.streaming.annindex import (
    read_index,
    write_stream_ivf_index,
)

SCHEMA = "vec_id long, embedding array<float>"


def _with_norm(df):
    return df.select(
        "vec_id", "embedding",
        F.sqrt(F.expr(dot_expr("embedding", "embedding"))).alias("e_norm"))


def test_streamed_index_equals_batch_and_restarts_exactly_once(
        spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding")
    centroids = train_centroids(e, k=8, max_iter=4)
    src, idx, ck = (str(tmp_path / "src"), str(tmp_path / "idx"),
                    str(tmp_path / "ck"))
    # three files = three micro-batches
    for m in range(3):
        e.filter(F.col("vec_id") % 3 == m).coalesce(1) \
            .write.mode("append").parquet(src)
    q = write_stream_ivf_index(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1").parquet(src),
        idx, centroids, ck, app_id="annix")
    q.awaitTermination(120)
    maintained = read_index(spark, idx)
    batch = assign_centroids(_with_norm(e), centroids)
    m_ids = {(r.vec_id, r.centroid_id) for r in
             maintained.select("vec_id", "centroid_id").collect()}
    b_ids = {(r.vec_id, r.centroid_id) for r in
             batch.select("vec_id", "centroid_id").collect()}
    assert m_ids == b_ids and len(m_ids) == e.count()
    # restart on the same checkpoint: no re-ingest
    v = TxnTable(idx).latest_version()
    q = write_stream_ivf_index(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1").parquet(src),
        idx, centroids, ck, app_id="annix")
    q.awaitTermination(120)
    assert TxnTable(idx).latest_version() == v
    assert read_index(spark, idx).count() == len(m_ids)
    # new arrivals keep flowing after the restart
    extra = spark.createDataFrame(
        [(900001, [0.5] * len(e.first()["embedding"]))], SCHEMA)
    extra.coalesce(1).write.mode("append").parquet(src)
    q = write_stream_ivf_index(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1").parquet(src),
        idx, centroids, ck, app_id="annix")
    q.awaitTermination(120)
    assert read_index(spark, idx).count() == len(m_ids) + 1
    got = read_index(spark, idx).filter("vec_id = 900001").first()
    want = assign_centroids(_with_norm(extra), centroids).first()
    assert got["centroid_id"] == want["centroid_id"]


def test_streamed_pq_index_equals_batch_and_restarts_exactly_once(
        spark, sf_dir, tmp_path):
    """The COMPRESSED index kept fresh by the stream: maintained PQ
    codes must be row-identical (codes AND recon_norm) to a batch
    encode with the same frozen codebooks, restart on the same
    checkpoint must not re-ingest, and new arrivals must encode to
    exactly the batch encoding."""
    from sport_advantages_moderne_data_infrastructure_spark.operators.pq import (  # noqa: E501
        pq_encode,
        train_pq_codebooks,
    )
    from sport_advantages_moderne_data_infrastructure_spark.streaming.annindex import (  # noqa: E501
        write_stream_ivfpq_index,
    )

    e = load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding")
    centroids = train_centroids(e, k=8, max_iter=4)
    cb = train_pq_codebooks(e, m=8, k=16)
    src, idx, ck = (str(tmp_path / "src"), str(tmp_path / "idx"),
                    str(tmp_path / "ck"))
    for m in range(3):
        e.filter(F.col("vec_id") % 3 == m).coalesce(1) \
            .write.mode("append").parquet(src)
    q = write_stream_ivfpq_index(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1").parquet(src),
        idx, centroids, cb, ck, app_id="pqix")
    q.awaitTermination(120)
    maintained = read_index(spark, idx)
    batch = pq_encode(assign_centroids(e, centroids), cb,
                      keep=("centroid_id",))
    cols = ["vec_id", "centroid_id", "code", "recon_norm"]
    m_rows = {tuple(r) for r in
              maintained.select(*cols)
              .withColumn("code", F.col("code").cast("string"))
              .collect()}
    b_rows = {tuple(r) for r in
              batch.select(*cols)
              .withColumn("code", F.col("code").cast("string"))
              .collect()}
    assert m_rows == b_rows and len(m_rows) == e.count()
    # restart on the same checkpoint: no re-ingest
    v = TxnTable(idx).latest_version()
    q = write_stream_ivfpq_index(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1").parquet(src),
        idx, centroids, cb, ck, app_id="pqix")
    q.awaitTermination(120)
    assert TxnTable(idx).latest_version() == v
    assert read_index(spark, idx).count() == len(m_rows)
    # new arrivals encode to exactly the batch encoding
    extra = spark.createDataFrame(
        [(900001, [0.5] * len(e.first()["embedding"]))], SCHEMA)
    extra.coalesce(1).write.mode("append").parquet(src)
    q = write_stream_ivfpq_index(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1").parquet(src),
        idx, centroids, cb, ck, app_id="pqix")
    q.awaitTermination(120)
    got = read_index(spark, idx).filter("vec_id = 900001").first()
    want = pq_encode(assign_centroids(extra, centroids), cb,
                     keep=("centroid_id",)).first()
    assert (got["centroid_id"] == want["centroid_id"]
            and list(got["code"]) == list(want["code"])
            and got["recon_norm"] == want["recon_norm"])


def test_maintained_meta_index_serves_filtered_topk(spark, sf_dir,
                                                    tmp_path):
    """r11: the maintained COMPRESSED index can carry filterable
    attributes (ingest_batch_pq meta_cols — the build_ivfpq_index
    layout), so metadata-filtered top-k runs against the maintained
    lists with the predicate pushed into their scan, rank-identical to
    the batch-built meta index."""
    from sport_advantages_moderne_data_infrastructure_spark.operators import (
        pq as PQ,
    )
    from sport_advantages_moderne_data_infrastructure_spark.plans import (
        simops,
    )
    from sport_advantages_moderne_data_infrastructure_spark.sources.tables import (  # noqa: E501
        load_table,
    )
    from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (  # noqa: E501
        TxnTable,
    )
    from sport_advantages_moderne_data_infrastructure_spark.streaming.annindex import (  # noqa: E501
        ingest_batch_pq, read_index,
    )

    e = load_table(spark, sf_dir, "embeddings")
    centroids, cb, batch_idx = simops.ensure_ivfpq_index(spark, sf_dir)
    idx = TxnTable(str(tmp_path / "idx"))
    ingest_batch_pq(idx, e.filter("vec_id % 2 = 0"), centroids, cb, 0,
                    "meta_ix", meta_cols=("label",))
    ingest_batch_pq(idx, e.filter("vec_id % 2 = 1"), centroids, cb, 1,
                    "meta_ix", meta_cols=("label",))
    maintained = read_index(spark, idx.path)
    qs = simops._pq_queries(spark, sf_dir)  # noqa: SLF001
    pred = F.expr(simops._FILTERED_PRED_SQL)  # noqa: SLF001
    m = PQ.ivfpq_filtered_topk(maintained, e, qs, centroids, cb, pred,
                               n_match=10 ** 9)  # force the broad path
    b = PQ.ivfpq_filtered_topk(batch_idx, e, qs, centroids, cb, pred,
                               n_match=10 ** 9)
    mt = {tuple(r) for r in
          m.select("query_id", "neighbor_id", "rank").collect()}
    bt = {tuple(r) for r in
          b.select("query_id", "neighbor_id", "rank").collect()}
    assert mt == bt and len(mt) > 0


# --- CDF-driven maintenance: retraction + the embeddings-table feed -------


def _batch_assigned(e, centroids):
    return assign_centroids(
        e.select("vec_id", "embedding",
                 F.sqrt(F.expr(dot_expr("embedding", "embedding")))
                 .alias("e_norm")), centroids)


def test_cdf_stream_tracks_table_through_churn_and_restarts(
        spark, sf_dir, tmp_path):
    """Live writeStream over the embeddings table's change feed:
    insert + re-embed (merge) + delete all fold; the maintained lists
    equal the batch assignment over the FINAL table state; a restart
    on the same checkpoint with no new versions changes nothing."""
    from sport_advantages_moderne_data_infrastructure_spark.operators.ivf import (
        k_for_corpus,
    )
    from sport_advantages_moderne_data_infrastructure_spark.streaming.annindex import (
        write_stream_ivf_cdf,
    )

    e = load_table(spark, sf_dir, "embeddings").limit(200).cache()
    centroids = train_centroids(e, k=k_for_corpus(e.count()),
                                max_iter=4)
    emb = TxnTable(str(tmp_path / "emb"))
    neg = F.transform("embedding", lambda x: -x)
    emb.append(e.filter(F.col("vec_id") % 2 == 0))
    emb.append(e.filter(F.col("vec_id") % 2 == 1)
               .withColumn("embedding", neg))          # wrong half
    emb.merge(spark, e.filter(F.col("vec_id") % 2 == 1),
              key="vec_id")                            # re-embed fix
    emb.delete_where(spark, "vec_id % 10 = 4")         # retract some

    root, ckpt = str(tmp_path / "idx"), str(tmp_path / "ckpt")
    q = write_stream_ivf_cdf(spark, emb.path, root, centroids, ckpt)
    q.awaitTermination(120)
    q.stop()

    final = e.filter(F.col("vec_id") % 10 != 4)
    m = read_index(spark, root).select("vec_id", "centroid_id")
    b = _batch_assigned(final, centroids).select("vec_id",
                                                 "centroid_id")
    assert m.exceptAll(b).count() == 0
    assert b.exceptAll(m).count() == 0

    v1 = TxnTable(root).latest_version()
    q2 = write_stream_ivf_cdf(spark, emb.path, root, centroids, ckpt)
    q2.awaitTermination(60)
    q2.stop()
    assert TxnTable(root).latest_version() == v1


def test_retract_absent_id_is_noop_and_empties_lists(spark, sf_dir,
                                                     tmp_path):
    """Retracting ids the index does not hold commits nothing new
    beyond the touched-list rewrite; retracting EVERY id of a list
    removes the list's partition instead of leaving a stale dir."""
    from sport_advantages_moderne_data_infrastructure_spark.operators.ivf import (
        k_for_corpus,
    )
    from sport_advantages_moderne_data_infrastructure_spark.streaming.annindex import (
        ingest_batch,
        retract_batch,
    )

    e = load_table(spark, sf_dir, "embeddings").limit(100).cache()
    centroids = train_centroids(e, k=k_for_corpus(e.count()),
                                max_iter=4)
    idx = TxnTable(str(tmp_path / "idx"))
    ingest_batch(idx, e, centroids, 0, "rt")

    # absent ids: same embeddings, shifted ids -> anti-join finds none
    ghost = e.withColumn("vec_id", F.col("vec_id") + 5_000_000)
    retract_batch(idx, ghost.select("vec_id", "embedding"),
                  centroids, 1, "rt")
    m = read_index(spark, idx.path).select("vec_id", "centroid_id")
    b = _batch_assigned(e, centroids).select("vec_id", "centroid_id")
    assert m.exceptAll(b).count() == 0 and b.exceptAll(m).count() == 0

    # retract EVERYTHING: every centroid partition must disappear
    retract_batch(idx, e.select("vec_id", "embedding"), centroids,
                  2, "rt")
    assert read_index(spark, idx.path).count() == 0
    import os
    live = idx.snapshot_dirs()
    assert all("centroid_id=" not in os.path.basename(d) for d in live)


def test_cdf_crash_between_legs_replays_only_ingest(spark, sf_dir,
                                                    tmp_path):
    """The retract and ingest legs are independently replay-guarded:
    re-applying the same batch after the retract leg committed skips
    the retract (ledger) and runs only the ingest — the net state is
    as if the batch applied once."""
    from sport_advantages_moderne_data_infrastructure_spark.operators.ivf import (
        k_for_corpus,
    )
    from sport_advantages_moderne_data_infrastructure_spark.streaming.annindex import (
        apply_cdf_batch,
        ingest_batch,
        retract_batch,
    )

    e = load_table(spark, sf_dir, "embeddings").limit(100).cache()
    centroids = train_centroids(e, k=k_for_corpus(e.count()),
                                max_iter=4)
    emb = TxnTable(str(tmp_path / "emb"))
    idx = TxnTable(str(tmp_path / "idx"))
    app = "crash"
    emb.append(e)
    apply_cdf_batch(idx, emb.read_changes(spark, since_version=-1),
                    centroids, 0, app)
    emb.delete_where(spark, "vec_id % 3 = 0")
    emb.merge(spark, e.filter(F.col("vec_id") % 3 == 1)
              .withColumn("embedding",
                          F.transform("embedding", lambda x: -x)),
              key="vec_id")
    ch = emb.read_changes(spark, since_version=0)
    # crash point: ONLY the retract leg of batch 1 lands
    pre = (ch.filter(F.col("_change_type")
                     .isin("delete", "update_preimage"))
           .select("vec_id", "embedding").distinct())
    retract_batch(idx, pre, centroids, 1, app + "/retract")
    # replay of the full batch: retract skipped, ingest applied
    apply_cdf_batch(idx, ch, centroids, 1, app)

    final = (e.filter(F.col("vec_id") % 3 == 2).unionByName(
        e.filter(F.col("vec_id") % 3 == 1)
        .withColumn("embedding",
                    F.transform("embedding", lambda x: -x))))
    m = read_index(spark, idx.path).select("vec_id", "centroid_id")
    b = _batch_assigned(final, centroids).select("vec_id",
                                                 "centroid_id")
    assert m.exceptAll(b).count() == 0 and b.exceptAll(m).count() == 0


def test_retract_dv_needle_then_rewrite_converges(spark, sf_dir,
                                                  tmp_path):
    """The needle retraction path: a couple of ids commit ONE position
    file (live dirs untouched — no partition rewrite), queries through
    the maintained index stop seeing them, and a later rewrite-mode
    retraction of the same lists materializes the DVs and converges to
    the batch assignment."""
    from sport_advantages_moderne_data_infrastructure_spark.operators.ivf import (
        k_for_corpus,
    )
    from sport_advantages_moderne_data_infrastructure_spark.streaming.annindex import (
        ingest_batch,
        retract_batch,
    )

    e = load_table(spark, sf_dir, "embeddings").limit(100).cache()
    centroids = train_centroids(e, k=k_for_corpus(e.count()),
                                max_iter=4)
    idx = TxnTable(str(tmp_path / "idx"))
    ingest_batch(idx, e, centroids, 0, "dvr")

    needles = e.limit(2).select("vec_id", "embedding")
    gone_ids = [r["vec_id"] for r in needles.select("vec_id").collect()]
    live0 = set(idx.snapshot_dirs())
    retract_batch(idx, needles, centroids, 1, "dvr", use_dv=True)
    assert set(idx.snapshot_dirs()) == live0  # position file only
    assert idx.snapshot_dvs()  # mapping recorded
    m = read_index(spark, idx.path)
    assert m.filter(F.col("vec_id").isin(gone_ids)).count() == 0
    assert m.count() == 100 - len(gone_ids)

    # replay of the DV leg is absorbed by the ledger
    retract_batch(idx, needles, centroids, 1, "dvr", use_dv=True)
    assert m.count() == 100 - len(gone_ids)

    # rewrite-mode retraction afterwards still converges (it reads the
    # DV-masked partitions and materializes them as it replaces)
    more = (e.filter(F.col("vec_id") % 9 == 4)
            .select("vec_id", "embedding"))
    retract_batch(idx, more, centroids, 2, "dvr")
    final = e.filter(~F.col("vec_id").isin(gone_ids)).filter(
        F.col("vec_id") % 9 != 4)
    mm = read_index(spark, idx.path).select("vec_id", "centroid_id")
    bb = _batch_assigned(final, centroids).select("vec_id",
                                                  "centroid_id")
    assert mm.exceptAll(bb).count() == 0
    assert bb.exceptAll(mm).count() == 0


def test_cdf_compressed_index_tracks_churn(spark, sf_dir, tmp_path):
    """The PQ leg of the CDF path: retraction is layout-level (codes
    are never recomputed), so the same churn history folds the
    COMPRESSED table to exactly a batch re-encode of the final state
    — code arrays and recon_norm bit-equal under the frozen
    centroids + codebooks."""
    from sport_advantages_moderne_data_infrastructure_spark.operators.ivf import (
        k_for_corpus,
    )
    from sport_advantages_moderne_data_infrastructure_spark.operators.pq import (
        pq_encode,
        train_pq_codebooks,
    )
    from sport_advantages_moderne_data_infrastructure_spark.streaming.annindex import (
        apply_cdf_batch,
    )

    e = load_table(spark, sf_dir, "embeddings").limit(120).cache()
    centroids = train_centroids(e, k=k_for_corpus(e.count()),
                                max_iter=4)
    books = train_pq_codebooks(e.select("vec_id", "embedding"),
                               m=4, k=8)
    emb = TxnTable(str(tmp_path / "emb"))
    idx = TxnTable(str(tmp_path / "idx"))
    app = "pqcdf"

    neg = F.transform("embedding", lambda x: -x)
    emb.append(e.filter(F.col("vec_id") % 2 == 0)
               .withColumn("embedding", neg))  # wrong half
    apply_cdf_batch(idx, emb.read_changes(spark, since_version=-1),
                    centroids, 0, app, codebooks=books)
    emb.append(e.filter(F.col("vec_id") % 2 == 1))
    emb.merge(spark, e.filter(F.col("vec_id") % 2 == 0),
              key="vec_id")                    # re-embed fix
    emb.delete_where(spark, "vec_id % 10 = 4")
    apply_cdf_batch(idx, emb.read_changes(spark, since_version=0),
                    centroids, 1, app, codebooks=books)

    final = e.filter(F.col("vec_id") % 10 != 4)
    batch = pq_encode(
        assign_centroids(final.select("vec_id", "embedding"),
                         centroids),
        books, keep=("centroid_id",))
    cols = ["vec_id", "centroid_id", "code", "recon_norm"]
    m = read_index(spark, idx.path).select(*cols)
    b = batch.select(*cols)
    assert m.exceptAll(b).count() == 0
    assert b.exceptAll(m).count() == 0


def test_partition_compaction_preserves_index_and_bounds_files(
        spark, sf_dir, tmp_path):
    """compact_index_if_needed (r12): sustained churn fragments hot
    centroid lists across one subdir per touching batch; the
    partition-granular OPTIMIZE rewrites ONLY the fragmented lists,
    reads are row-identical across it, cold lists keep their files,
    accumulated DV masks materialize away, and the change feed skips
    the commit as layout-only."""
    from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (
        _partition_of,
    )
    from sport_advantages_moderne_data_infrastructure_spark.streaming.annindex import (
        compact_index_if_needed,
        ingest_batch,
        retract_batch,
    )

    e = load_table(spark, sf_dir, "embeddings").limit(120).cache()
    centroids = train_centroids(e, k=6, max_iter=3)
    idx = TxnTable(str(tmp_path / "idx"))
    # 10 micro-batches of churn -> every touched list gains ~10 dirs
    for b in range(10):
        ingest_batch(idx, e.filter(F.col("vec_id") % 10 == b),
                     centroids, b, "cmp")
    # a DV needle on one batch's rows (accumulates a mask to materialize)
    needles = e.limit(2).select("vec_id", "embedding")
    retract_batch(idx, needles, centroids, 10, "cmp", use_dv=True)
    assert idx.snapshot_dvs()

    from collections import Counter
    live0 = idx.snapshot_dirs()
    frag0 = Counter(_partition_of(d)[1] for d in live0)
    assert max(frag0.values()) > 4
    before = read_index(spark, idx.path)
    rows0 = {(r.vec_id, r.centroid_id) for r in
             before.select("vec_id", "centroid_id").collect()}

    v, _cp = compact_index_if_needed(spark, idx.path,
                                     max_dirs_per_value=4)
    assert v is not None
    live1 = idx.snapshot_dirs()
    frag1 = Counter(_partition_of(d)[1] for d in live1)
    # every hot value collapsed to ONE dir; cold values untouched
    for val, c in frag0.items():
        if c > 4:
            assert frag1[val] == 1, (val, frag1[val])
        else:
            assert frag1[val] == c
    cold = {d for d in live0
            if frag0[_partition_of(d)[1]] <= 4}
    assert cold <= set(live1)  # cold dirs kept their physical files
    # reads row-identical across the rewrite, DVs materialized away
    after = read_index(spark, idx.path)
    rows1 = {(r.vec_id, r.centroid_id) for r in
             after.select("vec_id", "centroid_id").collect()}
    assert rows1 == rows0
    assert not {d for d in idx.snapshot_dvs() if d in live1}
    # change-feed consumers skip the compaction as layout-only
    ch = idx.read_changes(spark, since_version=v - 1, upto=v)
    assert ch.count() == 0
    # idempotent below threshold
    assert compact_index_if_needed(spark, idx.path,
                                   max_dirs_per_value=4)[0] is None
    # time travel to the pre-compaction layout still works
    assert idx.read(spark, version=v - 1).count() == after.count()
