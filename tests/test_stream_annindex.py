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
