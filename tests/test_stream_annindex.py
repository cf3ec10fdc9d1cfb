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
