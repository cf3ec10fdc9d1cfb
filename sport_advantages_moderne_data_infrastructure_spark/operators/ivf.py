"""IVF (inverted-file) ANN index: k-means centroids partition the vector
space; a query reranks only its nprobe nearest centroid lists.

Spark-first shape:
- training: `pyspark.ml.clustering.KMeans` (distributed Lloyd's, seeded)
  over the embedding column — one index-build job.
- assignment: centroids live in a TINY broadcast DataFrame; distance is ONE
  generic zip_with fold over the (vector, centroid) pair — not k inlined
  literal-array columns (k materialized expression chains made Catalyst
  analysis itself the bottleneck).
- query: probe the nprobe closest centroids, cosine-rerank those lists
  only. With centroid-partitioned storage the probe join is partition
  pruning, not a shuffle.

Approximation ⇒ rows-only driver check; recall vs brute force pinned in
tests/test_ann.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_L2SQ = ("aggregate(zip_with(embedding, cvec, (x, y) -> "
         "(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
         "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")


def train_centroids(embeddings: DataFrame, k: int = 16, seed: int = 42,
                    max_iter: int = 20) -> list[list[float]]:
    """Distributed k-means over the embedding column (index build step)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        array_to_vector(F.col("embedding").cast("array<double>"))
        .alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(vecs)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _centroid_df(spark, centroids: list[list[float]]):
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "centroid_id int, cvec array<double>")


def _ranked_centroids(embeddings: DataFrame, cdf) -> DataFrame:
    """(vec_id, centroid_id, crank): every vector × centroid, ranked by L2
    distance — crank=1 is the assignment, crank<=nprobe is the probe set."""
    dists = (
        embeddings.crossJoin(F.broadcast(cdf))
        .select("vec_id", "centroid_id", F.expr(_L2SQ).alias("d"))
    )
    wn = W.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("centroid_id"))
    return dists.withColumn("crank", F.row_number().over(wn))


def assign_centroids(embeddings: DataFrame,
                     centroids: list[list[float]]) -> DataFrame:
    """Input columns + centroid_id (nearest centroid)."""
    cdf = _centroid_df(embeddings.sparkSession, centroids)
    assign = (_ranked_centroids(embeddings, cdf)
              .filter(F.col("crank") == 1)
              .select("vec_id", "centroid_id"))
    return embeddings.join(assign, "vec_id")


def ivf_topk(embeddings: DataFrame, centroids: list[list[float]],
             query_pred, k: int = 10, nprobe: int = 4) -> DataFrame:
    """IVF cosine top-k for the query rows selected by query_pred."""
    from ..plans.simops import dot_expr

    cdf = _centroid_df(embeddings.sparkSession, centroids)
    base = embeddings.select(
        "vec_id", "embedding",
        F.sqrt(F.expr(dot_expr("embedding", "embedding"))).alias("e_norm"))

    assigned = (
        base.join(_ranked_centroids(embeddings, cdf)
                  .filter(F.col("crank") == 1)
                  .select("vec_id", "centroid_id"), "vec_id")
        .cache()
    )

    queries = base.filter(query_pred(F.col("vec_id")))
    q_probes = (
        _ranked_centroids(queries.select("vec_id", "embedding"), cdf)
        .filter(F.col("crank") <= nprobe)
        .select("vec_id", "centroid_id")
        .join(queries, "vec_id")
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("q_embedding"),
                F.col("e_norm").alias("q_norm"), "centroid_id")
    )

    cos = (F.expr(dot_expr("q_embedding", "embedding"))
           / (F.col("q_norm") * F.col("e_norm")))
    scored = (
        assigned.join(F.broadcast(q_probes), "centroid_id")
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                cos.alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("cos", 6).alias("score"), "rank")
        .orderBy("query_id", "rank")
    )
