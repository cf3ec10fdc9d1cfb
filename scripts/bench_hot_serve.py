"""Measure the r10 hot-bucket serve bound (VERDICT r9 #1): serve
latency of streaming-quantile state whose frozen grid is maximally
skewed (ALL mass in one equi-width cell — the heavy-tailed-domain
shape), comparing the pre-r10 path (one ranked read over the whole
hot bucket: a single task sorts everything) against the r10 fallback
(batch bracketing over the pruned bucket: no task sorts more than
max(2*accuracy, hot_bucket_limit) rows), at 1x and 10x corpus.

Run: python scripts/bench_hot_serve.py
"""

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sport_advantages_moderne_data_infrastructure_spark.sources.tables import (  # noqa: E402,E501
    load_table,
)
from sport_advantages_moderne_data_infrastructure_spark.streaming import (  # noqa: E402,E501
    quantiles as Q,
)

QS = [0.25, 0.5, 0.75, 0.95]


def main() -> None:
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    e = load_table(spark, "/root/testdata/sf0.1", "events").select(
        "event_id", "value")
    for mult in (1, 10):
        src = e
        for i in range(1, mult):
            src = src.unionByName(e.select(
                (F.col("event_id") + 1_000_000 * i).alias("event_id"),
                (F.col("value") + F.lit(i * 0.001)).alias("value")))
        n = src.count()
        root = tempfile.mkdtemp(prefix=f"hot_serve_{mult}x_")
        vals, hist = Q._tables(root)
        # grid declared 100x wider than the data: everything in cell 1
        Q.ingest_batch(vals, hist, src, 0, "value", 0.0, 50_000.0,
                       app_id=f"hs{mult}")
        rows = []
        for label, limit in (("pre-r10 single-task read", n + 1),
                             ("r10 bracketing fallback", 100_000)):
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                got = Q.quantiles_served(spark, root, QS,
                                         hot_bucket_limit=limit)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            rows.append((label, best, got))
        assert rows[0][2] == rows[1][2], "paths disagree"
        print(f"corpus {n:>9,} rows (all in ONE grid cell):")
        for label, best, _ in rows:
            print(f"  {label:28s} {best:7.2f} s")
    spark.stop()


if __name__ == "__main__":
    main()
