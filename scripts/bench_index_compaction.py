#!/usr/bin/env python
"""Measure maintained-index small-files accretion and the
partition-granular OPTIMIZE that bounds it (r12, VERDICT r11 #6):
churn a maintained IVF index with N micro-batches at 1x vs 10x corpus,
then time (a) a full maintained-index read while fragmented, (b)
compact_index_if_needed, (c) the same read compacted. The compaction
cost should track the HOT lists' width (O(touched partitions)), not
the index size, and the read win should grow with fragmentation. Run
from the repo root:
    python scripts/bench_index_compaction.py [n_batches]
"""
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from sport_advantages_moderne_data_infrastructure_spark.operators.ivf import (  # noqa: E402,E501
    k_for_corpus,
    train_centroids,
)
from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (  # noqa: E402,E501
    TxnTable,
    _partition_of,
)
from sport_advantages_moderne_data_infrastructure_spark.streaming.annindex import (  # noqa: E402,E501
    compact_index_if_needed,
    ingest_batch,
    read_index,
)


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    e1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    e10 = e1
    for i in range(1, 10):
        e10 = e10.unionByName(
            e1.withColumn("vec_id", F.col("vec_id") + i * 1_000_000))
    for tag, corpus in (("1x", e1.cache()), ("10x", e10.cache())):
        n = corpus.count()
        cents = train_centroids(e1, k=k_for_corpus(n), max_iter=4)
        idx = TxnTable(tempfile.mkdtemp(prefix=f"cmp_{tag}_") + "/i")
        t0 = time.time()
        for b in range(n_batches):
            ingest_batch(idx, corpus.filter(
                F.col("vec_id") % n_batches == b), cents, b, "bench")
        t_churn = time.time() - t0
        from collections import Counter
        frag = Counter(_partition_of(d)[1] for d in idx.snapshot_dirs())
        t0 = time.time()
        n_frag = read_index(spark, idx.path).count()
        t_read_frag = time.time() - t0
        t0 = time.time()
        v, _ = compact_index_if_needed(spark, idx.path,
                                       max_dirs_per_value=4)
        t_compact = time.time() - t0
        t0 = time.time()
        n_cmp = read_index(spark, idx.path).count()
        t_read_cmp = time.time() - t0
        assert n_frag == n_cmp == n
        print(f"{tag}: rows={n} lists={len(frag)} "
              f"max_frag={max(frag.values())} "
              f"churn={t_churn:.2f}s read_frag={t_read_frag:.2f}s "
              f"compact={t_compact:.2f}s (v{v}) "
              f"read_compacted={t_read_cmp:.2f}s")
        corpus.unpersist()


if __name__ == "__main__":
    main()
