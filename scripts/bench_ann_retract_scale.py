#!/usr/bin/env python
"""Measure the two ANN retraction paths at 1x vs 10x index size
(streaming/annindex.retract_batch): the DV needle path should be
near-FLAT in corpus size (one position file, no partition rewrite),
while the rewrite path's cost tracks the touched lists' width — the
reason retract_batch switches on batch size. Run from the repo root:
    python scripts/bench_ann_retract_scale.py [n_needles]
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
)
from sport_advantages_moderne_data_infrastructure_spark.streaming.annindex import (  # noqa: E402,E501
    ingest_batch,
    retract_batch,
)


def main():
    n_needles = int(sys.argv[1]) if len(sys.argv) > 1 else 4
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
        # DV needle path
        idx = TxnTable(tempfile.mkdtemp(prefix=f"ret_{tag}_") + "/i")
        ingest_batch(idx, corpus, cents, 0, "b")
        needles = corpus.limit(n_needles).select("vec_id", "embedding")
        t0 = time.time()
        retract_batch(idx, needles, cents, 1, "b", use_dv=True)
        dv_s = time.time() - t0
        # rewrite path, same needles, fresh twin index
        idx2 = TxnTable(tempfile.mkdtemp(prefix=f"retw_{tag}_") + "/i")
        ingest_batch(idx2, corpus, cents, 0, "b")
        t0 = time.time()
        retract_batch(idx2, needles, cents, 1, "b")
        rw_s = time.time() - t0
        print(f"{tag}: corpus={n} k={len(cents)} "
              f"dv_needle={dv_s:.2f}s rewrite={rw_s:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
