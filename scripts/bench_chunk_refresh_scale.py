#!/usr/bin/env python
"""Measure the O(batch)-refresh claim of the CDF-driven chunk index
(streaming/chunkbm25.py): maintain two corpora — 1x and 10x documents
— to steady state, then time ONE refresh of an identical-sized change
batch (an update wave touching the same number of docs) against each.
If refresh cost were O(corpus), the 10x table's refresh would be ~10x
slower; the maintained design (MapMV bucket replace + stacked AggMV +
signed meta scalars) should keep it near-flat, the same contract the
other maintained artifacts pin in tests/test_scaling_10x.py. Run from
the repo root:
    python scripts/bench_chunk_refresh_scale.py [batch_docs]
"""
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (  # noqa: E402,E501
    TxnTable,
)
from sport_advantages_moderne_data_infrastructure_spark.streaming.chunkbm25 import (  # noqa: E402,E501
    refresh_chunk_index,
)


def main():
    batch_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    d1 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    # 10x corpus: shifted doc_id replicas (distinct ids, same text mix)
    d10 = d1
    for i in range(1, 10):
        d10 = d10.unionByName(
            d1.withColumn("doc_id", F.col("doc_id") + i * 1_000_000))
    results = {}
    for tag, corpus in (("1x", d1), ("10x", d10)):
        root = tempfile.mkdtemp(prefix=f"cbx_scale_{tag}_")
        docs = TxnTable(root + "/docs")
        docs.append(corpus)
        t0 = time.time()
        refresh_chunk_index(spark, docs, root + "/idx", 0, "scale")
        build = time.time() - t0
        # identical-size update wave against both corpora: same docs,
        # text rewritten — the refresh folds 2 x batch_docs projected
        # doc copies (pre+post) regardless of corpus size
        wave = (corpus.orderBy("doc_id").limit(batch_docs)
                .withColumn("text", F.concat(F.lit("yy "), "text")))
        docs.merge(spark, wave, key="doc_id")
        t0 = time.time()
        refresh_chunk_index(spark, docs, root + "/idx", 1, "scale")
        refresh = time.time() - t0
        n = corpus.count()
        results[tag] = (n, build, refresh)
        print(f"{tag}: corpus={n} initial_fold={build:.1f}s "
              f"update_refresh({batch_docs} docs)={refresh:.1f}s")
    r1, r10 = results["1x"][2], results["10x"][2]
    print(f"refresh ratio 10x/1x: {r10 / r1:.2f} "
          "(O(corpus) would be ~10)")
    spark.stop()


if __name__ == "__main__":
    main()
