#!/usr/bin/env python
"""Streaming-SCD2 maintenance cost vs raw history size (VERDICT r5 #1).

Seeds a raw/dim pair at two raw-history sizes (10x apart), then times a
single incremental micro-batch against each:

  * in-order batch (every event after its key's last) — the steady
    state; must be FLAT in raw history (the fast path never reads raw)
  * late batch (one event inside an existing run) — the escape hatch;
    reads the late keys' raw buckets, so it may grow with bucket
    history (that cost is the price of exactness under late data, paid
    only for the late keys)

Run:  python scripts/bench_scd2_stream.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sport_advantages_moderne_data_infrastructure_spark.session import (  # noqa: E402
    get_spark,
)
from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (  # noqa: E402
    TxnTable,
)
from sport_advantages_moderne_data_infrastructure_spark.streaming.scd2 import (  # noqa: E402
    scd2_tracked,
    write_stream_scd2,
)

KEYS = 500
BUCKETS = 32
COMMITS = 8
SCHEMA = "k long, a string, ts timestamp, tie long"


def _events(spark, start_tie: int, n: int, ts_base: int):
    """n in-order events over KEYS keys: ts strictly increasing with
    tie, attr flips every third event per key."""
    return (spark.range(n)
            .select((F.col("id") % KEYS).alias("k"),
                    F.concat(F.lit("attr"),
                             ((F.col("id") / KEYS).cast("long") % 3)
                             .cast("string")).alias("a"),
                    F.timestamp_seconds(ts_base + F.col("id")).alias("ts"),
                    (start_tie + F.col("id")).alias("tie")))


def seed(spark, root: str, rows_per_commit: int) -> tuple[str, str, int]:
    raw_path, dim_path = f"{root}/raw", f"{root}/dim"
    raw = TxnTable(raw_path)
    tie = 0
    for i in range(COMMITS):
        df = _events(spark, tie, rows_per_commit, tie) \
            .withColumn("key_bucket", (F.col("k") % BUCKETS).cast("int"))
        adds = raw._write_data_partitioned(df, "key_bucket")  # noqa: SLF001
        raw.commit(adds, [], {"stream_batch_id": i, "stream_app_id": "seed",
                              "operation": "scd2_raw_append"},
                   expected_version=raw.latest_version())
        tie += rows_per_commit
    dim = TxnTable(dim_path)
    rows = scd2_tracked(raw.read(spark).select("k", "a", "ts", "tie"),
                        "k", "a", "ts", "tie") \
        .withColumn("key_bucket", (F.col("k") % BUCKETS).cast("int"))
    dim.overwrite_partitions(rows, "key_bucket",
                             {"stream_batch_id": COMMITS - 1,
                              "stream_app_id": "seed",
                              "operation": "scd2_dim_maintain"})
    return raw_path, dim_path, tie


def probe(spark, root, raw_path, dim_path, df, tag: str) -> float:
    src = f"{root}/src_{tag}"
    df.coalesce(1).write.parquet(src)
    t0 = time.perf_counter()
    q = write_stream_scd2(
        spark.readStream.schema(SCHEMA).parquet(src),
        raw_path, dim_path, f"{root}/ck_{tag}",
        key="k", attr="a", ts="ts", tie="tie", n_buckets=BUCKETS,
        app_id=f"probe_{tag}")
    q.awaitTermination(300)
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark("scd2-stream-bench")
    for rows_per_commit in (2_500, 25_000):
        root = tempfile.mkdtemp(prefix="samdis_scd2_bench_")
        raw_path, dim_path, tie = seed(spark, root, rows_per_commit)
        raw_rows = TxnTable(raw_path).read(spark).count()
        # warm-up probe (first streaming query of a session pays JIT)
        w = probe(spark, root, raw_path, dim_path,
                  _events(spark, tie, 1000, tie), "warm")
        tie += 1000
        inorder = probe(spark, root, raw_path, dim_path,
                        _events(spark, tie, 1000, tie), "inorder")
        tie += 1000
        late = probe(
            spark, root, raw_path, dim_path,
            _events(spark, tie, 1000, tie).withColumn(
                "ts", F.when(F.col("tie") == tie,
                             F.timestamp_seconds(F.lit(2)))
                .otherwise(F.col("ts"))), "late")
        print({"raw_rows": raw_rows, "warm_sec": w,
               "inorder_batch_sec": inorder, "late_batch_sec": late},
              flush=True)
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
