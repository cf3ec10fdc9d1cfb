#!/usr/bin/env python
"""Incremental JOIN-MV refresh cost vs source size (round 7).

The claim in operators/mv.JoinMaterializedView is that a refresh costs
O(changed keys x bucket width) — rewriting only the affected ``__kb=``
buckets of the two-sided keyed state and the join output — never a
source rescan and never the full join. This measures it: a dimension
(1 row/key) joined to facts (10 rows/key) at 1x and 10x row counts,
with n_buckets scaled by the buckets_for_rows policy so bucket width
is constant, then time

  * refresh_ms — JoinMaterializedView.refresh after a MERGE touching
    5 keys (the steady-state refresh). Must stay ~flat from 1x to
    10x: the feeds carry only the merge's delta and the rewrite
    touches <= 5 buckets of constant width.
  * full_ms    — the reference's strategy (read_delta.py:280-285):
    re-read both snapshots, recompute the whole join, overwrite.
    Grows ~linearly with the source.

Run:  python scripts/bench_join_mv.py
The observed table lives in PLANS.md §"Incremental JOIN materialized
view".
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sport_advantages_moderne_data_infrastructure_spark.operators.mv import (  # noqa: E402
    JoinMaterializedView,
    buckets_for_rows,
)
from sport_advantages_moderne_data_infrastructure_spark.session import get_spark  # noqa: E402
from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (  # noqa: E402
    TxnTable,
)

KEYS_1X = 40_000
FACTS_PER_KEY = 10
TARGET_BUCKET_ROWS = 50_000
CHANGED_KEYS = [3, 1007, 20011, 31337, 39999]


def build(spark, root: str, m: int):
    keys = KEYS_1X * m
    left = TxnTable(os.path.join(root, f"l_{m}"))
    right = TxnTable(os.path.join(root, f"r_{m}"))
    left.overwrite(spark.range(keys).select(
        F.col("id").alias("k"),
        F.concat(F.lit("n"), F.col("id")).alias("lname")))
    right.overwrite(spark.range(keys * FACTS_PER_KEY).select(
        (F.col("id") % keys).alias("k"),
        (F.col("id") % 997).cast("int").alias("fv")))
    return left, right, keys


def measure(spark, root: str, m: int) -> dict:
    left, right, keys = build(spark, root, m)
    n_rows = keys * FACTS_PER_KEY
    jmv = JoinMaterializedView(
        os.path.join(root, f"jmv_{m}"), "k",
        n_buckets=buckets_for_rows(n_rows, TARGET_BUCKET_ROWS))
    jmv.refresh(spark, left, right)  # initial build

    # steady state: a merge touches 5 keys, then the view refreshes
    ups = spark.createDataFrame([(k, f"upd{k}") for k in CHANGED_KEYS],
                                "k long, lname string")
    left.merge(spark, ups, "k")
    t0 = time.perf_counter()
    jmv.refresh(spark, left, right)
    refresh_ms = (time.perf_counter() - t0) * 1000

    # the reference's full-recompute strategy over the same sources
    full_view = TxnTable(os.path.join(root, f"full_{m}"))
    t0 = time.perf_counter()
    full_view.overwrite(
        left.read(spark).join(right.read(spark), "k"),
        {"operation": "join_full"})
    full_ms = (time.perf_counter() - t0) * 1000

    # the maintained view must equal the direct join
    got = jmv.read(spark)
    want = left.read(spark).join(right.read(spark), "k") \
        .select(*got.columns)
    diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    return {"rows": n_rows, "buckets": jmv.n_buckets,
            "refresh_ms": round(refresh_ms, 1),
            "full_ms": round(full_ms, 1), "mismatch_rows": diff}


def main() -> None:
    mults = [int(x) for x in sys.argv[1:]] or [1, 10]
    spark = get_spark("samdis-bench-join-mv")
    root = tempfile.mkdtemp(prefix="join_mv_")
    try:
        r1 = measure(spark, root, mults[0])
        r10 = measure(spark, root, mults[-1])
        ratio_refresh = round(r10["refresh_ms"] / r1["refresh_ms"], 2)
        ratio_full = round(r10["full_ms"] / r1["full_ms"], 2)
        print(f"# {mults[0]}x : {r1}")
        print(f"# {mults[-1]}x: {r10}")
        print(f"# refresh ratio {mults[-1]}x/{mults[0]}x: "
              f"{ratio_refresh} (flat=1)")
        print(f"# full-recompute ratio: {ratio_full} (linear=10)")
        ok = (r1["mismatch_rows"] == 0 and r10["mismatch_rows"] == 0
              and ratio_refresh < 3.0)
        print(f"# ok: {ok}")
        sys.exit(0 if ok else 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
