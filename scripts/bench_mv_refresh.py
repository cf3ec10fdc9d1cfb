#!/usr/bin/env python
"""Incremental-MV refresh cost vs source size (round 6 follow-up).

The claim in operators/mv.py is that a refresh costs O(rows changed
since the last refresh) + O(groups) — never a source rescan. This
measures it: build a txn source table at 1x and 10x row counts (same
append-batch size, 10x the history), bring an MV of per-group
(count, sum) partials current, then time

  * refresh_ms — maintain_agg_view after ONE small append (the
    steady-state refresh a scheduler runs). Must stay ~flat from 1x
    to 10x: the change feed reads only the new commit, and the view
    join is O(groups).
  * full_ms    — the reference's strategy (read_delta.py:47-53):
    re-read the whole snapshot and re-aggregate. Grows ~linearly
    with the source, which is exactly what the MV avoids.

Run:  python scripts/bench_mv_refresh.py
The observed table lives in PLANS.md §"Incremental materialized view".
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
    _partials,
    maintain_agg_view,
)
from sport_advantages_moderne_data_infrastructure_spark.session import get_spark  # noqa: E402
from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (  # noqa: E402
    TxnTable,
)

GROUPS = 1_000
BATCH_ROWS = 100_000
REFRESH_ROWS = 1_000


def batch(spark, n_rows: int, seed: int):
    return (spark.range(seed * n_rows, (seed + 1) * n_rows)
            .select((F.col("id") % GROUPS).alias("g"),
                    (F.col("id") % 997).cast("double").alias("v")))


def build(spark, root: str, n_batches: int) -> TxnTable:
    src = TxnTable(os.path.join(root, f"src_{n_batches}"))
    for i in range(n_batches):
        src.append(batch(spark, BATCH_ROWS, i), {"operation": "append"})
        src.checkpoint_if_needed(10)
    return src


def measure(spark, root: str, n_batches: int) -> dict:
    src = build(spark, root, n_batches)
    view = TxnTable(os.path.join(root, f"mv_{n_batches}"))
    maintain_agg_view(spark, src, view, ["g"], "v")  # initial build

    # steady state: one small append lands, then the MV refreshes
    src.append(batch(spark, REFRESH_ROWS, 10_000 + n_batches),
               {"operation": "append"})
    t0 = time.perf_counter()
    maintain_agg_view(spark, src, view, ["g"], "v")
    refresh_ms = (time.perf_counter() - t0) * 1000

    # the reference's full-recompute strategy over the same source
    full_view = TxnTable(os.path.join(root, f"full_{n_batches}"))
    t0 = time.perf_counter()
    full_view.overwrite(_partials(src.read(spark), ["g"], "v"),
                        {"operation": "mv_full"})
    full_ms = (time.perf_counter() - t0) * 1000

    # both strategies must agree with a direct GROUP BY of the snapshot
    mv = view.read(spark)
    truth = (src.read(spark).groupBy("g")
             .agg(F.count("*").alias("cnt"), F.sum("v").alias("sm")))
    diff = (mv.select("g", "cnt", F.round("sm", 6).alias("sm"))
            .exceptAll(truth.select(
                "g", "cnt", F.round("sm", 6).alias("sm"))).count())
    rows = n_batches * BATCH_ROWS + REFRESH_ROWS
    return {"rows": rows, "refresh_ms": round(refresh_ms, 1),
            "full_ms": round(full_ms, 1), "mismatch_rows": diff}


def main() -> None:
    spark = get_spark("samdis-bench-mv")
    root = tempfile.mkdtemp(prefix="mv_refresh_")
    try:
        r1 = measure(spark, root, 8)
        r10 = measure(spark, root, 80)
        ratio_refresh = round(r10["refresh_ms"] / r1["refresh_ms"], 2)
        ratio_full = round(r10["full_ms"] / r1["full_ms"], 2)
        print(f"# 1x : {r1}")
        print(f"# 10x: {r10}")
        print(f"# refresh ratio 10x/1x: {ratio_refresh} (flat=1)")
        print(f"# full-recompute ratio: {ratio_full} (linear=10)")
        ok = (r1["mismatch_rows"] == 0 and r10["mismatch_rows"] == 0
              and ratio_refresh < 3.0)
        print(f"# ok: {ok}")
        sys.exit(0 if ok else 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
