#!/usr/bin/env python
"""Composed incremental pipeline refresh cost vs source size (round 8).

The claim in plans/core.build_final_pipeline is that the whole
reference DAG — employees ⋈ validations ⟕ activity-agg, then the prime
projection — refreshes at O(delta) per commit through the maintained
chain (join MV → agg MV with changed-groups CDF → LEFT-join MV →
MapMaterializedView), while the reference rebuilds everything
wholesale every run (read_delta.py:219-294). This measures it at 1x
and 10x source rows:

  * chain_ms — refresh of ALL FOUR layers after a steady-state delta
    (a MERGE raising 5 employees + an append of 50 activity rows).
    Must stay ~flat from 1x to 10x: every layer reads only change
    feeds and affected buckets.
  * full_ms  — the reference's strategy: re-read snapshots, recompute
    final + prime, overwrite. Grows ~linearly.

Run:  python scripts/bench_final_pipeline_stress.py
The observed table lives in PLANS.md §"The reference DAG as one
incremental pipeline".
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sport_advantages_moderne_data_infrastructure_spark.operators import relational as R  # noqa: E402
from sport_advantages_moderne_data_infrastructure_spark.operators.mv import (  # noqa: E402
    AggMaterializedView,
    JoinMaterializedView,
    MapMaterializedView,
    buckets_for_rows,
)
from sport_advantages_moderne_data_infrastructure_spark.session import get_spark  # noqa: E402
from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (  # noqa: E402
    TxnTable,
)

EMP_1X = 20_000
ACTS_PER_EMP = 10
RAISED = [3, 1007, 10011, 15337, 19999]


def _prime_map(df):
    d = (df.withColumn("count_activity", F.col("cnt"))
         .withColumn("mean_duration",
                     F.round(F.col("sm") / F.col("cnt"), 4)))
    return R.prime_query(d)


def build(spark, root: str, m: int):
    n = EMP_1X * m
    nb = buckets_for_rows(n, target_rows=50_000)
    emp = TxnTable(os.path.join(root, f"emp_{m}"))
    val = TxnTable(os.path.join(root, f"val_{m}"))
    act = TxnTable(os.path.join(root, f"act_{m}"))
    emp.overwrite(spark.range(n).select(
        F.col("id").cast("int").alias("id_employee"),
        (F.col("id") % 5000 + 1500).cast("int").alias("gross_salary"),
        F.concat(F.lit("bu"), F.col("id") % 7).alias("business_unity"),
        F.lit("CDI").alias("constract_type")))
    val.overwrite(spark.range(n).select(
        F.col("id").cast("int").alias("id_validate"),
        F.col("id").cast("int").alias("id_employee"),
        (F.col("id") % 3 != 0).alias("is_valid")))
    act.overwrite(spark.range(n * ACTS_PER_EMP).select(
        F.col("id").alias("act_id"),
        (F.col("id") % n).cast("int").alias("id_employee"),
        (F.col("id") % 90 + 10).cast("int").alias("activity_duration")))
    jmv1 = JoinMaterializedView(os.path.join(root, f"jmv1_{m}"),
                                "id_employee", n_buckets=nb,
                                capture_changes=True)
    aggv = AggMaterializedView(os.path.join(root, f"agg_{m}"),
                               "id_employee", "activity_duration",
                               n_buckets=nb, capture_changes=True)
    jmv2 = JoinMaterializedView(os.path.join(root, f"final_{m}"),
                                "id_employee", n_buckets=nb,
                                how="left", capture_changes=True)
    prime = MapMaterializedView(os.path.join(root, f"prime_{m}"),
                                "id_employee", _prime_map,
                                n_buckets=nb)

    def chain():
        jmv1.refresh(spark, emp, val)
        aggv.refresh(spark, act)
        jmv2.refresh(spark, jmv1.view, aggv.view)
        prime.refresh(spark, jmv2.view)

    chain()  # initial build of all four layers
    return emp, val, act, chain, prime


def delta(spark, emp: TxnTable, act: TxnTable, n: int, round_i: int):
    raises = spark.createDataFrame(
        [(k, 9000 + round_i, f"bu{k % 7}", "CDI") for k in RAISED],
        "id_employee int, gross_salary int, business_unity string, "
        "constract_type string")
    emp.merge(spark, raises, "id_employee")
    act.append(spark.createDataFrame(
        [(10**9 + round_i * 1000 + i, RAISED[i % len(RAISED)], 42)
         for i in range(50)],
        "act_id long, id_employee int, activity_duration int"))


def full_rebuild_ms(spark, root, emp, val, act, m) -> float:
    out = TxnTable(os.path.join(root, f"full_{m}"))
    t0 = time.perf_counter()
    agg = (act.read(spark).groupBy("id_employee")
           .agg(F.count(F.lit(1)).alias("cnt"),
                F.sum("activity_duration").alias("sm")))
    final = (emp.read(spark).join(val.read(spark), "id_employee")
             .join(agg, "id_employee", "left"))
    out.overwrite(_prime_map(final))
    return (time.perf_counter() - t0) * 1000


def main() -> None:
    spark = get_spark("final-pipeline-stress")
    root = tempfile.mkdtemp(prefix="samdis_pipe_stress_")
    try:
        for m in (1, 10):
            n = EMP_1X * m
            emp, val, act, chain, prime = build(spark, root, m)
            best = float("inf")
            for r in range(3):  # steady-state: best of 3 delta rounds
                delta(spark, emp, act, n, r)
                t0 = time.perf_counter()
                chain()
                best = min(best, (time.perf_counter() - t0) * 1000)
            full = min(full_rebuild_ms(spark, root, emp, val, act, m)
                       for _ in range(2))
            rows = prime.read(spark).count()
            print(f"m={m:3d} emp={n} acts={n * ACTS_PER_EMP} "
                  f"chain_ms={best:8.0f} full_ms={full:8.0f} "
                  f"prime_rows={rows}", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
