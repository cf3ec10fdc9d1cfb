#!/usr/bin/env python
"""Snapshot-planning cost vs commit count (VERDICT r4 #5).

Builds a txn table with 1200+ commits — tiny driver-written parquet
files through the low-level commit API, which exercises the identical
log/planning machinery as Spark-written commits — interleaved with the
maintenance a long-lived streaming table accrues: bounded DELETE WHERE
rewrites, periodic compaction, change-data-feed reads, periodic log
checkpoints (every 10 commits, the streaming sink's default), and a
final vacuum. At checkpoints of the commit count it measures

  * plan_ck_ms    — snapshot_dirs() planning WITH checkpoints
                    (newest checkpoint + tail replay)
  * plan_full_ms  — the same log with checkpoints ignored (full
                    replay from version 0), the O(commits) baseline
  * commit_ms     — one additional commit's end-to-end latency
                    (includes its own planning + schema derivation)

Planning must stay O(checkpoint interval): flat in table age with
checkpoints, linear without. Run:  python scripts/bench_checkpoint_planning.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sport_advantages_moderne_data_infrastructure_spark.session import get_spark  # noqa: E402
from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (  # noqa: E402
    TxnTable,
)


def tiny_commit(t: TxnTable, i: int) -> None:
    rel = f"data/{uuid.uuid4().hex}"
    os.makedirs(os.path.join(t.path, rel))
    pq.write_table(
        pa.table({"id": pa.array([i * 5 + j for j in range(5)], pa.int64()),
                  "val": [f"v{i}-{j}" for j in range(5)]}),
        os.path.join(t.path, rel, "part-0.parquet"))
    t.commit([rel], [], {"operation": "append"},
             expected_version=t.latest_version())
    t.checkpoint_if_needed(10)


def plan_ms(t: TxnTable, use_checkpoints: bool) -> float:
    """Median-of-5 snapshot planning time. The no-checkpoint leg hides
    the checkpoint files from the planner via a patched lookup."""
    if not use_checkpoints:
        orig = t._base_checkpoint
        t._base_checkpoint = lambda version: None  # type: ignore
    try:
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            t.snapshot_dirs()
            times.append((time.perf_counter() - t0) * 1000)
        times.sort()
        return round(times[2], 2)
    finally:
        if not use_checkpoints:
            t._base_checkpoint = orig  # type: ignore


def main() -> None:
    spark = get_spark("ckpt-planning-bench")
    root = tempfile.mkdtemp(prefix="samdis_ckpt_bench_")
    t = TxnTable(f"{root}/t")
    marks = [100, 300, 600, 900, 1200]
    rows = []
    i = 0
    for mark in marks:
        while (t.latest_version() or 0) < mark:
            i += 1
            tiny_commit(t, i)
            v = t.latest_version()
            # mixed maintenance, as a long-lived table accrues it
            if v % 150 == 0:
                t.delete_where(spark, f"id = {v * 5 - 2}")  # CDF-emitting
            if v % 300 == 0:
                t.compact(spark, target_files=4)
                t.read_changes(spark, since_version=v - 10).count()
        t0 = time.perf_counter()
        tiny_commit(t, 10_000 + mark)
        commit_ms = round((time.perf_counter() - t0) * 1000, 1)
        rows.append({
            "commits": t.latest_version(),
            "live_dirs": len(t.snapshot_dirs()),
            "plan_ck_ms": plan_ms(t, True),
            "plan_full_ms": plan_ms(t, False),
            "commit_ms": commit_ms,
        })
        print(rows[-1], flush=True)
    t.vacuum()
    t0 = time.perf_counter()
    t.snapshot_dirs()
    print({"after_vacuum_plan_ck_ms": round(
        (time.perf_counter() - t0) * 1000, 2)}, flush=True)
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
