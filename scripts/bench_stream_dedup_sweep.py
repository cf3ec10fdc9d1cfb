#!/usr/bin/env python
"""Streaming-dedup throughput vs micro-batch size (VERDICT r5 #5).

The r5 headline number (898 docs/s at sf0.1) was measured at 4
micro-batches of ~1.8k docs; PLANS.md claimed the cost is per-batch
fixed overhead that amortizes with batch size. This sweep proves or
refutes that: the same corpus drains at 8/4/2/1 micro-batches (8 source
files, maxFilesPerTrigger in 1/2/4/8) with two reps each, best
reported. Run:  python scripts/bench_stream_dedup_sweep.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

from sport_advantages_moderne_data_infrastructure_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("sdedup-sweep")
    _ = bench.bench_stream_dedup(spark, sf_dir, files_per_trigger=2)  # warm
    for fpt in (1, 2, 4, 8):
        runs = [bench.bench_stream_dedup(spark, sf_dir, files_per_trigger=fpt)
                for _ in range(2)]
        best = max(runs, key=lambda r: r["docs_per_sec"])
        n_batches = (8 + fpt - 1) // fpt
        print({"files_per_trigger": fpt, "micro_batches": n_batches,
               "docs_per_batch": best["input_docs"] // n_batches,
               "docs_per_sec": best["docs_per_sec"],
               "wall_sec": best["wall_sec"],
               "kept_docs": best["kept_docs"],
               "all_reps": [r["docs_per_sec"] for r in runs]}, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
