#!/usr/bin/env python
"""Measure the serve-side cost of streaming-CC state growth and what
compaction buys back (VERDICT r8 #5): build a MERGE-HEAVY history —
every batch links new docs into the one growing chain, so every batch
appends remap rows — then time the serve join (current_labels drained)
and record the broadcast size (remap rows) and resolution-chain depth
before and after compact(). Run from the repo root:
    python scripts/bench_cc_compaction.py [n_batches]
"""
import sys
import tempfile
import time

from pyspark.sql import SparkSession

sys.path.insert(0, ".")

from sport_advantages_moderne_data_infrastructure_spark.streaming import (  # noqa: E402,E501
    cc as C,
)


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    docs_per_batch = 30
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="cc_compact_bench_")
    a, r = C._tables(root)

    # THREE parallel components, each batch extending EVERY chain with
    # smaller doc ids — every batch re-roots all three components
    # (3 merge rows appended per batch, redirect chains n_batches
    # deep): n_batches=20 gives 60 merges at depth 20, ~10x the gated
    # twin's history in both dimensions. Per-batch ingest cost is a
    # FLAT ~10 s fixed overhead on this box (measured flat batch 0-29),
    # so history length trades directly against script wall time.
    t0 = time.perf_counter()
    n_chains = 3
    hi = 10_000_000
    for i in range(n_batches):
        rows = []
        for c in range(n_chains):
            base = hi + c * 100_000_000 - i * docs_per_batch
            docs = [base - j for j in range(docs_per_batch)]
            rows += [(d, None) for d in docs]        # announcements
            rows += [(d, d + 1) for d in docs[1:]]   # intra-batch chain
            if i > 0:
                rows.append((base, base + 1))  # link to chain c's
                # previous segment -> re-roots component c
        C.ingest_batch(a, r, spark.createDataFrame(
            rows, "doc_id long, nbr long"), i, "bench")
    ingest_wall = time.perf_counter() - t0

    def serve_latency(reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            n = C.current_labels(spark, root).count()
            best = min(best, time.perf_counter() - t0)
        return best, n

    n_remap = r.read(spark).count()
    n_dirs = len(a.snapshot_dirs())
    lat_before, n_docs = serve_latency()
    print(f"RESULT history: {n_batches} batches x {docs_per_batch} docs "
          f"({n_docs} docs), ingest {ingest_wall:.1f}s")
    print(f"RESULT before: remap_rows={n_remap} assign_dirs={n_dirs} "
          f"serve_latency={lat_before:.3f}s")

    t0 = time.perf_counter()
    assert C.compact_if_needed(spark, root, max_remap_rows=64) is True
    compact_wall = time.perf_counter() - t0
    lat_after, n_docs2 = serve_latency()
    assert n_docs2 == n_docs
    print(f"RESULT after: remap_rows={r.read(spark).count()} "
          f"assign_dirs={len(a.snapshot_dirs())} "
          f"serve_latency={lat_after:.3f}s compact_wall={compact_wall:.1f}s")


if __name__ == "__main__":
    main()
