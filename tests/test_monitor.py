"""Stream observability: the push-based progress monitor must see every
micro-batch and account for every input row (reference monitor loop
semantics, SaveDelta.scala:176-203, without the per-tick table rescan)."""

from __future__ import annotations

from sport_advantages_moderne_data_infrastructure_spark.sources import domain as D
from sport_advantages_moderne_data_infrastructure_spark.streaming import (
    pipeline as P,
)
from sport_advantages_moderne_data_infrastructure_spark.streaming.monitor import (
    ProgressMonitor,
)


def test_progress_monitor_accounts_all_rows(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    cdc = D.cdc_events(spark, sf_dir)
    cdc.write.parquet(src)
    mon = ProgressMonitor()
    spark.streams.addListener(mon)
    try:
        q = P.write_stream_memory(
            P.stream_cdc_from_files(spark, src), "mon_mem")
        q.awaitTermination(120)
        qid = str(q.id)
        # listener events are async — give the bus a moment
        import time
        for _ in range(20):
            if mon.stats.get(qid) and mon.stats[qid].batches > 0:
                break
            time.sleep(0.5)
        s = mon.stats[qid]
        assert s.batches >= 1
        assert s.total_rows == cdc.count()
        assert mon.summary()[qid]["mean_rows_per_batch"] > 0
    finally:
        spark.streams.removeListener(mon)
