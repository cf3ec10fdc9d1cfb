"""Stream observability — the reference's monitor loop
(spark/SaveDelta.scala:176-219) done the idiomatic way.

The reference polls ``query.status`` every 30 s AND re-reads + counts the
whole Delta table per tick (a full scan per 30 s — unusable at scale). Here
a StreamingQueryListener accumulates the same metrics (rows/batch,
input/processed rows-per-second) push-based, from the engine's own progress
events: zero extra scans at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class StreamStats:
    batches: int = 0
    total_rows: int = 0
    rows_per_batch: list = field(default_factory=list)
    input_rows_per_sec: list = field(default_factory=list)
    processed_rows_per_sec: list = field(default_factory=list)


class ProgressMonitor(StreamingQueryListener):
    """Collects per-query throughput stats (A4/T6)."""

    def __init__(self) -> None:
        self.stats: dict[str, StreamStats] = {}

    def onQueryStarted(self, event) -> None:  # noqa: N802
        self.stats.setdefault(str(event.id), StreamStats())

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        s = self.stats.setdefault(str(p.id), StreamStats())
        s.batches += 1
        s.total_rows += p.numInputRows
        s.rows_per_batch.append(p.numInputRows)
        if p.inputRowsPerSecond is not None:
            s.input_rows_per_sec.append(p.inputRowsPerSecond)
        if p.processedRowsPerSecond is not None:
            s.processed_rows_per_sec.append(p.processedRowsPerSecond)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def summary(self) -> dict:
        return {
            qid: {
                "batches": s.batches,
                "total_rows": s.total_rows,
                "mean_rows_per_batch":
                    (s.total_rows / s.batches) if s.batches else 0.0,
            }
            for qid, s in self.stats.items()
        }

    def reconcile(self, query_id: str, sink_rows: int,
                  filtered_rows: int = 0) -> dict:
        """Drift reconciliation (SaveDelta.scala:209-219 semantics): compare
        cumulative listener-observed input rows against an actual sink
        count and explain the difference — on demand, not the reference's
        full table re-scan every 30 s tick.

        ``filtered_rows``: rows the pipeline intentionally drops between
        source and sink (parse rejects, dedup) so legitimate attrition
        isn't reported as drift.
        """
        s = self.stats.get(query_id, StreamStats())
        drift = s.total_rows - filtered_rows - sink_rows
        if drift == 0:
            explanation = "in sync"
        elif drift > 0:
            explanation = ("listener ahead of sink: in-flight/uncommitted "
                           "batch, or unaccounted filter/dedup drops")
        else:
            explanation = ("sink ahead of listener: pre-existing sink data "
                           "or another writer")
        return {
            "cumulative_input_rows": s.total_rows,
            "accounted_filtered_rows": filtered_rows,
            "sink_rows": sink_rows,
            "drift": drift,
            "explanation": explanation,
        }
