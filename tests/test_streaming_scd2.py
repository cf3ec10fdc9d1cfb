"""Incremental SCD2 dimension maintenance (streaming/scd2.py): the
continuously-maintained dimension must equal the batch derivation for
ANY arrival order — including a late event that retroactively SPLITS an
existing run (the case collapsed-state incremental maintenance gets
wrong, and the reason the dim leg recomputes from raw) — and replaying
on the same checkpoint must change nothing."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F  # noqa: F401

from sport_advantages_moderne_data_infrastructure_spark.plans.core import (
    scd2_runs,
)
from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (
    TxnTable,
)
from sport_advantages_moderne_data_infrastructure_spark.streaming.scd2 import (
    read_dim,
    write_stream_scd2,
)

_SCHEMA = ("id_employee long, sport_type string, "
           "start_datetime timestamp, id long")


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, second)


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, a, ts, i) for k, a, ts, i in rows], _SCHEMA)


def _run(spark, src, raw, dim, ck):
    q = write_stream_scd2(
        spark.readStream.schema(_SCHEMA).parquet(src),
        raw, dim, ck, key="id_employee", attr="sport_type",
        ts="start_datetime", tie="id", n_buckets=4, app_id="scd2test")
    q.awaitTermination(120)


def _dim_set(spark, dim):
    return {(r.id_employee, r.sport_type, r.valid_from, r.valid_to,
             r.is_current) for r in read_dim(spark, dim).collect()}


def _batch_set(spark, raw):
    full = TxnTable(raw).read(spark).select(
        "id_employee", "sport_type", "start_datetime", "id")
    return {(r.id_employee, r.sport_type, r.valid_from, r.valid_to,
             r.is_current)
            for r in scd2_runs(full, key="id_employee", attr="sport_type",
                               ts="start_datetime", tie="id").collect()}


def test_scd2_stream_equals_batch_with_late_run_split(spark, tmp_path):
    src = str(tmp_path / "src")
    raw, dim, ck = (str(tmp_path / "raw"), str(tmp_path / "dim"),
                    str(tmp_path / "ck"))

    # batch 1: key 1 holds A across two events (ONE run); keys 2 and 5
    # (bucket-mates of 1 under n_buckets=4: 1%4 == 5%4) start X and P
    _df(spark, [(1, "A", _t(0), 10), (1, "A", _t(10), 11),
                (2, "X", _t(0), 20), (5, "P", _t(0), 50)]) \
        .coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, raw, dim, ck)
    assert _dim_set(spark, dim) == _batch_set(spark, raw)
    assert (1, "A", _t(0), None, 1) in _dim_set(spark, dim)

    # batch 2: key 2 changes (X -> Y); key 1's bucket untouched
    _df(spark, [(2, "Y", _t(20), 21)]) \
        .coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, raw, dim, ck)
    got = _dim_set(spark, dim)
    assert got == _batch_set(spark, raw)
    assert (2, "X", _t(0), _t(20), 0) in got
    assert (2, "Y", _t(20), None, 1) in got

    # batch 3: LATE event for key 1 at t=5 with B — lands BETWEEN the
    # two A events and splits the single A-run into A | B | A. A
    # maintainer working from collapsed dimension state would emit only
    # A | B (the second A was dropped as a non-change); recompute-from-
    # raw restores it.
    _df(spark, [(1, "B", _t(5), 12)]) \
        .coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, raw, dim, ck)
    got = _dim_set(spark, dim)
    assert got == _batch_set(spark, raw)
    assert (1, "A", _t(0), _t(5), 0) in got
    assert (1, "B", _t(5), _t(10), 0) in got
    assert (1, "A", _t(10), None, 1) in got
    # bucket-mates and other buckets untouched by the recompute
    assert (5, "P", _t(0), None, 1) in got
    assert (2, "Y", _t(20), None, 1) in got

    # restart on the same checkpoint: exactly-once on BOTH legs
    n_raw = TxnTable(raw).read(spark).count()
    before = got
    _run(spark, src, raw, dim, ck)
    assert TxnTable(raw).read(spark).count() == n_raw
    assert _dim_set(spark, dim) == before


def test_scd2_stream_multi_batch_files_single_start(spark, tmp_path):
    """Several source files consumed as separate micro-batches in one
    run (maxFilesPerTrigger=1) still converge to the batch answer."""
    src = str(tmp_path / "src")
    raw, dim, ck = (str(tmp_path / "raw"), str(tmp_path / "dim"),
                    str(tmp_path / "ck"))
    for i, rows in enumerate([
        [(7, "A", _t(0), 70), (8, "X", _t(1), 80)],
        [(7, "B", _t(2), 71)],
        [(7, "B", _t(3), 72), (8, "X", _t(4), 81), (9, "Z", _t(5), 90)],
    ]):
        _df(spark, rows).coalesce(1).write.mode("append").parquet(src)
    q = write_stream_scd2(
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1").parquet(src),
        raw, dim, ck, key="id_employee", attr="sport_type",
        ts="start_datetime", tie="id", n_buckets=4, app_id="scd2multi")
    q.awaitTermination(120)
    assert _dim_set(spark, dim) == _batch_set(spark, raw)
    assert (7, "A", _t(0), _t(2), 0) in _dim_set(spark, dim)
    assert (8, "X", _t(1), None, 1) in _dim_set(spark, dim)


# -- property: maintained dim == full recompute, any arrival order ---------


def _tracked_set(df):
    return {tuple(r) for r in df.collect()}


def test_scd2_property_arbitrary_arrival_orders(spark, tmp_path):
    """Hypothesis over event streams split into micro-batches in
    arbitrary order: after the stream drains, the maintained dimension
    (INCLUDING the maintenance bookkeeping columns) must equal
    scd2_tracked over the full raw history — late events, run splits,
    duplicate keys and ts collisions included (VERDICT r5 #1 done
    criterion)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from sport_advantages_moderne_data_infrastructure_spark.streaming.scd2 import (
        scd2_tracked,
    )

    event = st.tuples(st.integers(0, 5),               # key
                      st.sampled_from(["A", "B", "C"]),  # attr
                      st.integers(0, 15))              # ts minute
    streams = st.lists(st.lists(event, min_size=1, max_size=8),
                       min_size=1, max_size=3)

    counter = [0]

    @given(batches=streams)
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def run(batches):
        counter[0] += 1
        base = tmp_path / f"case{counter[0]}"
        src, raw, dim, ck = (str(base / "src"), str(base / "raw"),
                             str(base / "dim"), str(base / "ck"))
        tie = [0]
        for rows in batches:
            _df(spark, [(k, a, _t(m), (tie := [tie[0] + 1])[0])
                        for k, a, m in rows]) \
                .coalesce(1).write.mode("append").parquet(src)
        q = write_stream_scd2(
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", "1").parquet(src),
            raw, dim, ck, key="id_employee", attr="sport_type",
            ts="start_datetime", tie="id", n_buckets=4,
            app_id=f"scd2prop{counter[0]}")
        q.awaitTermination(120)
        full = TxnTable(raw).read(spark).select(
            "id_employee", "sport_type", "start_datetime", "id")
        want = _tracked_set(scd2_tracked(
            full, key="id_employee", attr="sport_type",
            ts="start_datetime", tie="id"))
        got = _tracked_set(TxnTable(dim).read(spark).drop("key_bucket"))
        assert got == want

    run()


def test_scd2_duplicate_event_redelivery(spark, tmp_path):
    """An at-least-once upstream re-sends an already-landed event (same
    key/ts/tie) in a LATER batch: classified late (bmin == plast), the
    slow path recomputes from raw where the duplicate rows collapse —
    the dim stays equal to the batch derivation."""
    src = str(tmp_path / "src")
    raw, dim, ck = (str(tmp_path / "raw"), str(tmp_path / "dim"),
                    str(tmp_path / "ck"))
    _df(spark, [(1, "A", _t(0), 10), (1, "B", _t(5), 11)]) \
        .coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, raw, dim, ck)
    _df(spark, [(1, "B", _t(5), 11)]) \
        .coalesce(1).write.mode("append").parquet(src)  # re-delivery
    _run(spark, src, raw, dim, ck)
    got = _dim_set(spark, dim)
    assert got == _batch_set(spark, raw)
    assert got == {(1, "A", _t(0), _t(5), 0), (1, "B", _t(5), None, 1)}
