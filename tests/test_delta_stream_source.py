"""Structured-Streaming SOURCE over a foreign Delta directory
(streaming/deltasource.py, r14 session 5) — Spark 4's Python
DataSource API with version-based offsets, Arrow-batch executor
reads, and Delta's streaming semantics for non-append commits.
Reference anchor: the reference streams FROM its Delta sink
(spark/SaveDelta.scala:157-163 is the producing side)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sport_advantages_moderne_data_infrastructure_spark.sources.deltainterop import (
    export_delta_log,
)
from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import TxnTable
from sport_advantages_moderne_data_infrastructure_spark.streaming.deltasource import (
    stream_delta_dir,
)


def _orders(spark, n=120):
    return (spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
            .select("o_orderkey", "o_totalprice", "o_orderdate")
            .orderBy("o_orderkey").limit(n))


def _drain(spark, df, out_dir, ckpt):
    q = (df.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    try:
        return spark.read.parquet(out_dir)
    except Exception:  # noqa: BLE001 — no batches yet
        return None


def test_stream_earliest_replays_appends(spark, tmp_path):
    """startingVersion='earliest': every append commit flows once,
    rows byte-equal the table, partition columns re-attached."""
    o = _orders(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.set_generated_column("order_year",
                           "DATE_FORMAT(o_orderdate, 'yyyy')")
    t.set_partition_column("order_year")
    t.append(o.limit(60))
    t.append(o.offset(60))
    export_delta_log(t)
    df = stream_delta_dir(spark, t.path, startingVersion="earliest")
    got = _drain(spark, df, str(tmp_path / "out"),
                 str(tmp_path / "ck"))
    want = t.read(spark)
    assert got.count() == want.count() == 120
    g = {(r["o_orderkey"], r["cents"], r["order_year"]) for r in
         got.select("o_orderkey",
                    F.round(F.col("o_totalprice") * 100)
                    .cast("bigint").alias("cents"),
                    F.col("order_year").cast("string")
                    .alias("order_year")).collect()}
    w = {(r["o_orderkey"], r["cents"], r["order_year"]) for r in
         want.select("o_orderkey",
                     F.round(F.col("o_totalprice") * 100)
                     .cast("bigint").alias("cents"),
                     F.col("order_year").cast("string")
                     .alias("order_year")).collect()}
    assert g == w


def test_stream_restart_is_exactly_once(spark, tmp_path):
    """Restarting on the same checkpoint after new commits delivers
    ONLY the new versions — offsets ride Spark's checkpoint."""
    o = _orders(spark)
    t = TxnTable(str(tmp_path / "x"))
    t.append(o.limit(50))
    export_delta_log(t)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    got = _drain(spark, stream_delta_dir(
        spark, t.path, startingVersion="earliest"), out, ck)
    assert got.count() == 50
    t.append(o.offset(50).limit(30))
    export_delta_log(t)
    got = _drain(spark, stream_delta_dir(
        spark, t.path, startingVersion="earliest"), out, ck)
    assert got.count() == 80  # 50 + 30, nothing replayed
    keys = [r["o_orderkey"] for r in got.collect()]
    assert len(keys) == len(set(keys))


def test_stream_latest_default_skips_history(spark, tmp_path):
    """Default bootstrap is LATEST: only commits made after the stream
    starts flow (Delta's default semantics)."""
    o = _orders(spark)
    t = TxnTable(str(tmp_path / "l"))
    t.append(o.limit(40))
    export_delta_log(t)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    got = _drain(spark, stream_delta_dir(spark, t.path), out, ck)
    assert got is None or got.count() == 0
    t.append(o.offset(40).limit(25))
    export_delta_log(t)
    got = _drain(spark, stream_delta_dir(spark, t.path), out, ck)
    assert got.count() == 25


def test_stream_change_commit_semantics(spark, tmp_path):
    """A data-changing rewrite poisons an append-only stream: default
    raises with resync guidance; skipChangeCommits=true skips the
    commit and the stream continues with later appends."""
    o = _orders(spark)
    t = TxnTable(str(tmp_path / "c"))
    t.append(o.limit(60))
    t.delete_where(spark, "o_orderkey % 7 = 0")  # rewrite commit
    t.append(o.offset(60).limit(20))
    export_delta_log(t)
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException,
                       match="skipChangeCommits"):
        df = stream_delta_dir(spark, t.path,
                              startingVersion="earliest")
        q = (df.writeStream.format("parquet")
             .option("path", str(tmp_path / "bad"))
             .option("checkpointLocation", str(tmp_path / "bck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
    got = _drain(spark,
                 stream_delta_dir(spark, t.path,
                                  startingVersion="earliest",
                                  skipChangeCommits="true"),
                 str(tmp_path / "out"), str(tmp_path / "ck"))
    # v0 appends + v2 appends; the rewrite commit v1 skipped wholesale
    assert got.count() == 80


def test_stream_refusals_are_loud(spark, tmp_path):
    """Column-mapped tables and non-Delta dirs refuse at plan time;
    batch reads point at read_delta_dir."""
    o = _orders(spark, 30)
    t = TxnTable(str(tmp_path / "m"))
    t.append(o)
    t.rename_column("o_totalprice", "price")  # activates mapping
    export_delta_log(t)
    with pytest.raises(Exception, match="column-mapped"):
        _drain(spark, stream_delta_dir(spark, t.path,
                                       startingVersion="earliest"),
               str(tmp_path / "o1"), str(tmp_path / "c1"))
    with pytest.raises(Exception, match="_delta_log"):
        _drain(spark, stream_delta_dir(spark, str(tmp_path / "nope")),
               str(tmp_path / "o2"), str(tmp_path / "c2"))


def test_stream_rate_limit_and_e2e_loop(spark, tmp_path):
    """maxVersionsPerTrigger bounds each micro-batch at version
    granularity (offset files show multiple batches), and the FULL
    interop loop closes: engine streaming sink --export_delta-->
    Delta dir --delta_dir source--> second engine table, byte-equal
    with the origin."""
    o = _orders(spark)
    t = TxnTable(str(tmp_path / "r"))
    t.append(o.limit(30))
    export_delta_log(t)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    # rate limiting engages from the SECOND planned batch (the first
    # catches up wholesale — see latestOffset), and needs a RUNNING
    # trigger: commits appended mid-stream flow one version per
    # micro-batch
    import time as _time

    q = (stream_delta_dir(spark, t.path, startingVersion="earliest",
                          maxVersionsPerTrigger=1)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(processingTime="300 milliseconds").start())

    def _count():
        try:
            return spark.read.parquet(out).count()
        except Exception:  # noqa: BLE001 — no batch yet
            return 0

    deadline = _time.time() + 120
    while _time.time() < deadline and _count() < 30:
        _time.sleep(1)
    assert _count() == 30  # batch 0: the pre-stream history
    t.append(o.offset(30).limit(30))
    t.append(o.offset(60).limit(30))
    t.append(o.offset(90))
    export_delta_log(t)
    deadline = _time.time() + 240
    while _time.time() < deadline and _count() < 120:
        _time.sleep(1)
    q.stop()
    assert _count() == 120
    offsets = [f for f in os.listdir(os.path.join(ck, "offsets"))
               if f.isdigit()]
    assert len(offsets) >= 4  # 3 new versions -> >= 3 capped batches

    # e2e loop: consume the stream INTO a second txn table and compare
    from sport_advantages_moderne_data_infrastructure_spark.streaming import (
        pipeline as P,
    )

    t2_path = str(tmp_path / "t2")
    q = P.write_stream_txn_append(
        stream_delta_dir(spark, t.path, startingVersion="earliest"),
        t2_path, str(tmp_path / "ck2"), app_id="loop")
    q.awaitTermination(300)
    t2 = TxnTable(t2_path)
    a = {(r["o_orderkey"], r["cents"]) for r in t.read(spark).select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100)
        .cast("bigint").alias("cents")).collect()}
    b = {(r["o_orderkey"], r["cents"]) for r in t2.read(spark).select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100)
        .cast("bigint").alias("cents")).collect()}
    assert a == b and len(a) == 120
