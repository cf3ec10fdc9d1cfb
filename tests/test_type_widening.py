"""Safe type widening on evolution (r11, VERDICT r10 #4): INT->BIGINT /
FLOAT->DOUBLE through merge_schema append and autoMerge MERGE — the log
records the WIDE type, files keep their narrow physical type and upcast
at the scan, never a rewrite. Narrowing and lossy pairs stay rejected."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F  # noqa: F401

from sport_advantages_moderne_data_infrastructure_spark.sources import (
    txnlog as TL,
)
from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (
    TxnTable,
)


def test_append_widening_end_to_end(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 1.5)], "k int, amt float"))
    t.append(spark.createDataFrame([(2, 2.5)], "k int, amt double"),
             merge_schema=True)
    cur = t.read(spark)
    assert dict(cur.dtypes) == {"k": "int", "amt": "double"}
    assert {(r["k"], r["amt"]) for r in cur.collect()} == {(1, 1.5),
                                                           (2, 2.5)}
    # era-correct time travel: the pre-widening snapshot stays narrow
    assert dict(t.read(spark, version=0).dtypes) == {"k": "int",
                                                     "amt": "float"}
    # protocol floor raised: pre-widening readers refuse
    proto = json.load(open(os.path.join(t.log_dir, "protocol.json")))
    assert proto["min_reader_version"] >= TL.TW_READER_VERSION
    # a NARROWER frame into the widened table upcasts at the scan
    t.append(spark.createDataFrame([(3, 3.5)], "k int, amt float"),
             merge_schema=True)
    cur = t.read(spark)
    assert dict(cur.dtypes) == {"k": "int", "amt": "double"}
    assert cur.count() == 3


def test_merge_automerge_widens_key_type(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 1.0), (2, 2.0)],
                                   "k int, amt double"))
    t.merge(spark, spark.createDataFrame(
        [(2, 20.0), (2 ** 40, 9.0)], "k long, amt double"),
        "k", auto_merge=True)
    cur = t.read(spark)
    assert dict(cur.dtypes) == {"k": "bigint", "amt": "double"}
    assert {(r["k"], r["amt"]) for r in cur.collect()} == {
        (1, 1.0), (2, 20.0), (2 ** 40, 9.0)}
    # the change feed across the boundary coerces consistently
    ch = t.read_changes(spark, since_version=0)
    assert dict(ch.dtypes)["k"] == "bigint"


def test_lossy_and_incompatible_changes_rejected(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 1.0)], "k long, amt double"))
    # long -> double is lossy past 2^53: NOT on the lattice, either way
    with pytest.raises(ValueError, match="not these changes"):
        t.append(spark.createDataFrame([(2.5, 2.0)],
                                       "k double, amt double"),
                 merge_schema=True)
    # long frame into a double column is equally off-lattice
    t2 = TxnTable(str(tmp_path / "t2"))
    t2.append(spark.createDataFrame([(1, 1.0)], "k int, amt double"))
    with pytest.raises(ValueError, match="not these changes"):
        t2.append(spark.createDataFrame([(2, 2)], "k int, amt long"),
                  merge_schema=True)
    # genuine type change still rejected
    with pytest.raises(ValueError, match="not these changes"):
        t2.append(spark.createDataFrame([(3, "x")],
                                        "k int, amt string"),
                  merge_schema=True)


def test_datasource_reads_widened_table(spark, tmp_path):
    from sport_advantages_moderne_data_infrastructure_spark.sources.txnstream import (  # noqa: E501
        register_txn_source,
    )

    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 1.5)], "k int, amt float"))
    t.append(spark.createDataFrame([(2, 2.5)], "k long, amt double"),
             merge_schema=True)
    df = spark.read.format("txnlog").load(t.path)
    assert dict(df.dtypes) == {"k": "bigint", "amt": "double"}
    assert {(r["k"], r["amt"]) for r in df.collect()} == {(1, 1.5),
                                                          (2, 2.5)}
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (spark.readStream.format("txnlog").load(t.path)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 2 and dict(got.dtypes)["k"] == "bigint"


def test_widening_composes_with_column_mapping(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 1.5)], "k int, amt float"))
    t.rename_column("amt", "amount")
    t.append(spark.createDataFrame([(2, 2.5)],
                                   "k int, amount double"),
             merge_schema=True)
    cur = t.read(spark)
    assert dict(cur.dtypes) == {"k": "int", "amount": "double"}
    assert {(r["k"], r["amount"]) for r in cur.collect()} == {
        (1, 1.5), (2, 2.5)}
    # era view: narrow type under the OLD name
    assert dict(t.read(spark, version=0).dtypes) == {"k": "int",
                                                     "amt": "float"}
