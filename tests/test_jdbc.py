"""S4/K3 JDBC edges exercised FOR REAL via embedded Derby (ships in
Spark's jars/ as the metastore dependency — no external DB needed;
VERDICT.md r1 next-round #6). Round-trip: write_jdbc → partitioned
read_jdbc_partitioned → exact value compare vs the source DataFrame.

Also pins the S5 Excel edge's failure mode: a MALFORMED workbook must
fail with a clear early error (never a hung executor) — since r3 the
happy path executes for real via the stdlib xlsx parser, pinned against
the reference workbook in tests/test_xlsx.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sport_advantages_moderne_data_infrastructure_spark.sources import io
from sport_advantages_moderne_data_infrastructure_spark.sources.tables import load_table

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture()
def derby_url(spark, tmp_path):
    # keep derby.log out of the repo root
    spark.sparkContext._jvm.System.setProperty(
        "derby.stream.error.file", str(tmp_path / "derby.log"))
    return f"jdbc:derby:{tmp_path}/derbydb;create=true"


def test_jdbc_roundtrip_partitioned(spark, sf_dir, derby_url):
    src = (load_table(spark, sf_dir, "nation")
           .select("n_nationkey", "n_name", "n_regionkey"))
    io.write_jdbc(src, derby_url, "nation_rt", mode="overwrite",
                  properties=DERBY_PROPS)

    back = io.read_jdbc_partitioned(
        spark, derby_url, "nation_rt", partition_column="n_nationkey",
        lower=0, upper=25, num_partitions=4, properties=DERBY_PROPS)

    # the partitioned scan really fans out into range-bounded tasks
    assert back.rdd.getNumPartitions() == 4
    assert sorted(back.collect()) == sorted(src.collect())


def test_jdbc_append_accumulates(spark, sf_dir, derby_url):
    src = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    io.write_jdbc(src, derby_url, "region_rt", mode="overwrite",
                  properties=DERBY_PROPS)
    io.write_jdbc(src, derby_url, "region_rt", mode="append",
                  properties=DERBY_PROPS)
    back = io.read_jdbc_partitioned(
        spark, derby_url, "region_rt", partition_column="r_regionkey",
        lower=0, upper=5, num_partitions=2, properties=DERBY_PROPS)
    assert back.count() == 2 * src.count()
    assert (back.groupBy("r_regionkey").count()
            .filter(F.col("count") != 2).count() == 0)


def test_partition_overwrite_is_incremental(spark, sf_dir, tmp_path):
    """write_overwrite_partitions must rewrite ONLY the partitions present
    in the incoming batch: untouched partitions keep their exact files
    (the incremental replacement for the reference's full-table rewrite)."""
    import os

    out = str(tmp_path / "orders_part")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus")
    io.write_overwrite(orders, out, partition_by=["o_orderstatus"])

    def files_of(status):
        d = f"{out}/o_orderstatus={status}"
        return sorted((f, os.path.getmtime(f"{d}/{f}"))
                      for f in os.listdir(d) if f.endswith(".parquet"))

    before_f = files_of("F")
    before_o = files_of("O")

    patch = (orders.filter(F.col("o_orderstatus") == "O")
             .withColumn("o_totalprice", F.col("o_totalprice") + 1))
    io.write_overwrite_partitions(patch, out, ["o_orderstatus"])

    # untouched partition: identical files, identical mtimes
    assert files_of("F") == before_f
    # touched partition: physically rewritten
    assert files_of("O") != before_o
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    want = (orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderstatus") == "O",
               F.col("o_totalprice") + 1).otherwise(F.col("o_totalprice"))))
    assert (back.select("o_orderkey", "o_totalprice").exceptAll(
        want.select("o_orderkey", "o_totalprice")).count() == 0)


def test_wait_for_source_preflight(spark, sf_dir, tmp_path):
    """Q5 existence preflight: True for a readable source, False (not an
    exception) on timeout, True when the source appears mid-wait — the
    reference's bootstrap retry loop (read_delta.py:47-53)."""
    import threading

    from sport_advantages_moderne_data_infrastructure_spark.sources.tables import (
        load_table as lt,
        wait_for_source,
    )

    assert wait_for_source(spark, f"{sf_dir}/region.parquet", timeout_sec=5)
    assert not wait_for_source(spark, str(tmp_path / "never"),
                               timeout_sec=2, poll_sec=0.2)

    late = str(tmp_path / "late")

    def _writer():
        import time
        time.sleep(1.5)
        lt(spark, sf_dir, "region").write.parquet(late)

    t = threading.Thread(target=_writer)
    t.start()
    try:
        assert wait_for_source(spark, late, timeout_sec=30, poll_sec=0.2)
    finally:
        t.join()


def test_read_excel_fails_fast_on_malformed_workbook(spark, tmp_path):
    pd = pytest.importorskip("pandas")
    try:
        import openpyxl  # noqa: F401
        pytest.skip("openpyxl present — gate test not applicable")
    except ImportError:
        pass
    import zipfile
    fake = tmp_path / "hr.xlsx"
    fake.write_bytes(b"PK\x03\x04 not a real workbook")
    # pandas raises ImportError (no openpyxl) or a container error; the
    # stdlib fallback then hits the zip probe — all clear, early errors
    with pytest.raises((ImportError, ValueError, zipfile.BadZipFile)):
        io.read_excel(spark, str(fake))
    # the CSV twin still serves the same downstream transforms
    csv = tmp_path / "hr.csv"
    csv.write_text("id_employee,gross_salary\n1,1000\n2,2000\n")
    df = io.read_tabular(spark, str(csv))
    assert df.count() == 2 and "gross_salary" in df.columns
    assert pd is not None  # importorskip guard used above
