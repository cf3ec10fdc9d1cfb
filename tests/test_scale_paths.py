"""Scale-path demonstrations: partition pruning on partitioned writes and
HLL approximate distinct — the techniques ARCHITECTURE.md commits to."""

from __future__ import annotations

import contextlib
import io as _io

from pyspark.sql import functions as F

from sport_advantages_moderne_data_infrastructure_spark.plans import catalog
from sport_advantages_moderne_data_infrastructure_spark.sources.io import (
    write_overwrite,
)
from sport_advantages_moderne_data_infrastructure_spark.sources.tables import (
    load_table,
)

catalog._load_all()


def _plan(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "final_parted")
    final = catalog.REGISTRY["final_table"].spark_fn(spark, sf_dir)
    write_overwrite(final, out, partition_by=["business_unity"])
    re = spark.read.parquet(out)
    one = re.filter(F.col("business_unity") == "BUILDING")
    plan = _plan(one)
    # the filter must become a partition filter on the scan, not a row filter
    assert "PartitionFilters" in plan
    assert "business_unity" in plan.split("PartitionFilters", 1)[1][:200]
    want = final.filter(F.col("business_unity") == "BUILDING").count()
    assert one.count() == want


def test_approx_count_distinct_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select("l_partkey").distinct().count()
    approx = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a")
    ).collect()[0]["a"]
    # HLL++ at 2% rsd: allow 5x the nominal error bound
    assert abs(approx - exact) / exact < 0.10, (approx, exact)
