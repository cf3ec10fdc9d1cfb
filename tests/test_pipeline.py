"""End-to-end batch pipeline: quality gate → final → prime → partitioned
write, plus the hard-fail path on dirty data."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sport_advantages_moderne_data_infrastructure_spark.operators.quality import (
    quality_report,
)
from sport_advantages_moderne_data_infrastructure_spark.pipeline import (
    DataQualityError, run_batch_pipeline,
)


def test_pipeline_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "prime_out")
    res = run_batch_pipeline(spark, sf_dir, out)
    assert all(q["passed"] for q in res.quality)
    assert res.final_rows > 0
    assert res.prime_rows == res.final_rows  # 1:1 inner self-join
    written = spark.read.parquet(out)
    assert written.count() == res.prime_rows
    # partitioned layout materialized
    assert "business_unity" in written.columns


def test_quality_gate_hard_fails_on_dirty_data(spark, sf_dir):
    from sport_advantages_moderne_data_infrastructure_spark.sources import (
        domain as D,
    )
    dirty = D.sport_activities(spark, sf_dir).withColumn(
        "activity_duration",
        F.when(F.col("id") % 50 == 0, -5).otherwise(F.col("activity_duration")))
    rep = {r["expectation"]: r["passed"]
           for r in quality_report(dirty).collect()}
    assert rep["activity_duration_non_negative"] is False
    assert rep["sport_type_not_null"] is True
