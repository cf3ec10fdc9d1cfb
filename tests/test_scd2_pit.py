"""Point-in-time join against the SCD2 dimension (r8): oracle parity
(LEFT range join on interval containment) is covered by
test_oracle_parity/test_driver_gate; these tests pin the EQUIVALENCE
PRECONDITIONS the as-of implementation relies on, and the semantics of
both arms (real PIT picks + NULL preservation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sport_advantages_moderne_data_infrastructure_spark.plans import catalog
from sport_advantages_moderne_data_infrastructure_spark.plans.core import scd2_runs
from sport_advantages_moderne_data_infrastructure_spark.sources import domain as D

catalog._load_all()


def _dim(spark, sf_dir):
    a = D.sport_activities(spark, sf_dir).select(
        "id_employee", "sport_type", "start_datetime", "id")
    return scd2_runs(a, key="id_employee", attr="sport_type",
                     ts="start_datetime", tie="id")


def test_dim_has_no_ties_or_degenerate_runs(spark, sf_dir):
    """The as-of formulation equals interval containment ONLY while
    runs per key have distinct valid_from and no empty [t, t)
    intervals — pin both so data drift breaks loudly, not silently."""
    dim = _dim(spark, sf_dir)
    assert (dim.groupBy("id_employee", "valid_from").count()
            .filter("count > 1").count()) == 0
    assert dim.filter("valid_to = valid_from").count() == 0
    # runs are contiguous: valid_to of a run == next run's valid_from
    from pyspark.sql import Window as W
    w = W.partitionBy("id_employee").orderBy("valid_from")
    gaps = (dim.withColumn("nxt", F.lead("valid_from").over(w))
            .filter(F.col("nxt").isNotNull()
                    & (F.col("valid_to") != F.col("nxt"))))
    assert gaps.count() == 0


def test_pit_rows_satisfy_containment_and_null_arm(spark, sf_dir):
    """Every non-NULL answer must actually satisfy the interval
    containment it claims (re-checked against the dim, independently of
    the as-of machinery), and NULL answers must be exactly the probes
    with no run starting at or before them."""
    out = catalog.REGISTRY["scd2_point_in_time_join"].spark_fn(
        spark, sf_dir)
    d = _dim(spark, sf_dir).select(
        F.col("id_employee").alias("d_emp"),
        F.col("sport_type").alias("d_sport"),
        F.col("valid_from").alias("d_from"),
        F.col("valid_to").alias("d_to"))
    hits = out.filter(F.col("sport_at_validation").isNotNull())
    assert hits.count() > 0  # the contract is non-vacuous
    bad = (hits.join(
        d, (F.col("id_employee") == F.col("d_emp"))
        & (F.col("sport_since") == F.col("d_from")), "inner")
        .filter((F.col("d_sport") != F.col("sport_at_validation"))
                | (F.col("d_from") > F.col("probe_ts"))
                | (F.col("d_to").isNotNull()
                   & (F.col("probe_ts") >= F.col("d_to")))))
    assert bad.count() == 0
    nulls = out.filter(F.col("sport_at_validation").isNull())
    covered = (nulls.join(
        d, (F.col("id_employee") == F.col("d_emp"))
        & (F.col("d_from") <= F.col("probe_ts")), "inner"))
    assert covered.count() == 0


def test_pit_plan_is_equi_join_not_range_join(spark, sf_dir):
    """The scale claim: the bucketed as-of serves the range-join
    semantics through (key, bucket) EQUI-candidates — no
    BroadcastNestedLoopJoin / CartesianProduct may appear."""
    import contextlib
    import io

    df = catalog.REGISTRY["scd2_point_in_time_join"].spark_fn(
        spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
