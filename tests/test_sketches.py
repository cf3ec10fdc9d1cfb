"""Misra-Gries heavy hitters (r8): oracle parity (full GROUP BY/HAVING
hash) is covered by test_oracle_parity/test_driver_gate; these pin the
sketch's guarantees directly — no false negatives from pass 1, exact
recovery end-to-end, partitioning invariance, bounded candidate
volume."""

from __future__ import annotations

from pyspark.sql import functions as F

from sport_advantages_moderne_data_infrastructure_spark.operators.sketches import (
    heavy_hitters_exact, mg_candidates,
)
from sport_advantages_moderne_data_infrastructure_spark.plans import catalog
from sport_advantages_moderne_data_infrastructure_spark.sources.tables import load_table

catalog._load_all()

PHI = 0.007
K = 143  # ceil(1/PHI)


def _exact_hh(e, phi):
    c = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    n = e.count()
    return {r["user_id"]: r["cnt"]
            for r in c.filter(F.col("cnt") > phi * n).collect()}


def test_mg_candidates_superset_and_bounded(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    truth = _exact_hh(e, PHI)
    cand = {r["user_id"]
            for r in mg_candidates(e, "user_id", K).collect()}
    missing = set(truth) - cand
    assert missing == set(), f"MG false negatives: {missing}"
    n_parts = e.rdd.getNumPartitions()
    assert len(cand) <= n_parts * K


def test_heavy_hitters_exact_recovery(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    truth = _exact_hh(e, PHI)
    got = {r["user_id"]: r["cnt"]
           for r in heavy_hitters_exact(e, "user_id", PHI).collect()}
    assert got == truth  # exact keys AND exact counts


def test_heavy_hitters_partitioning_invariant(spark, sf_dir):
    """The per-partition sketch sees different slices under different
    partitionings; the RESULT may not change (candidates are a
    superset either way, pass 2 is exact)."""
    e = load_table(spark, sf_dir, "events")
    a = {(r["user_id"], r["cnt"]) for r in heavy_hitters_exact(
        e.repartition(3), "user_id", PHI).collect()}
    b = {(r["user_id"], r["cnt"]) for r in heavy_hitters_exact(
        e.repartition(13), "user_id", PHI).collect()}
    assert a == b and len(a) > 0


def test_heavy_hitters_high_phi_is_empty_not_wrong(spark, sf_dir):
    """With phi above every share, the cut must produce an empty frame
    (candidate proposals alone never leak into the answer)."""
    e = load_table(spark, sf_dir, "events")
    assert heavy_hitters_exact(e, "user_id", 0.5).count() == 0


def test_heavy_hitters_plan_shape(spark, sf_dir):
    """Pass 2's only join is the broadcast candidate tag; nothing may
    plan all-pairs."""
    import contextlib
    import io

    df = catalog.REGISTRY["heavy_hitters_users"].spark_fn(
        spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
