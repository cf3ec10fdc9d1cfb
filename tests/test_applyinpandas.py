"""applyInPandas (grouped-map) surface: the per-group numpy OLS must agree
with the JVM covariance-identity aggregate (same math, two strategies —
the pandas path exists for group algorithms SQL can't express; this test
pins that the plumbing is correct where both CAN express it)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sport_advantages_moderne_data_infrastructure_spark.plans import catalog
from sport_advantages_moderne_data_infrastructure_spark.sources.tables import (
    load_table,
)

catalog._load_all()


def test_applyinpandas_trend_matches_jvm(spark, sf_dir):
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "events")

    def ols(pdf: "pd.DataFrame") -> "pd.DataFrame":
        x = (pdf["ts"].astype("int64") / 1e9 - 1704067200) / 86400.0
        v = pdf["value"].to_numpy()
        slope = float(np.cov(x, v, bias=True)[0, 1] / np.var(x))
        return pd.DataFrame({
            "user_id": [pdf["user_id"].iloc[0]],
            "n": [len(pdf)],
            "slope_per_day": [round(slope, 4)],
        })

    got = {r["user_id"]: (r["n"], r["slope_per_day"]) for r in
           e.select("user_id", "ts", "value").groupBy("user_id")
           .applyInPandas(ols, "user_id long, n long, slope_per_day double")
           .collect()}
    want = {r["user_id"]: (r["n"], r["slope_per_day"]) for r in
            catalog.REGISTRY["user_value_trend"].spark_fn(spark, sf_dir)
            .collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) <= 1e-3, (k, got[k], want[k])
