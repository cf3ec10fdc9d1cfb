"""Differential test: every catalog query with an oracle must match DuckDB
on the same parquet — a local replica of the driver's t2 gate (sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from sport_advantages_moderne_data_infrastructure_spark.plans import catalog

from .oracle import assert_oracle_match, duck_connection

catalog._load_all()
NAMES = [n for n, q in catalog.REGISTRY.items() if q.oracle is not None]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    q = catalog.REGISTRY[name]
    if "gate_scale_only" in q.tags and sf_dir != "/root/testdata/sf0.01":
        # pinned-golden oracle (e.g. ann_ivf_recall): literals are valid
        # only at the gate's scale — tests/test_driver_gate.py checks it
        # there on every run
        pytest.skip("oracle pinned at gate scale (sf0.01)")
    df = q.spark_fn(spark, sf_dir)
    assert_oracle_match(df, con, q.oracle, name)
