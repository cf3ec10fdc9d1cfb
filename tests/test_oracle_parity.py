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
    df = q.spark_fn(spark, sf_dir)
    assert_oracle_match(df, con, q.oracle, name)
