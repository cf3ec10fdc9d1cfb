"""Config-driven quality suites (the GE-YAML shape without the GE/Airflow
runtime): a plain-dict spec compiles to run_suite rules, evaluates in ONE
aggregation pass, and stays DuckDB-oracle-checkable via suite_sql."""

from __future__ import annotations

from sport_advantages_moderne_data_infrastructure_spark.operators import quality as Q
from sport_advantages_moderne_data_infrastructure_spark.sources.tables import load_table

from .oracle import assert_oracle_match, duck_connection

LINEITEM_SUITE = [
    {"column": "l_orderkey", "expectation": "not_null"},
    {"column": "l_quantity", "expectation": "non_negative"},
    {"column": "l_discount", "expectation": "between", "min": 0, "max": 1},
    {"column": "l_returnflag", "expectation": "in_set",
     "values": ["A", "N", "R"]},
    {"column": "l_linestatus", "expectation": "min_length", "n": 1},
]


def test_config_suite_matches_oracle(spark, sf_dir):
    rules = Q.rules_from_config(LINEITEM_SUITE)
    df = Q.run_suite(load_table(spark, sf_dir, "lineitem"), rules)
    con = duck_connection(sf_dir)
    try:
        assert_oracle_match(df, con, Q.suite_sql(rules, "lineitem"),
                            "config_suite")
    finally:
        con.close()


def test_config_suite_detects_violations(spark, sf_dir):
    # a rule crafted to fail: every discount is < 0.9
    rules = Q.rules_from_config([
        {"column": "l_discount", "expectation": "between",
         "min": 0.9, "max": 1.0, "name": "discount_implausible"}])
    rows = {r["expectation"]: (r["failing_rows"], r["passed"])
            for r in Q.run_suite(
                load_table(spark, sf_dir, "lineitem"), rules).collect()}
    failing, passed = rows["discount_implausible"]
    assert failing > 0 and passed is False


def test_unknown_expectation_rejected():
    import pytest
    with pytest.raises(ValueError):
        Q.rules_from_config([{"column": "x", "expectation": "nope"}])
