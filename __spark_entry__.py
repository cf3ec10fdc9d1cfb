"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query catalog
(sport_advantages_moderne_data_infrastructure_spark.plans.catalog): every
implemented SURVEY §2 operator is registered there with its Spark callable
and DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sport_advantages_moderne_data_infrastructure_spark.plans import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference README.md:140-164 prime/total-salary
    analytics) over /root/testdata/sf0.001. Looks up REGISTRY, not
    queries(): the flagship stays the entry smoke-check even when its
    row rotates out of the 50-slot driver window (as prime_query did
    in r10 — via queries() this raised KeyError on a vanilla run)."""
    catalog._load_all()
    q = catalog.REGISTRY["prime_query"].spark_fn
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
