"""Query catalog — the single registry behind ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 is registered here as a named
query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) the equivalent DuckDB oracle SQL over the driver's
pre-registered star views. Domain-table oracles are wrapped with the shared
CTE prefix from ``sources.domain`` so both engines derive identical inputs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = "",
             tags: tuple = (), bench: bool = False):
    def deco(fn):
        REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""),
                               tags, bench)
        return fn
    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: q.spark_fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in REGISTRY.items()
            if q.oracle is not None}


def bench_queries() -> dict[str, Query]:
    _load_all()
    return {name: q for name, q in REGISTRY.items() if q.bench}


_loaded = False


def _load_all() -> None:
    """Import every plan module for its registration side effects."""
    global _loaded
    if _loaded:
        return
    from . import core  # noqa: F401
    from . import star  # noqa: F401
    from . import textops  # noqa: F401
    from . import simops  # noqa: F401
    from . import streamops  # noqa: F401
    _loaded = True
