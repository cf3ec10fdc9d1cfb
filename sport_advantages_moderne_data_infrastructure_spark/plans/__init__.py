from .catalog import REGISTRY, bench_queries, oracle_sql, queries, register  # noqa: F401
