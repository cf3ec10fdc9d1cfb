"""Local replica of the driver's DuckDB-oracle differential check:
row-count + schema-shape + order-insensitive value comparison between a
Spark DataFrame and a DuckDB SQL result over the same parquet tables."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from sport_advantages_moderne_data_infrastructure_spark.sources.tables import (
    STAR_TABLES,
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    from decimal import Decimal

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            non_null = s.dropna()
            sample = non_null.iloc[0] if len(non_null) else None
            if isinstance(sample, Decimal):
                df[c] = s.astype(float)
            else:
                df[c] = s.map(lambda v: None if v is None else str(v))
        elif str(s.dtype).startswith("datetime64"):
            df[c] = s.dt.tz_localize(None) if getattr(s.dt, "tz", None) else s
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last").reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf or abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    return a == b or str(a) == str(b)


def assert_oracle_match(spark_df, con: duckdb.DuckDBPyConnection,
                        sql: str, name: str = "query") -> None:
    sp = spark_df.toPandas()
    du = con.execute(sql).df()
    assert len(sp) == len(du), (
        f"{name}: row count mismatch spark={len(sp)} duckdb={len(du)}")
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: column mismatch {sorted(sp.columns)} vs {sorted(du.columns)}")
    sp, du = _canon(sp), _canon(du)
    # cell-by-cell with exact-or-tiny-tolerance semantics; report first diff
    for i in range(len(sp)):
        for c in sp.columns:
            a, b = sp.at[i, c], du.at[i, c]
            a = None if pd.isna(a) and not isinstance(a, str) else a
            b = None if pd.isna(b) and not isinstance(b, str) else b
            assert _values_equal(a, b), (
                f"{name}: value mismatch row {i} col {c}: "
                f"spark={a!r} duckdb={b!r}")
