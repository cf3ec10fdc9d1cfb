"""Cross-dialect SQL fragment builders.

The driver's correctness gate runs every query twice — PySpark and DuckDB —
and hash-compares values. Domain fixture tables (employees, sport_activities,
commute_validations, cdc_events — schemas per /root/repo/FIXTURES.md,
distilled from /root/reference/init-scripts/init-db.sql) are *derived
deterministically from the shared star schema*, so both engines must compute
byte-identical values. This module is the single source of truth: each
fragment is an ANSI-SQL string valid in BOTH Spark SQL and DuckDB, except
for the few genuinely dialect-specific functions exposed as ``Dialect``
methods.

Parity rules learned empirically (see tests/test_dialect_parity.py):
- ``format_string('%.1f', x)`` (Spark/Java, HALF_UP on decimal repr) and
  ``printf`` (DuckDB/C, binary repr) round differently → format numbers
  with integer arithmetic only.
- Spark CAST(double AS INT) truncates, DuckDB rounds → always FLOOR first.
- Spark ``concat`` is NULL-propagating, DuckDB ``concat`` NULL-skipping →
  always COALESCE nullable args.
- hex→int: Spark ``conv(h,16,10)`` ≡ DuckDB ``('0x'||h)::BIGINT``.
- µs epoch: Spark ``unix_micros(ts)`` ≡ DuckDB ``epoch_us(ts)``;
  reverse: ``timestamp_micros(us)`` ≡ ``make_timestamp(us)``.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Dialect:
    name: str  # "spark" | "duckdb"

    # --- timestamps ---------------------------------------------------
    def ts_from_seconds(self, sec_expr: str) -> str:
        if self.name == "spark":
            return f"timestamp_seconds({sec_expr})"
        return f"make_timestamp(CAST(({sec_expr}) AS BIGINT) * 1000000)"

    def ts_from_micros(self, us_expr: str) -> str:
        if self.name == "spark":
            return f"timestamp_micros({us_expr})"
        return f"make_timestamp(CAST(({us_expr}) AS BIGINT))"

    def micros_from_ts(self, ts_expr: str) -> str:
        if self.name == "spark":
            return f"unix_micros({ts_expr})"
        return f"epoch_us({ts_expr})"

    # --- hashing ------------------------------------------------------
    def hex_to_bigint(self, hex_expr: str) -> str:
        """First-8-hex-chars of an md5-style hex string → uint32-range int."""
        if self.name == "spark":
            return f"CAST(conv({hex_expr}, 16, 10) AS BIGINT)"
        return f"(('0x' || ({hex_expr}))::BIGINT)"

    def md5_bigint(self, str_expr: str) -> str:
        """Deterministic 32-bit-range hash of a string, identical across
        engines (md5 is md5 everywhere)."""
        return self.hex_to_bigint(f"substr(md5({str_expr}), 1, 8)")


SPARK = Dialect("spark")
DUCKDB = Dialect("duckdb")


def case_int(expr: str, values: list[str], else_null: bool = False) -> str:
    """CASE <expr> WHEN 0 THEN values[0] ... — shared syntax."""
    branches = " ".join(
        f"WHEN {i} THEN '{v}'" for i, v in enumerate(values)
    )
    tail = "ELSE NULL " if else_null else ""
    return f"CASE {expr} {branches} {tail}END"


def int_div(num: str, den: int) -> str:
    """Integer division with identical semantics in both engines."""
    return f"CAST(FLOOR(({num}) / {den}.0) AS INT)"


def km_1dp(meters_expr: str) -> str:
    """Format integer meters as 'K.D' km with one decimal, using pure
    integer arithmetic (printf/format_string are NOT cross-engine safe)."""
    whole = f"CAST({int_div(meters_expr, 1000)} AS STRING)"
    tenth = f"CAST({int_div(f'({meters_expr}) % 1000', 100)} AS STRING)"
    return f"concat({whole}, '.', {tenth})"
