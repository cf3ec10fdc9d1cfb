"""Vector math over array<float|double> columns — JVM higher-order
functions only (no UDFs): sequential fold order matches DuckDB's list
functions bit-for-bit, which is what makes similarity scores
oracle-hashable."""

from __future__ import annotations

from pyspark.sql import functions as F

_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        "CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")


def dot_expr(a: str, b: str) -> str:
    """SQL fragment: sequential-order dot product of two array columns."""
    return _DOT.format(a=a, b=b)


def dot(a: str, b: str) -> "F.Column":
    return F.expr(dot_expr(a, b))


def l2_norm(col: str) -> "F.Column":
    return F.sqrt(F.expr(dot_expr(col, col)))


def cosine(a: str, b: str, a_norm: str, b_norm: str) -> "F.Column":
    """Cosine with precomputed per-side norms (never recompute norms per
    pair — N+Q sqrts instead of 2·N·Q)."""
    return F.expr(dot_expr(a, b)) / (F.col(a_norm) * F.col(b_norm))
