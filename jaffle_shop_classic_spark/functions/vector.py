"""Vector column expressions shared by the similarity operators.

All math is element-wise double-cast before multiply/accumulate, and
accumulation is sequential left-to-right in both Spark (`aggregate` /
`zip_with`) and DuckDB (`list_sum(list_transform(...))`) — which makes
the doubles bit-identical across engines, so cosine scores can be
oracle-compared after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def cosine_parts(a: Column, b: Column) -> Column:
    """cos(a, b) = dot / (|a| * |b|)."""
    return dot(a, b) / (F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)))


# -- Spark SQL-string twins of the Column builders above. Same Catalyst
# expressions after parse, but ONE Py4J round trip per call site instead
# of ~30 (each lambda-HOF Column builder crosses the bridge per node):
# driver-side plan construction was measured at 30-45% of warm query
# latency for the similarity/dedup headliners at sf0.1, and the
# string form cuts that cost without touching the executed plan.
def dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def sq_norm_expr(a: str) -> str:
    return (
        f"aggregate({a}, CAST(0 AS DOUBLE), "
        f"(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    )


def cosine_expr(a: str, b: str) -> str:
    """cos(a, b) as a Spark SQL fragment for F.expr/selectExpr."""
    return f"({dot_expr(a, b)} / (sqrt({sq_norm_expr(a)}) * sqrt({sq_norm_expr(b)})))"


# -- DuckDB twins (index-based: list_zip is less portable than range()) --
def dot_sql(a: str, b: str, dim: int = 64) -> str:
    return (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def l2_norm_sql(a: str, dim: int = 64) -> str:
    return f"sqrt({dot_sql(a, a, dim)})"


def cosine_sql(a: str, b: str, dim: int = 64) -> str:
    return f"({dot_sql(a, b, dim)} / ({l2_norm_sql(a, dim)} * {l2_norm_sql(b, dim)}))"
