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
