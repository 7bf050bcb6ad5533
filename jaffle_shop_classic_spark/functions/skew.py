"""Salted joins — explicit skew mitigation (SCALING.md).

AQE's skew-join split handles most skew automatically; salting is the
explicit tool for the pathological case (one key holding a double-digit
percentage of the fact table, e.g. a null-like sentinel or a megacity).

Mechanics: the skewed (large) side gets a random salt in [0, S); the
small side is replicated S times with every salt value; the join key
becomes (key, salt). The hot key's rows now spread over S tasks instead
of one. Replication multiplies the small side by S, so S is a dial
between skew relief and broadcastable-side growth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_column(num_salts: int, *deterministic_by: Column) -> Column:
    """Salt in [0, num_salts). With `deterministic_by` columns the salt is
    a stable hash (reproducible runs); without, uniform random."""
    if deterministic_by:
        return F.pmod(F.hash(*deterministic_by), F.lit(num_salts))
    return (F.rand(seed=42) * num_salts).cast("int")


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = 8,
    how: str = "inner",
    deterministic: bool = True,
) -> DataFrame:
    """Equi-join with the large side salted and the small side replicated.

    Result equals `large.join(small, key, how)` for inner/left joins;
    the salt columns never escape.
    """
    salt = (
        salt_column(num_salts, *[F.col(c) for c in large.columns])
        if deterministic
        else salt_column(num_salts)
    )
    salted_large = large.withColumn(SALT_COL, salt)
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    joined = salted_large.join(replicated_small, [key, SALT_COL], how)
    return joined.drop(SALT_COL)
