"""Signed-zero canonicalization — the r14 `vocab_heaps_law` red row.

DuckDB's `round()` preserves the sign of an infinitesimally negative
argument (`round(-1e-9, 6)` -> -0.0) while Spark's HALF_UP BigDecimal
round returns +0.0. The driver's value hash is representation-exact and
distinguishes the two, so a slope/correlation/diff column that rounds to
zero fails the hash despite numeric equality. Two defenses, both pinned
here:

1. every negative-capable rounded double output canonicalizes with
   `round(x, n) + 0` in the DuckDB oracle (IEEE: -0.0 + 0 = +0.0);
2. the local gate (tools/parity.py `_norm_cell`) no longer folds signed
   zero, so it can never again pass what the driver fails.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from parity import _norm_cell  # noqa: E402


def test_norm_cell_distinguishes_signed_zero():
    """The local gate must be at least as strict as the driver's hash:
    -0.0 and +0.0 normalize to DIFFERENT representations."""
    assert _norm_cell(-0.0) != _norm_cell(0.0)
    # and equal values still normalize identically
    assert _norm_cell(0.0) == _norm_cell(+0.0)
    assert _norm_cell(-0.25) == _norm_cell(-0.25)


def test_duckdb_round_emits_negative_zero_without_canonicalization():
    """The hazard the +0 exists for: reverting the fix (dropping `+ 0`)
    reproduces the r14 red row's -0.0 under the strict gate."""
    con = duckdb.connect()
    raw = con.sql("SELECT round(-1e-9, 6) AS v").fetchone()[0]
    assert raw == 0.0 and math.copysign(1.0, raw) < 0  # DuckDB: -0.0
    # the strict gate WOULD flag it against Spark's +0.0
    assert _norm_cell(raw) != _norm_cell(0.0)
    # the canonicalized form matches Spark exactly
    fixed = con.sql("SELECT round(-1e-9, 6) + 0 AS v").fetchone()[0]
    assert fixed == 0.0 and math.copysign(1.0, fixed) > 0
    assert _norm_cell(fixed) == _norm_cell(0.0)


@pytest.mark.usefixtures("spark")
def test_spark_round_negative_rounds_to_positive_zero(spark):
    """Spark's side of the r14 judge reproduction: HALF_UP BigDecimal
    round of an infinitesimally negative double returns +0.0, so the
    oracle-side `+ 0` makes the two engines representation-identical."""
    v = spark.range(1).select(F.round(F.lit(-1e-9), 6).alias("v")).collect()[0][0]
    assert v == 0.0 and math.copysign(1.0, v) > 0
    assert _norm_cell(v) == _norm_cell(0.0)
