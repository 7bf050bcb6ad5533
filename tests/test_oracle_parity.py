"""Run the driver's correctness gate locally: every catalog query vs its
DuckDB oracle at sf0.001 (fast). The driver repeats this at sf0.01.

Marked `slow` (r15 verdict item 1): this 346-entry sweep is ~12 min of
the suite's ~40, and it duplicates `python tools/parity.py <sf_dir>`
(the builder's per-round gate) plus the driver's own oracle check.
Run it with `pytest -m slow` or everything with `-m "slow or not slow"`.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from parity import TABLES, compare  # noqa: E402

from jaffle_shop_classic_spark.operators.catalog import load_catalog  # noqa: E402


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(load_catalog()))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    spec = load_catalog()[name]
    df = spec.fn(spark, sf_dir)
    res = compare(name, df, oracle_con)
    assert res["status"] in ("MATCH", "rows_only"), res
