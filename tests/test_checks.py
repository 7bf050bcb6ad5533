"""Negative fixtures for the 4 check kinds: each must detect injected
violations (FIXTURES.md §A edge-case 6)."""

from __future__ import annotations

from jaffle_shop_classic_spark.testing import checks


def test_unique_detects_duplicates(spark):
    df = spark.createDataFrame([(1,), (2,), (2,), (3,), (None,), (None,)], ["id"])
    viol = checks.unique(df, "id").collect()
    # NULLs are ignored by dbt's unique test
    assert [(r["value"], r["n_rows"]) for r in viol] == [(2, 2)]


def test_not_null_detects_nulls(spark):
    df = spark.createDataFrame([(1, "a"), (None, "b")], ["id", "x"])
    assert checks.not_null(df, "id").count() == 1
    assert checks.not_null(df, "x").count() == 0


def test_accepted_values(spark):
    df = spark.createDataFrame([("placed",), ("shipped",), ("bogus",), (None,)], ["status"])
    viol = checks.accepted_values(df, "status", ["placed", "shipped"]).collect()
    assert [r["status"] for r in viol] == ["bogus"]


def test_relationships(spark):
    child = spark.createDataFrame([(1, 10), (2, 20), (3, 99), (4, None)], ["id", "fk"])
    parent = spark.createDataFrame([(10,), (20,)], ["pk"])
    viol = checks.relationships(child, "fk", parent, "pk").collect()
    # NULL FKs are not violations; 99 is
    assert [r["id"] for r in viol] == [3]


def test_run_checks_reports_samples(spark):
    df = spark.createDataFrame([(1,), (1,)], ["id"])
    results = checks.run_checks({"u": checks.unique(df, "id")})
    assert not results[0].passed
    assert results[0].n_violations == 1
    assert results[0].sample[0]["value"] == 1
