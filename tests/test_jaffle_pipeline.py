"""Tier-1 parity: the jaffle pipeline on the reference's own seed CSVs.

Golden facts from SURVEY §1.3 / FIXTURES.md §A:
  100 customers / 99 orders / 113 payments; 38 customers with no orders
  (NULL aggregates); every order has >=1 payment; amounts are cents and
  multiples of 100.
The full customers/orders marts are additionally cross-checked against
DuckDB running the reference's exact SQL shape on the same CSVs.
"""

from __future__ import annotations

import duckdb
import pytest

from jaffle_shop_classic_spark.models.jaffle import (
    PAYMENT_METHODS,
    build_project,
    jaffle_checks,
    load_jaffle_sources,
)
from jaffle_shop_classic_spark.testing.checks import run_checks


@pytest.fixture(scope="module")
def built(spark, seed_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    project = build_project(warehouse_dir=wh)
    load_jaffle_sources(project, spark, seed_dir)
    return project, project.run(spark)


def test_seed_row_counts(built):
    project, _ = built
    assert project.sources["raw_customers"].count() == 100
    assert project.sources["raw_orders"].count() == 99
    assert project.sources["raw_payments"].count() == 113


def test_staging_schemas(built):
    _, models = built
    assert [f.name for f in models["stg_customers"].schema.fields] == [
        "customer_id",
        "first_name",
        "last_name",
    ]
    assert [f.name for f in models["stg_orders"].schema.fields] == [
        "order_id",
        "customer_id",
        "order_date",
        "status",
    ]
    stg_pay = models["stg_payments"]
    assert [f.name for f in stg_pay.schema.fields] == [
        "payment_id",
        "order_id",
        "payment_method",
        "amount",
    ]
    # cents -> dollars produced a double (SURVEY §1.3 division semantics)
    assert dict((f.name, f.dataType.simpleString()) for f in stg_pay.schema.fields)[
        "amount"
    ] == "double"


def test_customers_mart_null_semantics(built):
    _, models = built
    customers = models["customers"]
    assert customers.count() == 100
    # 38 customers with no orders -> NULL aggregates, never 0 (SURVEY §1.3)
    no_orders = customers.filter("number_of_orders IS NULL")
    assert no_orders.count() == 38
    assert no_orders.filter("customer_lifetime_value IS NOT NULL").count() == 0
    assert customers.filter("number_of_orders = 0").count() == 0


def test_orders_mart_shape(built):
    _, models = built
    orders = models["orders"]
    assert orders.count() == 99
    assert [f.name for f in orders.schema.fields] == [
        "order_id",
        "customer_id",
        "order_date",
        "status",
        *[f"{m}_amount" for m in PAYMENT_METHODS],
        "amount",
    ]
    # every order has >=1 payment in the seeds -> no NULL amounts
    assert orders.filter("amount IS NULL").count() == 0


def test_all_20_reference_tests_pass(built):
    _, models = built
    results = run_checks(jaffle_checks(models))
    assert len(results) == 20
    failed = [str(r) for r in results if not r.passed]
    assert not failed, failed


def _duckdb_mart_rows(seed_dir: str):
    """Run the reference's customers/orders SQL shapes in DuckDB on the CSVs."""
    con = duckdb.connect()
    for name in ("raw_customers", "raw_orders", "raw_payments"):
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_csv_auto('{seed_dir}/{name}.csv')")
    customers = con.execute(
        """
        WITH customer_orders AS (
            SELECT user_id AS customer_id, min(order_date) AS first_order,
                   max(order_date) AS most_recent_order, count(id) AS number_of_orders
            FROM raw_orders GROUP BY 1
        ), customer_payments AS (
            SELECT o.user_id AS customer_id, sum(p.amount / 100.0) AS total
            FROM raw_payments p LEFT JOIN raw_orders o ON p.order_id = o.id
            GROUP BY 1
        )
        SELECT c.id, co.first_order, co.most_recent_order, co.number_of_orders,
               round(cp.total, 2)
        FROM raw_customers c
        LEFT JOIN customer_orders co ON c.id = co.customer_id
        LEFT JOIN customer_payments cp ON c.id = cp.customer_id
        ORDER BY c.id
        """
    ).fetchall()
    return customers


def test_customers_mart_matches_duckdb(built, seed_dir):
    _, models = built
    got = {
        r["customer_id"]: (
            r["first_order"],
            r["most_recent_order"],
            r["number_of_orders"],
            None if r["customer_lifetime_value"] is None else round(r["customer_lifetime_value"], 2),
        )
        for r in models["customers"].collect()
    }
    want = {row[0]: (row[1], row[2], row[3], row[4]) for row in _duckdb_mart_rows(seed_dir)}
    assert got == want


def test_view_vs_table_materialization(built, spark):
    project, models = built
    # staging = temp view (resolvable via SQL), marts = parquet-backed
    assert spark.table("stg_orders").count() == 99
    files = models["customers"].inputFiles()
    assert files and all("warehouse" in f for f in files)


def test_docs_catalog(built):
    from jaffle_shop_classic_spark.plans.docs import generate_catalog, render_markdown

    project, models = built
    cat = generate_catalog(project, models)
    assert set(cat["models"]) == {"stg_customers", "stg_orders", "stg_payments", "customers", "orders"}
    assert cat["models"]["customers"]["materialized"] == "table"
    assert cat["models"]["stg_orders"]["materialized"] == "view"
    md = render_markdown(cat)
    assert "customer_lifetime_value" in md


def test_docs_html_artifact(built):
    """--html: the `dbt docs serve` artifact — one self-contained page
    with nav anchors, dependency links, and schema tables."""
    from jaffle_shop_classic_spark.plans.docs import generate_catalog, render_html

    project, models = built
    cat = generate_catalog(project, models)
    html = render_html(cat, {"q1": {"oracle": "hash", "description": "x < y"}})
    assert html.startswith("<!doctype html>")
    # nav anchor and section id pair up for every model
    for name in cat["models"]:
        assert html.count(f'id="m-{name}"') == 1
        assert f'href="#m-{name}"' in html
    # dependency edges render as links, schema rows carry column docs
    assert 'href="#m-stg_orders"' in html
    assert "customer_lifetime_value" in html
    # operator list present and HTML-escaped
    assert "x &lt; y" in html


def test_orders_mart_matches_duckdb(built, seed_dir):
    """Full-output cross-check of the orders mart (pivot + left join)
    against the reference SQL shape run by DuckDB on the same CSVs."""
    _, models = built
    con = duckdb.connect()
    for name in ("raw_orders", "raw_payments"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_csv_auto('{seed_dir}/{name}.csv')"
        )
    methods = PAYMENT_METHODS
    pivot_cols = ", ".join(
        f"sum(CASE WHEN payment_method = '{m}' THEN amount / 100.0 ELSE 0 END) AS {m}_amount"
        for m in methods
    )
    want_rows = con.execute(
        f"""
        WITH order_payments AS (
            SELECT order_id, {pivot_cols}, sum(amount / 100.0) AS total_amount
            FROM raw_payments GROUP BY order_id
        )
        SELECT o.id, o.user_id, o.order_date, o.status,
               {', '.join('p.' + m + '_amount' for m in methods)},
               p.total_amount
        FROM raw_orders o
        LEFT JOIN order_payments p ON o.id = p.order_id
        ORDER BY o.id
        """
    ).fetchall()
    got = {
        r["order_id"]: (
            r["customer_id"],
            r["order_date"],
            r["status"],
            *[round(r[f"{m}_amount"], 2) for m in methods],
            round(r["amount"], 2),
        )
        for r in models["orders"].collect()
    }
    want = {
        row[0]: (row[1], row[2], row[3], *[round(v, 2) for v in row[4:]])
        for row in want_rows
    }
    assert got == want
