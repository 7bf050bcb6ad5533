"""Property-based Tier-1 parity: the jaffle pipeline on ARBITRARY
hypothesis-generated raw tables, cross-checked against DuckDB running
the reference SQL shapes on the same rows.

The fixed seed CSVs exercise one data shape; these tests exercise the
semantic traps of SURVEY §1.3 on adversarial shapes hypothesis finds:
customers with no orders (NULL aggregates), orders with no payments
(NULL pivot totals vs 0 for unused methods), multi-payment orders,
zero amounts, empty tables.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jaffle_shop_classic_spark.models.jaffle import PAYMENT_METHODS, build_project

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

STATUSES = ["placed", "shipped", "completed", "return_pending", "returned"]
BASE_DATE = datetime.date(2018, 1, 1)


@st.composite
def jaffle_data(draw):
    n_customers = draw(st.integers(1, 12))
    customers = [(i + 1, f"fn{i}", f"L{i}.") for i in range(n_customers)]
    n_orders = draw(st.integers(0, 15))
    orders = [
        (
            j + 1,
            draw(st.integers(1, n_customers)),
            BASE_DATE + datetime.timedelta(days=draw(st.integers(0, 90))),
            draw(st.sampled_from(STATUSES)),
        )
        for j in range(n_orders)
    ]
    n_payments = draw(st.integers(0, 20)) if n_orders else 0
    payments = [
        (
            k + 1,
            draw(st.integers(1, n_orders)),
            draw(st.sampled_from(PAYMENT_METHODS)),
            draw(st.integers(0, 30)) * 100,  # cents, multiples of 100
        )
        for k in range(n_payments)
    ]
    return customers, orders, payments


def _build(spark, data):
    customers, orders, payments = data
    project = build_project()
    project.add_source(
        "raw_customers",
        spark.createDataFrame(customers or [(1, "x", "y")], "id long, first_name string, last_name string").limit(
            len(customers)
        ),
    )
    project.add_source(
        "raw_orders",
        spark.createDataFrame(
            orders or [(1, 1, BASE_DATE, "placed")],
            "id long, user_id long, order_date date, status string",
        ).limit(len(orders)),
    )
    project.add_source(
        "raw_payments",
        spark.createDataFrame(
            payments or [(1, 1, "coupon", 0)],
            "id long, order_id long, payment_method string, amount long",
        ).limit(len(payments)),
    )
    return project.run(spark)


def _duck(data):
    customers, orders, payments = data
    con = duckdb.connect()
    con.execute("CREATE TABLE raw_customers (id BIGINT, first_name VARCHAR, last_name VARCHAR)")
    con.execute("CREATE TABLE raw_orders (id BIGINT, user_id BIGINT, order_date DATE, status VARCHAR)")
    con.execute(
        "CREATE TABLE raw_payments (id BIGINT, order_id BIGINT, payment_method VARCHAR, amount BIGINT)"
    )
    con.executemany("INSERT INTO raw_customers VALUES (?,?,?)", customers) if customers else None
    con.executemany("INSERT INTO raw_orders VALUES (?,?,?,?)", orders) if orders else None
    con.executemany("INSERT INTO raw_payments VALUES (?,?,?,?)", payments) if payments else None
    return con


@given(data=jaffle_data())
@SLOW
def test_customers_mart_equals_reference_sql(spark, data):
    built = _build(spark, data)
    con = _duck(data)
    want = {
        row[0]: row[1:]
        for row in con.execute(
            """
            WITH customer_orders AS (
                SELECT user_id AS cid, min(order_date) AS fo, max(order_date) AS mo,
                       count(id) AS n FROM raw_orders GROUP BY 1
            ), customer_payments AS (
                SELECT o.user_id AS cid, sum(p.amount / 100.0) AS total
                FROM raw_payments p LEFT JOIN raw_orders o ON p.order_id = o.id
                GROUP BY 1
            )
            SELECT c.id, co.fo, co.mo, co.n, round(cp.total, 2)
            FROM raw_customers c
            LEFT JOIN customer_orders co ON c.id = co.cid
            LEFT JOIN customer_payments cp ON c.id = cp.cid
            """
        ).fetchall()
    }
    got = {
        r["customer_id"]: (
            r["first_order"],
            r["most_recent_order"],
            r["number_of_orders"],
            None if r["customer_lifetime_value"] is None else round(r["customer_lifetime_value"], 2),
        )
        for r in built["customers"].collect()
    }
    assert got == want


@given(data=jaffle_data())
@SLOW
def test_orders_mart_equals_reference_sql(spark, data):
    built = _build(spark, data)
    con = _duck(data)
    pivot = ", ".join(
        f"sum(CASE WHEN payment_method = '{m}' THEN amount / 100.0 ELSE 0 END) AS {m}_amt"
        for m in PAYMENT_METHODS
    )
    want = {
        row[0]: tuple(None if v is None else round(v, 2) if isinstance(v, float) else v for v in row[1:])
        for row in con.execute(
            f"""
            WITH op AS (
                SELECT order_id, {pivot}, sum(amount / 100.0) AS total
                FROM raw_payments GROUP BY order_id
            )
            SELECT o.id, {', '.join('op.' + m + '_amt' for m in PAYMENT_METHODS)}, op.total
            FROM raw_orders o LEFT JOIN op ON o.id = op.order_id
            """
        ).fetchall()
    }
    got = {
        r["order_id"]: tuple(
            None if r[c] is None else round(r[c], 2)
            for c in [*[f"{m}_amount" for m in PAYMENT_METHODS], "amount"]
        )
        for r in built["orders"].collect()
    }
    assert got == want
