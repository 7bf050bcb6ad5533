"""The 4 dbt test kinds (SURVEY §2.3 T1-T4) exposed as driver queries.

Each is a *violation query* over the star schema, chosen so that the
interesting ones are non-vacuous on the driver data (a check that can
only ever return 0 rows proves nothing):
  - lineitem.l_orderkey is deliberately non-unique (many lines/order),
  - o_orderstatus has a value outside {F,O},
  - orders->positive-balance-customers FK has real violations,
  - 257-ish orders (sf0.01) have no lineitems -> NULL pivot amounts.
Empty-result pass cases are kept too: they mirror the reference's 20
passing tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from ..testing import checks
from .catalog import register
from .relational import q_jaffle_orders


@register(
    "test_unique_violations",
    oracle="""
    SELECT l_orderkey AS value, count(*) AS n_rows
    FROM lineitem
    WHERE l_orderkey IS NOT NULL
    GROUP BY l_orderkey
    HAVING count(*) > 1
    """,
    doc="T1 unique (non-vacuous): duplicate l_orderkey values in lineitem.",
)
def q_unique_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return checks.unique(load_table(spark, sf_dir, "lineitem"), "l_orderkey")


@register(
    "test_unique_pass",
    oracle="""
    SELECT c_custkey AS value, count(*) AS n_rows
    FROM customer
    WHERE c_custkey IS NOT NULL
    GROUP BY c_custkey
    HAVING count(*) > 1
    """,
    doc="T1 unique (passing): customer PK is unique -> empty result.",
)
def q_unique_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    return checks.unique(load_table(spark, sf_dir, "customer"), "c_custkey")


@register(
    "test_not_null_violations",
    oracle="""
    SELECT o.o_orderkey AS order_id
    FROM orders o
    LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
           ON o.o_orderkey = l.l_orderkey
    WHERE l.l_orderkey IS NULL
    """,
    doc="T2 not_null (non-vacuous): orders-mart rows whose pivot total is "
    "NULL because the order has no lineitems (left-join null semantics, "
    "SURVEY §1.3).",
)
def q_not_null_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    mart = q_jaffle_orders(spark, sf_dir)
    return checks.not_null(mart, "amount").select("order_id")


@register(
    "test_accepted_values_violations",
    oracle="""
    SELECT o_orderkey AS order_id, o_orderstatus AS status
    FROM orders
    WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F', 'O')
    """,
    doc="T3 accepted_values (non-vacuous): statuses outside {F,O} — the "
    "'P' rows violate.",
)
def q_accepted_values_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return checks.accepted_values(orders, "o_orderstatus", ["F", "O"]).select(
        F.col("o_orderkey").alias("order_id"), F.col("o_orderstatus").alias("status")
    )


@register(
    "test_relationships_violations",
    oracle="""
    SELECT o.o_orderkey AS order_id, o.o_custkey AS customer_id
    FROM orders o
    WHERE o.o_custkey IS NOT NULL
      AND NOT EXISTS (
        SELECT 1 FROM customer c
        WHERE c.c_acctbal >= 0 AND c.c_custkey = o.o_custkey
      )
    """,
    doc="T4 relationships (non-vacuous): orders whose customer is not in "
    "the positive-balance dimension slice — LEFT ANTI join.",
)
def q_relationships_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    parent = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") >= 0)
    viol = checks.relationships(orders, "o_custkey", parent, "c_custkey")
    return viol.select(
        F.col("o_orderkey").alias("order_id"), F.col("o_custkey").alias("customer_id")
    )


@register(
    "test_relationships_pass",
    oracle="""
    SELECT l.l_orderkey AS order_id, count(*) AS n_rows
    FROM lineitem l
    WHERE l.l_orderkey IS NOT NULL
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
      )
    GROUP BY l.l_orderkey
    """,
    doc="T4 relationships (passing): every lineitem has an order -> empty.",
)
def q_relationships_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    viol = checks.relationships(li, "l_orderkey", orders, "o_orderkey")
    return viol.groupBy(F.col("l_orderkey").alias("order_id")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


# ------------------------------------------- dbt-utils-style check kinds
@register(
    "test_accepted_range_violations",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice IS NOT NULL
      AND (o_totalprice < 1000 OR o_totalprice > 400000)
    """,
    doc="dbt_utils.accepted_range (non-vacuous): order totals outside "
    "[1000, 400000] — scan-level filter, both bounds pushed to parquet.",
)
def q_accepted_range_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return checks.accepted_range(o, "o_totalprice", 1000, 400000)


@register(
    "test_unique_combination_violations",
    oracle="""
    SELECT o_custkey, o_orderdate, CAST(count(*) AS BIGINT) AS n_rows
    FROM orders
    GROUP BY o_custkey, o_orderdate
    HAVING count(*) > 1
    """,
    doc="dbt_utils.unique_combination_of_columns (non-vacuous): customers "
    "with multiple orders on one date — composite-key hash aggregate, "
    "keys-only shuffle.",
)
def q_unique_combination_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return checks.unique_combination(o, ["o_custkey", "o_orderdate"])


@register(
    "test_expression_is_true_pass",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE NOT coalesce(o_totalprice > 0, false)
    """,
    doc="dbt_utils.expression_is_true (passing): every order total is "
    "positive -> empty result; NULL evaluates as a violation.",
)
def q_expression_is_true_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return checks.expression_is_true(o, "o_totalprice > 0")
