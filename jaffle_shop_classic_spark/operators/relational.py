"""Relational operators R1-R13 (SURVEY §2.2) over the driver star schema.

The jaffle mapping onto the TPC-H-ish test tables:
  customer  -> raw_customers   (dimension keyed by c_custkey)
  orders    -> raw_orders      (fact keyed by o_orderkey, FK o_custkey)
  lineitem  -> raw_payments    (many-per-order fact, amount = l_extendedprice,
                                payment_method analog = l_returnflag)

Each query mirrors a reference model shape:
  jaffle_customers -> /root/reference/models/customers.sql:20-67
    (two pre-join aggregates + two LEFT joins; customers with no orders
     keep NULL aggregates — never coalesce to 0, SURVEY §1.3)
  jaffle_orders    -> /root/reference/models/orders.sql:15-54
    (conditional-aggregate pivot by a compile-time list + grand total +
     LEFT join back to orders; orders with no lineitems get NULL amounts)
  stg_*            -> /root/reference/models/staging/stg_*.sql
    (projection + rename + scalar arithmetic)

Scale notes (100 TB design point):
- staging "models" are pure projections: Catalyst collapses them into the
  consumer plan, so the parquet scan reads only referenced columns.
- both mart aggregations are partial->final hash aggregates (map-side
  combine); the joins are equi-joins on the aggregation key, so AQE picks
  broadcast when the aggregated side is small and sort-merge otherwise.
- no Python UDFs anywhere on this path: whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .catalog import register

# compile-time pivot list, mirroring the Jinja `{% set payment_methods %}`
# loop at /root/reference/models/orders.sql:1 (R12 — Python list replaces Jinja)
RETURN_FLAGS = ["A", "N", "R"]


def stg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename incl. FK rename (stg_orders.sql:13-17 shape)."""
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderdate").alias("order_date"),
        F.col("o_orderstatus").alias("status"),
    )


def stg_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename + scalar arithmetic (stg_payments.sql:13-19 shape).

    `amount / 100` is true double division (SURVEY §1.3); rounded to 4dp
    for cross-engine hash stability.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") * F.lit(10) + F.col("l_linenumber")).alias("payment_id"),
        F.col("l_orderkey").alias("order_id"),
        F.col("l_returnflag").alias("payment_method"),
        F.round(F.col("l_extendedprice") / 100, 4).alias("amount"),
    )


@register(
    "stg_project_rename",
    oracle="""
    SELECT o_orderkey AS order_id,
           o_custkey AS customer_id,
           o_orderdate AS order_date,
           o_orderstatus AS status
    FROM orders
    """,
    doc="R3: projection + column rename (stg_orders shape).",
)
def q_stg_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stg_orders(spark, sf_dir)


@register(
    "stg_scalar_arith",
    oracle="""
    SELECT (l_orderkey * 10 + l_linenumber) AS payment_id,
           l_orderkey AS order_id,
           l_returnflag AS payment_method,
           round(l_extendedprice / 100, 4) AS amount
    FROM lineitem
    """,
    doc="R4: scalar arithmetic in projection (cents->dollars analog).",
)
def q_stg_scalar_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stg_payments(spark, sf_dir)


@register(
    "agg_customer_orders",
    oracle="""
    SELECT o_custkey AS customer_id,
           min(o_orderdate) AS first_order,
           max(o_orderdate) AS most_recent_order,
           count(o_orderkey) AS number_of_orders
    FROM orders
    GROUP BY o_custkey
    """,
    doc="R5: single-key hash aggregate (customers.sql:20-31 shape).",
)
def q_agg_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("customer_id"))
        .agg(
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("most_recent_order"),
            F.count("o_orderkey").alias("number_of_orders"),
        )
    )


@register(
    "agg_over_join",
    oracle="""
    SELECT o.o_custkey AS customer_id,
           round(sum(l.l_extendedprice), 2) AS total_amount
    FROM lineitem l
    LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_custkey
    """,
    doc="R6+R7: aggregate grouped by a column from the other side of a "
    "many-to-one LEFT join (customers.sql:33-46 shape).",
)
def q_agg_over_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    payments = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        payments.join(orders, payments.l_orderkey == orders.o_orderkey, "left")
        .groupBy(F.col("o_custkey").alias("customer_id"))
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("total_amount"))
    )


# shared by jaffle_customers and sql_model_customers_mart (the two
# certify the same algebra through different authoring paths) — a
# module constant, NOT a CATALOG lookup at decoration time, so the
# registrations cannot break on reordering
_CUSTOMERS_MART_ORACLE = """
    WITH customer_orders AS (
        SELECT o_custkey AS customer_id,
               min(o_orderdate) AS first_order,
               max(o_orderdate) AS most_recent_order,
               count(o_orderkey) AS number_of_orders
        FROM orders
        GROUP BY o_custkey
    ),
    customer_payments AS (
        SELECT o.o_custkey AS customer_id,
               round(sum(l.l_extendedprice), 2) AS customer_lifetime_value
        FROM lineitem l
        LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey
    )
    SELECT c.c_custkey AS customer_id,
           c.c_name AS name,
           c.c_mktsegment AS segment,
           co.first_order,
           co.most_recent_order,
           co.number_of_orders,
           cp.customer_lifetime_value
    FROM customer c
    LEFT JOIN customer_orders co ON c.c_custkey = co.customer_id
    LEFT JOIN customer_payments cp ON c.c_custkey = cp.customer_id
    """


@register(
    "jaffle_customers",
    oracle=_CUSTOMERS_MART_ORACLE,
    doc="Flagship: full customers-mart analog (customers.sql:20-67). "
    "R5+R6+R7+R8+R11 in one plan; NULL aggregates for customers "
    "without orders are preserved (no coalesce).",
)
def q_jaffle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two rewrites of the reference's CTE pair, both result-identical:
    # 1. partial-aggregation pushdown below the join (sum is associative,
    #    so per-order subtotals then per-customer totals == direct
    #    totals): the join and the custkey shuffle see |orders| rows
    #    instead of |lineitem| rows — at 100 TB this is the difference
    #    between shuffling the fact table and shuffling the order
    #    dimension. Catalyst does not do this rewrite itself
    #    (customers.sql:33-46 is join-then-aggregate).
    # 2. fused customer_orders + customer_payments: both CTEs group
    #    orders-grain rows by custkey (customers.sql:20-31 groups orders
    #    directly; :33-46 groups payment rows that each belong to exactly
    #    one order), so orders LEFT JOIN per-order-subtotals feeds ONE
    #    aggregate computing all four measures — one custkey shuffle and
    #    one mart join instead of two of each. An order with no payments
    #    contributes NULL to the sum (ignored) but still counts — exactly
    #    the reference's left-join null semantics (§1.3); payments with
    #    no order fall out of the final customer join in both shapes.
    #
    # Expressed as ONE spark.sql call over the parquet DataFrames
    # (same Catalyst plan as the method-chain form; JVM-side parse
    # halves driver-side plan-build latency, which at bench scale was
    # ~half the warm query time).
    return spark.sql(
        """
        WITH per_order AS (
          SELECT l_orderkey, sum(l_extendedprice) AS order_amount
          FROM {lineitem} GROUP BY l_orderkey
        ),
        per_customer AS (
          SELECT o.o_custkey AS customer_id,
                 min(o.o_orderdate) AS first_order,
                 max(o.o_orderdate) AS most_recent_order,
                 count(o.o_orderkey) AS number_of_orders,
                 round(sum(p.order_amount), 2) AS customer_lifetime_value
          FROM {orders} o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
          GROUP BY o.o_custkey
        )
        SELECT c.c_custkey AS customer_id,
               c.c_name AS name,
               c.c_mktsegment AS segment,
               pc.first_order,
               pc.most_recent_order,
               pc.number_of_orders,
               pc.customer_lifetime_value
        FROM {customer} c
        LEFT JOIN per_customer pc ON c.c_custkey = pc.customer_id
        """,
        customer=load_table(spark, sf_dir, "customer"),
        orders=load_table(spark, sf_dir, "orders"),
        lineitem=load_table(spark, sf_dir, "lineitem"),
    )


def _pivot_amount_sql(flag: str, zero: str = "0") -> str:
    """One pivot column (R9). The SAME generator feeds the DuckDB oracle
    (zero='0') and the Spark query (zero='0.0D', the typed double
    literal) so the two sides cannot drift."""
    return (
        f"round(sum(CASE WHEN l_returnflag = '{flag}' THEN l_extendedprice "
        f"ELSE {zero} END), 2) AS {flag.lower()}_amount"
    )


_PIVOT_SELECT = ", ".join("p." + m.lower() + "_amount" for m in RETURN_FLAGS)


@register(
    "jaffle_orders",
    oracle=f"""
    WITH order_payments AS (
        SELECT l_orderkey AS order_id,
               {", ".join(_pivot_amount_sql(m) for m in RETURN_FLAGS)},
               round(sum(l_extendedprice), 2) AS amount
        FROM lineitem
        GROUP BY l_orderkey
    )
    SELECT o.o_orderkey AS order_id,
           o.o_custkey AS customer_id,
           o.o_orderdate AS order_date,
           o.o_orderstatus AS status,
           {_PIVOT_SELECT},
           p.amount
    FROM orders o
    LEFT JOIN order_payments p ON o.o_orderkey = p.order_id
    """,
    doc="Orders-mart analog (orders.sql:15-54): conditional-aggregate pivot "
    "over a compile-time list (R9/R12) + grand total (R10) + LEFT join "
    "(R8). Orders with no lineitems keep NULL amounts; within a group "
    "unused flags get 0 — the null-vs-zero trap of SURVEY §1.3.",
)
def q_jaffle_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pivot columns generated by a Python loop (R12, the Jinja-loop
    # analog) into one spark.sql call — see q_jaffle_customers for why
    pivots = ", ".join(_pivot_amount_sql(m, zero="0.0D") for m in RETURN_FLAGS)
    return spark.sql(
        f"""
        WITH order_payments AS (
          SELECT l_orderkey AS order_id,
                 {pivots},
                 round(sum(l_extendedprice), 2) AS amount
          FROM {{lineitem}} GROUP BY l_orderkey
        )
        SELECT o.o_orderkey AS order_id,
               o.o_custkey AS customer_id,
               o.o_orderdate AS order_date,
               o.o_orderstatus AS status,
               {_PIVOT_SELECT},
               p.amount
        FROM {{orders}} o
        LEFT JOIN order_payments p ON o.o_orderkey = p.order_id
        """,
        orders=load_table(spark, sf_dir, "orders"),
        lineitem=load_table(spark, sf_dir, "lineitem"),
    )


@register(
    "sql_model_customers_mart",
    # identical semantics to jaffle_customers, so the oracle is shared;
    # what this entry certifies is the AUTHORING PATH, not new algebra
    oracle=_CUSTOMERS_MART_ORACLE,
    doc="The reference-user migration path under the hard gate: the "
    "customers mart authored as SQL TEXT (the reference's compiled CTE "
    "shape, customers.sql:20-67, verbatim structure — unfused, "
    "join-then-aggregate) and executed through Project.sql_model, "
    "where upstream models resolve by NAME via temp views and Spark's "
    "own analyzer (no Jinja, no SQL parser of ours). Proves a dbt "
    "user can paste their model SQL in and get the same hash-checked "
    "answer; the DataFrame twin (jaffle_customers) shows what the "
    "engine-native rewrite buys on top.",
)
def q_sql_model_customers_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.registry import Project

    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"sqlmodel_src_{t}")
    p = Project()
    p.sql_model(
        "sqlm_customer_orders",
        """SELECT o_custkey AS customer_id,
                  min(o_orderdate) AS first_order,
                  max(o_orderdate) AS most_recent_order,
                  count(o_orderkey) AS number_of_orders
           FROM sqlmodel_src_orders GROUP BY o_custkey""",
    )
    p.sql_model(
        "sqlm_customer_payments",
        """SELECT o.o_custkey AS customer_id,
                  round(sum(l.l_extendedprice), 2) AS customer_lifetime_value
           FROM sqlmodel_src_lineitem l
           LEFT JOIN sqlmodel_src_orders o ON l.l_orderkey = o.o_orderkey
           GROUP BY o.o_custkey""",
    )
    p.sql_model(
        "sqlm_customers_mart",
        """SELECT c.c_custkey AS customer_id,
                  c.c_name AS name,
                  c.c_mktsegment AS segment,
                  co.first_order,
                  co.most_recent_order,
                  co.number_of_orders,
                  cp.customer_lifetime_value
           FROM sqlmodel_src_customer c
           LEFT JOIN sqlm_customer_orders co ON c.c_custkey = co.customer_id
           LEFT JOIN sqlm_customer_payments cp ON c.c_custkey = cp.customer_id""",
        deps=["sqlm_customer_orders", "sqlm_customer_payments"],
    )
    try:
        # spark.sql analyzes eagerly, so the returned plan no longer
        # needs the views once resolve() completes
        return p.resolve("sqlm_customers_mart", spark)
    finally:
        for v in (
            "sqlmodel_src_customer",
            "sqlmodel_src_orders",
            "sqlmodel_src_lineitem",
            "sqlm_customer_orders",
            "sqlm_customer_payments",
            "sqlm_customers_mart",
        ):
            spark.catalog.dropTempView(v)


@register(
    "yaml_model_customers_mart",
    # same algebra as jaffle_customers / sql_model_customers_mart — this
    # entry certifies the YAML AUTHORING PATH (parse -> register ->
    # materialize -> query), not new relational semantics
    oracle=_CUSTOMERS_MART_ORACLE,
    doc="The dbt-project migration path end to end under the hard gate: "
    "the customers mart authored as a schema.yml-dialect YAML document "
    "(models with inline sql:, deps:, per-column docs — the reference's "
    "own authoring format, /root/reference/models/schema.yml + "
    "customers.sql:20-67) loaded through plans.yaml_project."
    "load_project_yaml, which registers each model via Project."
    "sql_model and resolves upstream names through Spark's analyzer. "
    "Proves a reference user can port their whole YAML project file "
    "and get the same hash-checked answer the DataFrame twin "
    "(jaffle_customers) produces. Scale shape is identical to the "
    "certified marts: two partial->final hash aggregates + two LEFT "
    "joins on the aggregation key; views inline into one Catalyst "
    "plan, so the authoring layer adds zero runtime.",
)
def q_yaml_model_customers_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.yaml_project import load_project_yaml

    doc = """
models:
  - name: yamlm_customer_orders
    description: per-customer order aggregates
    sql: |
      SELECT o_custkey AS customer_id,
             min(o_orderdate) AS first_order,
             max(o_orderdate) AS most_recent_order,
             count(o_orderkey) AS number_of_orders
      FROM yamlm_orders GROUP BY o_custkey
    deps: [yamlm_orders]
  - name: yamlm_customer_payments
    sql: |
      SELECT o.o_custkey AS customer_id,
             round(sum(l.l_extendedprice), 2) AS customer_lifetime_value
      FROM yamlm_lineitem l
      LEFT JOIN yamlm_orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey
    deps: [yamlm_orders, yamlm_lineitem]
  - name: yamlm_customers_mart
    sql: |
      SELECT c.c_custkey AS customer_id,
             c.c_name AS name,
             c.c_mktsegment AS segment,
             co.first_order,
             co.most_recent_order,
             co.number_of_orders,
             cp.customer_lifetime_value
      FROM yamlm_customer c
      LEFT JOIN yamlm_customer_orders co ON c.c_custkey = co.customer_id
      LEFT JOIN yamlm_customer_payments cp ON c.c_custkey = cp.customer_id
    deps: [yamlm_customer, yamlm_customer_orders, yamlm_customer_payments]
sources:
  - name: yamlm_customer
  - name: yamlm_orders
  - name: yamlm_lineitem
"""
    sources = {
        f"yamlm_{t}": load_table(spark, sf_dir, t)
        for t in ("customer", "orders", "lineitem")
    }
    project, _tests = load_project_yaml(doc, sources=sources)
    try:
        # resolve() analyzes eagerly through Spark's analyzer, so the
        # returned plan no longer needs the temp views after this call
        return project.resolve("yamlm_customers_mart", spark)
    finally:
        for v in (
            "yamlm_customer",
            "yamlm_orders",
            "yamlm_lineitem",
            "yamlm_customer_orders",
            "yamlm_customer_payments",
            "yamlm_customers_mart",
        ):
            spark.catalog.dropTempView(v)


# -- verbatim reference-file execution (plans/jinja_lite.py) ------------
#
# The raw_* source adapters below re-shape the driver's TPC-H-ish tables
# into the column surface the reference's staging models expect (id,
# user_id, order_date, status / id, order_id, payment_method, amount-in-
# cents), so the five reference .sql files run UNMODIFIED on top. Two
# determinism choices, mirrored exactly in the DuckDB oracles:
# - payment_method is derived as l_linenumber % 4 into the reference's
#   own four-method list (orders.sql:1);
# - amount is whole-dollar cents (round(l_extendedprice)*100): after the
#   reference's amount/100 staging division every payment is an
#   integer-valued double, so the marts' un-rounded sum(amount) columns
#   (orders.sql:24; customers.sql:36) are order-independent and
#   bit-identical cross-engine WITHOUT editing the reference SQL.

_REF_MODELS_DIR = "/root/reference/models"

_REF_PAYMENT_SRC = """
    SELECT l_orderkey AS order_id,
           CASE l_linenumber % 4 WHEN 0 THEN 'credit_card'
                WHEN 1 THEN 'coupon' WHEN 2 THEN 'bank_transfer'
                ELSE 'gift_card' END AS payment_method,
           CAST(round(l_extendedprice) AS BIGINT) * 100 AS amount
    FROM lineitem
"""

_REF_ORDERS_MART_ORACLE = f"""
    WITH raw_pay AS ({_REF_PAYMENT_SRC}),
    pay AS (SELECT order_id, payment_method, amount / 100 AS amount FROM raw_pay),
    order_payments AS (
      SELECT order_id,
             sum(CASE WHEN payment_method = 'credit_card' THEN amount ELSE 0 END) AS credit_card_amount,
             sum(CASE WHEN payment_method = 'coupon' THEN amount ELSE 0 END) AS coupon_amount,
             sum(CASE WHEN payment_method = 'bank_transfer' THEN amount ELSE 0 END) AS bank_transfer_amount,
             sum(CASE WHEN payment_method = 'gift_card' THEN amount ELSE 0 END) AS gift_card_amount,
             sum(amount) AS amount
      FROM pay GROUP BY order_id
    )
    SELECT o.o_orderkey AS order_id,
           o.o_custkey AS customer_id,
           o.o_orderdate AS order_date,
           o.o_orderstatus AS status,
           p.credit_card_amount, p.coupon_amount,
           p.bank_transfer_amount, p.gift_card_amount,
           p.amount
    FROM orders o
    LEFT JOIN order_payments p ON o.o_orderkey = p.order_id
"""

_REF_CUSTOMERS_MART_ORACLE = f"""
    WITH raw_pay AS ({_REF_PAYMENT_SRC}),
    pay AS (SELECT order_id, amount / 100 AS amount FROM raw_pay),
    customer_orders AS (
      SELECT o_custkey AS customer_id,
             min(o_orderdate) AS first_order,
             max(o_orderdate) AS most_recent_order,
             count(o_orderkey) AS number_of_orders
      FROM orders GROUP BY o_custkey
    ),
    customer_payments AS (
      SELECT o.o_custkey AS customer_id, sum(p.amount) AS total_amount
      FROM pay p LEFT JOIN orders o ON p.order_id = o.o_orderkey
      GROUP BY o.o_custkey
    )
    SELECT c.c_custkey AS customer_id,
           c.c_name AS first_name,
           c.c_mktsegment AS last_name,
           co.first_order,
           co.most_recent_order,
           co.number_of_orders,
           cp.total_amount AS customer_lifetime_value
    FROM customer c
    LEFT JOIN customer_orders co ON c.c_custkey = co.customer_id
    LEFT JOIN customer_payments cp ON c.c_custkey = cp.customer_id
"""

_REF_VIEWS = (
    "raw_customers",
    "raw_orders",
    "raw_payments",
    "stg_customers",
    "stg_orders",
    "stg_payments",
    "ref_orders_mart",
    "ref_customers_mart",
)


def _ref_jinja_project(spark: SparkSession, sf_dir: str):
    """Build a Project whose five models are the UNMODIFIED reference
    .sql file bodies, over raw_* adapters of the driver tables.

    These two catalog entries are the only ones with a RUNTIME
    dependency on the reference checkout (they read its .sql files to
    prove unmodified-model execution). Degrade loudly — not with a
    bare ENOENT deep in the stack — when it is absent, so the rest of
    the 329-query catalog stays fully usable in any environment.
    """
    import os

    from ..plans.registry import Project

    if not os.path.isdir(_REF_MODELS_DIR):
        raise FileNotFoundError(
            f"reference models dir {_REF_MODELS_DIR!r} is not present: "
            "the sql_model_orders_mart / jinja_model_customers_mart "
            "entries execute the reference's unmodified .sql files and "
            "need that checkout; every other catalog entry is "
            "self-contained. Point _REF_MODELS_DIR at a checkout of "
            "dbt-labs/jaffle-shop-classic models/ to enable them."
        )
    p = Project()
    p.add_source(
        "raw_customers",
        load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("first_name"),
            F.col("c_mktsegment").alias("last_name"),
        ),
    )
    p.add_source(
        "raw_orders",
        load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("id"),
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_orderstatus").alias("status"),
        ),
    )
    methods = F.array(
        *(F.lit(m) for m in ("credit_card", "coupon", "bank_transfer", "gift_card"))
    )
    p.add_source(
        "raw_payments",
        load_table(spark, sf_dir, "lineitem").select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
            F.col("l_orderkey").alias("order_id"),
            F.element_at(methods, (F.col("l_linenumber") % 4) + 1).alias(
                "payment_method"
            ),
            (
                F.round(F.col("l_extendedprice")).cast("bigint") * 100
            ).alias("amount"),
        ),
    )
    for fname, model in (
        ("staging/stg_customers.sql", "stg_customers"),
        ("staging/stg_orders.sql", "stg_orders"),
        ("staging/stg_payments.sql", "stg_payments"),
        ("orders.sql", "ref_orders_mart"),
        ("customers.sql", "ref_customers_mart"),
    ):
        path = os.path.join(_REF_MODELS_DIR, fname)
        with open(path) as fh:
            p.jinja_sql_model(model, fh.read())
    return p


@register(
    "sql_model_orders_mart",
    oracle=_REF_ORDERS_MART_ORACLE,
    doc="The reference's models/orders.sql FILE BODY executed verbatim — "
    "no brace-stripping, no hand-migrated loop: plans/jinja_lite.py "
    "renders the {% set %} list, both {% for %} pivot loops and the "
    "{{ ref() }} edges (orders.sql:1,5,11,20-22,42-46) plus the "
    "staging files' {#- comments and refs, and Project.sql_model "
    "executes the rendered SQL through Spark's own analyzer. The only "
    "authored code is the raw_* source adapters (TPC-H columns -> the "
    "seed surface) — the exact dbt 'switch your sources, keep your "
    "models' migration. Same conditional-aggregate pivot + LEFT join "
    "scale shape as the certified jaffle_orders twin: one partial-> "
    "final hash aggregate on order_id and a key join, no new shuffle "
    "class. Whole-dollar payment amounts keep the reference's "
    "UN-rounded sum(amount) columns exact cross-engine (see adapter "
    "comment).",
)
def q_sql_model_orders_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _ref_jinja_project(spark, sf_dir)
    try:
        return p.resolve("ref_orders_mart", spark)
    finally:
        for v in _REF_VIEWS:
            spark.catalog.dropTempView(v)


@register(
    "jinja_model_customers_mart",
    oracle=_REF_CUSTOMERS_MART_ORACLE,
    doc="The reference's models/customers.sql FILE BODY executed "
    "verbatim through the same jinja_lite render path as "
    "sql_model_orders_mart (customers.sql:1-67: three {{ ref() }} "
    "CTEs, join-then-aggregate customer_payments, NULL-preserving "
    "LEFT joins). Certifies the renderer on the no-loop model shape "
    "and pins the reference's unfused two-aggregate plan next to the "
    "engine-native fused rewrite (jaffle_customers) under the same "
    "oracle discipline.",
)
def q_jinja_model_customers_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _ref_jinja_project(spark, sf_dir)
    try:
        return p.resolve("ref_customers_mart", spark)
    finally:
        for v in _REF_VIEWS:
            spark.catalog.dropTempView(v)
