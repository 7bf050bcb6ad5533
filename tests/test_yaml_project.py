"""YAML project loader: the reference's authoring dialect (schema.yml
tests + SQL model bodies) must build the SAME pipeline as the Python
registration in models/jaffle.py, and its 20 declared tests must all
compile and pass on the reference's own seeds."""

from __future__ import annotations

import pytest

from jaffle_shop_classic_spark.models.jaffle import (
    build_project,
    load_jaffle_sources,
)
from jaffle_shop_classic_spark.plans.yaml_project import (
    SchemaTest,
    compile_schema_tests,
    load_project_yaml,
    parse_ref,
)
from jaffle_shop_classic_spark.sources.seeds import load_seeds
from jaffle_shop_classic_spark.testing.checks import run_checks

# The jaffle pipeline in the YAML dialect: models as inline SQL (the
# compiled form of the reference's .sql files — ref() braces dropped,
# deps declared), schema tests verbatim from BOTH schema.yml files.
JAFFLE_YAML = """
version: 2

sources:
  - name: raw_customers
  - name: raw_orders
  - name: raw_payments

models:
  - name: stg_customers
    sql: SELECT id AS customer_id, first_name, last_name FROM raw_customers
    deps: [raw_customers]
    columns:
      - name: customer_id
        tests: [unique, not_null]

  - name: stg_orders
    sql: >
      SELECT id AS order_id, user_id AS customer_id, order_date, status
      FROM raw_orders
    deps: [raw_orders]
    columns:
      - name: order_id
        tests: [unique, not_null]
      - name: status
        tests:
          - accepted_values:
              values: ['placed', 'shipped', 'completed', 'return_pending', 'returned']

  - name: stg_payments
    sql: >
      SELECT id AS payment_id, order_id, payment_method, amount / 100 AS amount
      FROM raw_payments
    deps: [raw_payments]
    columns:
      - name: payment_id
        tests: [unique, not_null]
      - name: payment_method
        tests:
          - accepted_values:
              values: ['credit_card', 'coupon', 'bank_transfer', 'gift_card']

  - name: customers
    materialized: table
    deps: [stg_customers, stg_orders, stg_payments]
    description: One row per customer with order stats and lifetime value.
    sql: |
      WITH customer_orders AS (
        SELECT customer_id,
               min(order_date) AS first_order,
               max(order_date) AS most_recent_order,
               count(order_id) AS number_of_orders
        FROM stg_orders GROUP BY customer_id
      ),
      customer_payments AS (
        SELECT o.customer_id, sum(p.amount) AS total_amount
        FROM stg_payments p
        LEFT JOIN stg_orders o ON p.order_id = o.order_id
        GROUP BY o.customer_id
      )
      SELECT c.customer_id, c.first_name, c.last_name,
             co.first_order, co.most_recent_order, co.number_of_orders,
             cp.total_amount AS customer_lifetime_value
      FROM stg_customers c
      LEFT JOIN customer_orders co ON c.customer_id = co.customer_id
      LEFT JOIN customer_payments cp ON c.customer_id = cp.customer_id
    columns:
      - name: customer_id
        tests: [unique, not_null]

  - name: orders
    materialized: table
    deps: [stg_orders, stg_payments]
    sql: |
      WITH order_payments AS (
        SELECT order_id,
               sum(CASE WHEN payment_method = 'credit_card' THEN amount ELSE 0 END) AS credit_card_amount,
               sum(CASE WHEN payment_method = 'coupon' THEN amount ELSE 0 END) AS coupon_amount,
               sum(CASE WHEN payment_method = 'bank_transfer' THEN amount ELSE 0 END) AS bank_transfer_amount,
               sum(CASE WHEN payment_method = 'gift_card' THEN amount ELSE 0 END) AS gift_card_amount,
               sum(amount) AS total_amount
        FROM stg_payments GROUP BY order_id
      )
      SELECT o.order_id, o.customer_id, o.order_date, o.status,
             p.credit_card_amount, p.coupon_amount,
             p.bank_transfer_amount, p.gift_card_amount,
             p.total_amount AS amount
      FROM stg_orders o
      LEFT JOIN order_payments p ON o.order_id = p.order_id
    columns:
      - name: order_id
        tests: [unique, not_null]
      - name: customer_id
        tests:
          - not_null
          - relationships:
              to: ref('customers')
              field: customer_id
      - name: status
        tests:
          - accepted_values:
              values: ['placed', 'shipped', 'completed', 'return_pending', 'returned']
      - name: amount
        tests: [not_null]
      - name: credit_card_amount
        tests: [not_null]
      - name: coupon_amount
        tests: [not_null]
      - name: bank_transfer_amount
        tests: [not_null]
      - name: gift_card_amount
        tests: [not_null]
"""


def _rounded_rows(df, ndigits=6):
    cols = sorted(df.columns)
    out = []
    for r in df.select(*cols).collect():
        out.append(
            tuple(
                round(v, ndigits) if isinstance(v, float) else v
                for v in (r[c] for c in cols)
            )
        )
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def test_yaml_project_matches_python_registration(spark, tmp_path):
    seeds = load_seeds(spark, warehouse_dir=str(tmp_path / "wh_seed"))
    yproj, tests = load_project_yaml(
        JAFFLE_YAML, sources=seeds, warehouse_dir=str(tmp_path / "wh_yaml")
    )
    built_yaml = yproj.run(spark)

    pproj = build_project(warehouse_dir=str(tmp_path / "wh_py"))
    load_jaffle_sources(pproj, spark)
    built_py = pproj.run(spark)

    for model in ("stg_customers", "stg_orders", "stg_payments", "customers", "orders"):
        assert set(built_yaml[model].columns) == set(built_py[model].columns), model
        assert _rounded_rows(built_yaml[model]) == _rounded_rows(built_py[model]), model


def test_yaml_declared_tests_all_pass_on_seeds(spark, tmp_path):
    seeds = load_seeds(spark, warehouse_dir=str(tmp_path / "wh_seed2"))
    yproj, tests = load_project_yaml(
        JAFFLE_YAML, sources=seeds, warehouse_dir=str(tmp_path / "wh_yaml2")
    )
    # the reference declares exactly 20 test instances across both
    # schema.yml files — the YAML above carries all of them
    assert len(tests) == 20
    kinds = sorted(t.kind for t in tests)
    assert kinds.count("unique") == 5
    assert kinds.count("not_null") == 11
    assert kinds.count("accepted_values") == 3
    assert kinds.count("relationships") == 1
    yproj.run(spark)
    results = run_checks(compile_schema_tests(yproj, spark, tests))
    failed = [r for r in results if not r.passed]
    assert not failed, failed


def test_yaml_overlay_attaches_tests_to_python_models(spark, tmp_path):
    """schema.yml without sql: overlays docs/tests onto models already
    registered in Python — dbt's actual file layout."""
    pproj = build_project(warehouse_dir=str(tmp_path / "wh_ov"))
    load_jaffle_sources(pproj, spark)
    overlay = """
models:
  - name: customers
    columns:
      - name: customer_id
        description: Primary key.
        tests: [unique, not_null]
"""
    proj, tests = load_project_yaml(overlay, project=pproj)
    assert proj is pproj
    assert [t.name for t in tests] == [
        "unique_customers_customer_id",
        "not_null_customers_customer_id",
    ]
    assert pproj.models["customers"].columns["customer_id"] == "Primary key."
    results = run_checks(compile_schema_tests(proj, spark, tests))
    assert all(r.passed for r in results)


def test_yaml_loader_rejects_unknown_test_kind():
    with pytest.raises(ValueError, match="unknown test kind"):
        load_project_yaml(
            """
models:
  - name: m
    sql: SELECT 1 AS x
    columns:
      - name: x
        tests: [uniqe]
"""
        )


def test_yaml_loader_rejects_overlay_on_missing_model():
    with pytest.raises(KeyError, match="not already registered"):
        load_project_yaml("models:\n  - name: ghost\n")


def test_parse_ref_variants():
    assert parse_ref("ref('customers')") == "customers"
    assert parse_ref('ref("stg_orders")') == "stg_orders"
    assert parse_ref("customers") == "customers"


def test_schema_test_violations_surface(spark, tmp_path):
    """A planted duplicate must fail the unique test — the loader's
    tests are real checks, not declarations."""
    from jaffle_shop_classic_spark.plans.registry import Project

    proj = Project()
    dup = spark.createDataFrame([(1,), (1,), (2,)], "k bigint")
    proj.add_source("src_dup", dup)
    proj2, tests = load_project_yaml(
        """
models:
  - name: m_dup
    sql: SELECT k FROM src_dup
    deps: [src_dup]
    columns:
      - name: k
        tests: [unique]
""",
        project=proj,
    )
    results = run_checks(compile_schema_tests(proj2, spark, tests))
    assert len(results) == 1 and not results[0].passed
    assert results[0].n_violations == 1  # one duplicated value


def test_cli_yaml_test_key_collision_keeps_builtin(tmp_path, capsys):
    """A YAML test compiling to the SAME key as a built-in jaffle check
    must not silently replace it (dict.update would drop the built-in
    without a trace): the YAML check is recorded under a _yaml suffix and
    BOTH run. The collision is manufactured via a model named
    `_stg_orders` with column `_order_id` — SchemaTest keys are
    `<kind>_<model>_<column>`, so it lands exactly on the built-in
    `unique__stg_orders__order_id`."""
    from jaffle_shop_classic_spark.__main__ import main

    y = tmp_path / "collide.yml"
    y.write_text(
        "models:\n"
        "  - name: _stg_orders\n"
        "    sql: 'SELECT 1 AS _order_id UNION ALL SELECT 1 AS _order_id'\n"
        "    columns:\n"
        "      - name: _order_id\n"
        "        tests: [unique]\n"
    )
    rc = main(["test", "--project-yaml", str(y)])
    out = capsys.readouterr().out
    # the duplicate-row YAML test fails -> exit 1, under the suffixed key
    assert rc == 1
    assert "unique__stg_orders__order_id_yaml" in out
    # the built-in check still ran (and passed) under its own key
    builtin_lines = [
        ln for ln in out.splitlines()
        if "unique__stg_orders__order_id" in ln and "_yaml" not in ln
    ]
    assert builtin_lines and all("PASS" in ln for ln in builtin_lines)
