"""plans/jinja_lite.py: the compile-time dbt-Jinja subset renderer that
lets the reference's model FILES run verbatim (r12 verdict's last
migration-friction item). The oracle-parity gate certifies the VALUES
(sql_model_orders_mart / jinja_model_customers_mart); these tests pin
the render semantics themselves, including the failure modes."""

from __future__ import annotations

import os

import pytest

from jaffle_shop_classic_spark.plans.jinja_lite import (
    RenderedModel,
    UnsupportedJinja,
    render_model_source,
)

REF_MODELS = "/root/reference/models"


def test_ref_substitution_and_dep_extraction():
    r = render_model_source("select * from {{ ref('stg_orders') }}")
    assert r.sql == "select * from stg_orders"
    assert r.deps == ("stg_orders",)


def test_duplicate_refs_collapse_but_keep_order():
    r = render_model_source(
        "select * from {{ ref('b') }} join {{ ref('a') }} using (k) "
        "join {{ ref('b') }} using (k)"
    )
    assert r.deps == ("b", "a")


def test_comments_stripped_including_trim_variant():
    r = render_model_source("select 1 {#- a multi\nline comment #} as x")
    assert "comment" not in r.sql
    assert "select 1" in r.sql and "as x" in r.sql


def test_set_plus_for_loop_expands_like_dbt_compile():
    src = (
        "{% set ms = ['a', 'b'] %}\n"
        "select\n"
        "{% for m in ms -%}\n"
        "sum(case when pm = '{{ m }}' then amt else 0 end) as {{ m }}_amt,\n"
        "{% endfor -%}\n"
        "sum(amt) as total from {{ ref('p') }} group by 1"
    )
    r = render_model_source(src)
    assert "as a_amt," in r.sql and "as b_amt," in r.sql
    assert r.sql.index("a_amt") < r.sql.index("b_amt")
    assert "{%" not in r.sql and "{{" not in r.sql
    assert r.deps == ("p",)


def test_sequential_loops_both_expand():
    src = (
        "{% set xs = ['u', 'v'] %}"
        "{% for x in xs %}{{ x }}1 {% endfor %}|"
        "{% for x in xs %}{{ x }}2 {% endfor %}"
    )
    assert render_model_source(src).sql == "u1 v1 |u2 v2 "


def test_unsupported_constructs_fail_loudly():
    for src in (
        "select {% if x %}1{% endif %}",  # control flow
        "select {{ var('x') }}",  # runtime var()
        "{% for x in nowhere %}{{ x }}{% endfor %}",  # unbound loop
        "select {{ unbound_name }}",  # unbound scalar
        "{% set x = __import__('os') %} select 1",  # non-literal set
    ):
        with pytest.raises(UnsupportedJinja):
            render_model_source(src)


@pytest.mark.parametrize(
    "fname,expected_deps",
    [
        ("staging/stg_customers.sql", ("raw_customers",)),
        ("staging/stg_orders.sql", ("raw_orders",)),
        ("staging/stg_payments.sql", ("raw_payments",)),
        ("orders.sql", ("stg_orders", "stg_payments")),
        ("customers.sql", ("stg_customers", "stg_orders", "stg_payments")),
    ],
)
def test_every_reference_model_file_renders_clean(fname, expected_deps):
    with open(os.path.join(REF_MODELS, fname)) as fh:
        r = render_model_source(fh.read())
    assert isinstance(r, RenderedModel)
    assert r.deps == expected_deps
    assert "{{" not in r.sql and "{%" not in r.sql and "{#" not in r.sql


def test_orders_file_pivot_expands_all_four_methods():
    with open(os.path.join(REF_MODELS, "orders.sql")) as fh:
        sql = render_model_source(fh.read()).sql
    for m in ("credit_card", "coupon", "bank_transfer", "gift_card"):
        # once in the aggregate pivot, once in the final projection
        assert sql.count(f"{m}_amount") == 2, m
    assert "sum(amount) as total_amount" in sql


# ------------------------------------------------ round-14: {% if %}
def test_if_truthy_set_bound_name():
    out = render_model_source(
        "{% set use_flag = true %}"
        "SELECT a{% if use_flag %}, b{% endif %} FROM t"
    )
    assert out.sql == "SELECT a, b FROM t"


def test_if_else_falsy_literal():
    out = render_model_source(
        "SELECT {% if false %}a{% else %}b{% endif %} FROM t"
    )
    assert out.sql == "SELECT b FROM t"


def test_if_not_negation():
    out = render_model_source(
        "{% set legacy = [] %}"
        "SELECT {% if not legacy %}new_col{% else %}old_col{% endif %} FROM t"
    )
    assert out.sql == "SELECT new_col FROM t"


def test_if_computed_condition_still_raises():
    with pytest.raises(UnsupportedJinja, match="condition must be"):
        render_model_source(
            "SELECT {% if var('flag') %}a{% endif %} FROM t"
        )


def test_if_comparison_condition_still_raises():
    with pytest.raises(UnsupportedJinja, match="condition must be"):
        render_model_source(
            "{% set n = 3 %}SELECT {% if n > 2 %}a{% endif %} FROM t"
        )


def test_nested_if_still_raises():
    with pytest.raises(UnsupportedJinja, match="nested"):
        render_model_source(
            "{% if true %}{% if true %}a{% endif %}{% endif %}"
        )


def test_macro_still_raises_after_if_support():
    with pytest.raises(UnsupportedJinja):
        render_model_source("{% macro m() %}x{% endmacro %}SELECT 1")
