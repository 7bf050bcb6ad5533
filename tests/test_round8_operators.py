"""Round-8 operators: value-level checks beyond oracle parity — each
asserts a property the hash comparison alone would not explain to a
reader (conservation, bounds, separation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jaffle_shop_classic_spark.operators.catalog import load_catalog

SF = "/root/testdata/sf0.001"


def test_udtf_installments_conserve_total(spark):
    """Every order's 3 installments sum back to its exact cent total —
    the UDTF neither drops nor invents cents."""
    out = load_catalog()["udtf_installment_plan"].fn(spark, SF)
    per_order = out.groupBy("order_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("amount_cents").alias("cents")
    )
    from jaffle_shop_classic_spark.sources.parquet import load_table

    orders = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("expect"),
    )
    joined = per_order.join(orders, "order_id")
    assert joined.filter("n != 3 OR cents != expect").count() == 0
    assert per_order.count() == orders.count()


def test_ann_recall_bounded_and_consistent(spark):
    rows = load_catalog()["sim_ann_recall_eval"].fn(spark, SF).collect()
    assert rows, "query sample must be non-empty"
    for r in rows:
        assert 0 <= r["n_hits"] <= 10
        assert abs(r["recall_at_k"] - r["n_hits"] / 10.0) < 1e-9
    # single-probe IVF on 10 coarse lists must find at least part of the
    # true neighborhood somewhere in the sample (all-zero recall would
    # mean the index is broken, not merely coarse)
    assert any(r["n_hits"] > 0 for r in rows)


def test_fellegi_sunter_weights_separate_fields(spark):
    rows = {
        r["field"]: r
        for r in load_catalog()["er_fellegi_sunter_em"].fn(spark, SF).collect()
    }
    assert set(rows) == {"prior", "name", "type", "size", "price_band"}
    for r in rows.values():
        assert 0 <= r["m_micro"] <= 1_000_000
        assert 0 <= r["u_micro"] <= 1_000_000
    # EM must learn that name agreement is informative: matches agree on
    # name far more often than non-matches (m >> u), i.e. the m/u ratio
    # exceeds 1 — the minimum property any usable linkage model has
    name = rows["name"]
    assert name["m_micro"] > name["u_micro"]
    assert name["mu_ratio_milli"] is None or name["mu_ratio_milli"] > 1000
