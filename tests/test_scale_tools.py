"""Bucketed co-located joins and salted skew joins: correctness AND the
plan properties that make them scale tools (no exchange / spread keys)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jaffle_shop_classic_spark.functions.skew import salted_join
from jaffle_shop_classic_spark.sources.bucketed import bucketed_join, write_bucketed
from jaffle_shop_classic_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 4, path=str(wh / "b_orders"))
    write_bucketed(li, "b_lineitem", "o_orderkey", 4, path=str(wh / "b_lineitem"))
    return "b_orders", "b_lineitem"


def test_bucketed_join_elides_both_exchanges(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable auto-broadcast to simulate the fact-fact case bucketing
    # exists for (at test scale the planner would just broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "o_orderkey")
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan  # the whole point of bucketing
    assert "SortMergeJoin" in plan


def test_bucketed_join_is_correct(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    got = bucketed_join(spark, left, right, "o_orderkey").count()
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert got == want


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customers = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    customers = customers.withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(customers, "o_custkey").groupBy("c_mktsegment").count()
    salted = salted_join(orders, customers, "o_custkey", num_salts=4).groupBy(
        "c_mktsegment"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_preserves_unmatched(spark):
    large = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], ["k", "v"])
    small = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "w"])
    res = salted_join(large, small, "k", num_salts=3, how="left").collect()
    assert len(res) == 3
    assert {r["k"]: r["w"] for r in res}[99] is None


def test_salt_spreads_hot_key(spark):
    # one key with 1000 rows: salted join must not put them all in one
    # (key, salt) group
    hot = spark.range(1000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(7, "hot")], ["k", "w"])
    from jaffle_shop_classic_spark.functions.skew import SALT_COL, salt_column

    salted = hot.withColumn(SALT_COL, salt_column(8, F.col("k"), F.col("v")))
    n_salts = salted.select(SALT_COL).distinct().count()
    assert n_salts == 8


def test_star_cc_converges_logarithmically_on_path_graph(spark):
    # a 256-node path is the adversarial case for hash-min label
    # propagation (needs 255 rounds — would blow MAX_CC_ITERS=20);
    # star contraction must finish within 2*log2(256)+2 = 18
    # alternations, and in practice well under 10
    from jaffle_shop_classic_spark.operators.dedup import star_components

    n = 256
    pairs = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    comp = star_components(pairs, max_iters=10).collect()
    assert len(comp) == n
    assert {r["component_id"] for r in comp} == {0}
    assert {r["doc_id"] for r in comp} == set(range(n))


def test_star_cc_multiple_components(spark):
    from jaffle_shop_classic_spark.operators.dedup import star_components

    edges = [(0, 1), (1, 2), (5, 6), (8, 9), (6, 9)]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    comp = {r["doc_id"]: r["component_id"] for r in star_components(pairs).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 8: 5, 9: 5}
