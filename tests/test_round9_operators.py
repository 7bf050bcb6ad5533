"""Round-9 operators: value-level checks beyond oracle parity — each
asserts a property the hash comparison alone would not explain to a
reader (analytic values on planted inputs, boundary behavior,
conservation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jaffle_shop_classic_spark.operators.catalog import load_catalog
from jaffle_shop_classic_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_ks_statistic_bounds_and_definition(spark):
    """0 <= D <= 1, and the integer numerator reproduces D exactly."""
    r = load_catalog()["ks_test_two_sample"].fn(spark, SF).collect()[0]
    assert r["n1"] > 0 and r["n2"] > 0
    assert 0.0 <= r["ks_d"] <= 1.0
    assert abs(r["ks_d"] - round(r["d_num"] / (r["n1"] * r["n2"]), 6)) < 1e-12


def test_ks_disjoint_distributions_hit_d_equals_one(spark, tmp_path):
    """Plant two segments with non-overlapping price ranges: the KS
    supremum must be exactly 1 (d_num == n1*n2) — the statistic's
    defining extreme."""
    cust = [(i, f"c{i}", 0, 0.0, "BUILDING" if i < 40 else "MACHINERY")
            for i in range(100)]
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    orders = [
        (i, i, "F", 10.0 + i if i < 40 else 5000.0 + i, "2024-01-01", "1-URGENT")
        for i in range(100)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    r = load_catalog()["ks_test_two_sample"].fn(spark, str(tmp_path)).collect()[0]
    assert (r["n1"], r["n2"]) == (40, 60)
    assert r["d_num"] == 40 * 60 and r["ks_d"] == 1.0


def test_q22_threshold_is_strictly_above_average(spark):
    """Every surviving customer's balance must exceed the eligible-
    population average (recomputed here from the source tables), and
    every survivor must be lapsed (no order on/after the cutoff)."""
    out = load_catalog()["tpch_q22_style"].fn(spark, SF)
    c = load_table(spark, SF, "customer").where(
        F.col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD", "FURNITURE")
        & (F.col("c_acctbal") > 0)
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    tot, cnt = c.agg(F.sum("cents"), F.count(F.lit(1))).collect()[0]
    o = load_table(spark, SF, "orders").where(F.col("o_orderdate") >= "1999-01-01")
    survivors = (
        c.where(F.col("cents") * cnt > tot)
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = {r["segment"]: r["n_custs"] for r in out.collect()}
    assert got == {r["c_mktsegment"]: r["n"] for r in survivors}
    assert sum(got.values()) > 0  # the recency redefinition is non-vacuous


def test_q11_threshold_boundary_integer_exact(spark, tmp_path):
    """value > total div 2000 must be equivalent to 2000*value > total:
    plant a part EXACTLY at the fraction boundary and one just above —
    only the latter may survive."""
    # 2000 parts of 1 cent each -> total = 2000, threshold value > 1;
    # part 0 gets 2 cents (total 2001 -> div = 1): survives; all the
    # 1-cent parts sit exactly at value == total div 2000 == 1: excluded
    rows = [(0, 0, 0, 1, 0.015, 0.0, 0.0, "N", "O", "2024-01-01")]
    rows += [(i, i, 0, 1, 0.005, 0.0, 0.0, "N", "O", "2024-01-01") for i in range(1, 2000)]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp")).withColumn(
        "l_quantity", F.lit(1.0)
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    got = load_catalog()["tpch_q11_style"].fn(spark, str(tmp_path)).collect()
    assert [(r["l_partkey"], r["value_cents"]) for r in got] == [(0, 2)]


def test_winsorize_clips_planted_outlier(spark, tmp_path):
    """One mega-order among uniform prices: the p95 threshold must cap
    it, the clip counters must see exactly the planted tails, and the
    winsorized total must equal the analytic value."""
    cust = [(i, f"c{i}", 0, 0.0, "BUILDING") for i in range(100)]
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    # 99 orders at exactly $100, one at $1,000,000
    orders = [(i, i, "F", 100.0, "2024-01-01", "1-URGENT") for i in range(99)]
    orders.append((99, 99, "F", 1_000_000.0, "2024-01-01", "1-URGENT"))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    r = load_catalog()["winsorize_group_clip"].fn(spark, str(tmp_path)).collect()[0]
    # n=100: lo rank ceil(5)=5 -> 10000 cents, hi rank ceil(95)=95 -> 10000
    assert (r["lo_cents"], r["hi_cents"]) == (10_000, 10_000)
    assert r["n_clipped_low"] == 0 and r["n_clipped_high"] == 1
    assert r["winsorized_total"] == 100 * 100.0  # all rows clamp to $100


def test_mixture_weights_uniform_budget_split(spark, tmp_path):
    """Two sources, 3:1 token imbalance, budget 10M: targets split the
    budget evenly; the scarcer source is oversampled with weight
    target/avail exactly."""
    docs = [(i, "a b c d e f", "en", "big", 11) for i in range(300)]
    docs += [(1000 + i, "a b c d e f", "en", "small", 11) for i in range(100)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r["source"]: r
        for r in load_catalog()["data_mixture_weights"].fn(spark, str(tmp_path)).collect()
    }
    assert rows["big"]["avail_tokens"] == 1800 and rows["small"]["avail_tokens"] == 600
    for r in rows.values():
        assert r["target_tokens"] == 5_000_000
        assert r["oversampled"] is True
        assert abs(r["sample_weight"] - round(5_000_000 / r["avail_tokens"], 6)) < 1e-9
    # 3:1 availability inverts to a 3:1 weight ratio (up to the 6dp
    # projection rounding on each side)
    assert abs(rows["small"]["sample_weight"] - 3 * rows["big"]["sample_weight"]) < 1e-5


def test_kcore_peels_star_keeps_clique(spark):
    """On star(center + 5 leaves) ∪ triangle: leaves have degree 1 < 2
    and peel in round 1, which strands the center (degree 0) in round
    2 — the triangle alone survives with within-core degree 2. The
    multi-round cascade is exactly what single-pass degree filtering
    would get wrong."""
    from jaffle_shop_classic_spark.operators.dedup import kcore_peel

    pairs = [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    edges = edges.unionByName(edges.selectExpr("dst AS src", "src AS dst"))
    out = (
        kcore_peel(edges, k=2, rounds=4)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .collect()
    )
    assert {r["src"]: r["deg"] for r in out} == {10: 2, 11: 2, 12: 2}


def test_cusum_identity_matches_recursive_fold(spark, tmp_path):
    """The prefix-min rewrite must equal the textbook recursion
    S_t = max(0, S_{t-1} + x_t - k), checked day by day on a planted
    series with a mid-stream upward shift; flat days before the shift
    carry S=0 and no flags, the shifted tail flags."""
    # 10 days at $100, then 10 days at $300 -> k lands between the
    # regimes and the tail accumulates
    orders = []
    oid = 0
    for day in range(1, 21):
        price = 100.0 if day <= 10 else 300.0
        orders.append((oid, oid, "F", price, f"2024-01-{day:02d}", "1-URGENT"))
        oid += 1
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    rows = load_catalog()["cusum_revenue_shift"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 20
    # recursive reference in exact integers
    k = (10 * 10_000 + 10 * 30_000) // 20
    s_ref, flags_ref = [], []
    s = 0
    for day in range(1, 21):
        x = 10_000 if day <= 10 else 30_000
        s = max(0, s + x - k)
        s_ref.append(s)
        flags_ref.append(s > k)
    assert [r["s_cents"] for r in rows] == s_ref
    assert [r["flagged"] for r in rows] == flags_ref
    assert not any(flags_ref[:10]) and flags_ref[-1]


def test_rouge_l_planted_lcs(spark, tmp_path):
    """Two-doc source with a hand-computable LCS: cand='a b c d',
    ref='a x c y' share the in-order subsequence (a, c) -> LCS=2,
    P=R=F1=0.5. A second identical-pair source scores exactly 1."""
    docs = [
        (1, "a b c d", "en", "s1", 7),
        (2, "a x c y", "en", "s1", 7),
        (10, "p q r", "en", "s2", 5),
        (11, "p q r", "en", "s2", 5),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r["source"]: r
        for r in load_catalog()["text_rouge_l"].fn(spark, str(tmp_path)).collect()
    }
    s1, s2 = rows["s1"], rows["s2"]
    assert (s1["n_pairs"], s1["sum_lcs"], s1["sum_len_c"], s1["sum_len_r"]) == (1, 2, 4, 4)
    assert s1["rouge_l_p"] == 0.5 and s1["rouge_l_r"] == 0.5 and s1["rouge_l_f1"] == 0.5
    assert (s2["rouge_l_p"], s2["rouge_l_r"], s2["rouge_l_f1"]) == (1.0, 1.0, 1.0)


def test_binary_hamming_planted_sign_flips(spark, tmp_path):
    """Hand-built sign patterns: identical signs -> hamming 0, half
    flipped -> 32, all flipped -> 64; the exact-cosine rerank puts the
    identical vector first."""
    import numpy as np

    def vec(signs):
        return [float(s) for s in signs]

    plus = [1.0] * 64
    half = [1.0] * 32 + [-1.0] * 32
    rows = [
        (0, vec(plus), 0),    # query
        (1, vec(plus), 0),    # hamming 0, cosine 1
        (2, vec(half), 1),    # hamming 32, cosine 0
        (3, vec([-1.0] * 64), 1),  # hamming 64, cosine -1
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = load_catalog()["sim_binary_hamming_topk"].fn(spark, str(tmp_path)).collect()
    by_id = {r["vec_id"]: r for r in got}
    assert by_id[1]["hamming"] == 0 and by_id[1]["cosine"] == 1.0
    assert by_id[2]["hamming"] == 32 and abs(by_id[2]["cosine"]) < 1e-9
    assert by_id[3]["hamming"] == 64 and by_id[3]["cosine"] == -1.0
    assert got[0]["vec_id"] == 1  # rerank order is exact cosine


def test_spearman_planted_monotone_inverse_and_constant(spark, tmp_path):
    """Monotone segment -> rho=1, inverse segment -> rho=-1 (both exact
    despite balance ties handled via midranks), zero-variance segment
    -> NULL."""
    cust, orders, oid = [], [], 0

    def add(custkey, seg, bal, n_orders):
        nonlocal oid
        cust.append((custkey, f"c{custkey}", 0, bal, seg))
        for _ in range(n_orders):
            orders.append((oid, custkey, "F", 10.0, "2024-01-01", "1-URGENT"))
            oid += 1

    for k in range(6):  # MONO: higher balance -> more orders
        add(k, "MONO", 100.0 + k, k + 1)
    for k in range(6):  # INV: higher balance -> fewer orders
        add(100 + k, "INV", 100.0 + k, 6 - k)
    for k in range(4):  # FLAT: y constant -> zero variance -> NULL
        add(200 + k, "FLAT", 100.0 + k, 3)
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    rows = {
        r["segment"]: r
        for r in load_catalog()["eval_spearman_corr"].fn(spark, str(tmp_path)).collect()
    }
    assert rows["MONO"]["spearman_rho"] == 1.0
    assert rows["INV"]["spearman_rho"] == -1.0
    assert rows["FLAT"]["spearman_rho"] is None


def test_kl_divergence_symmetry_and_separation(spark, tmp_path):
    """Two identical-content sources must score the SAME KL (their
    smoothed distributions are interchangeable), a vocabulary-disjoint
    source must score strictly higher, and every smoothed KL is
    nonnegative (both sides are proper distributions over the shared
    vocabulary)."""
    docs = [(i, "a b c a b c", "en", "twin1", 11) for i in range(50)]
    docs += [(100 + i, "a b c a b c", "en", "twin2", 11) for i in range(50)]
    docs += [(200 + i, "x y z w v u", "en", "alien", 11) for i in range(10)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r["source"]: r["kl_vs_corpus"]
        for r in load_catalog()["source_kl_divergence"].fn(spark, str(tmp_path)).collect()
    }
    assert rows["twin1"] == rows["twin2"]
    assert all(v >= 0 for v in rows.values())
    assert rows["alien"] > rows["twin1"] + 0.5  # disjoint vocab dominates


def test_link_prediction_scores_shared_neighborhood(spark):
    """On a path a-b-c plus a hub wedge: the 2-hop pair (a, c) through b
    gets a known Jaccard; adjacent pairs never appear; the neighbor cap
    keeps a planted hub's wedge fanout bounded while its leaf pairs
    still score."""
    from jaffle_shop_classic_spark.operators.dedup import (
        LP_NEIGHBOR_CAP,
        _symmetric_edges,
    )
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    # reimplement the scoring body over a planted edge list (the catalog
    # entry derives its graph from LSH; the algebra is what we pin here)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)] + [(10, 100 + i) for i in range(40)],
        "doc_a long, doc_b long",
    )
    edges = _symmetric_edges(pairs)
    w = Window.partitionBy("src").orderBy("dst")
    capped = (
        edges.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= LP_NEIGHBOR_CAP)
        .select("src", "dst")
    )
    deg = {r["src"]: r["n"] for r in capped.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # hub 10 has 40 leaves but its capped adjacency is LP_NEIGHBOR_CAP
    assert deg[10] == LP_NEIGHBOR_CAP
    a, b_ = capped.alias("a"), capped.alias("b")
    common = (
        a.join(b_, (F.col("a.dst") == F.col("b.src")) & (F.col("a.src") < F.col("b.dst")))
        .groupBy(F.col("a.src").alias("u"), F.col("b.dst").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cand = common.join(
        pairs, (common["u"] == pairs["doc_a"]) & (common["v"] == pairs["doc_b"]), "left_anti"
    ).collect()
    got = {(r["u"], r["v"]): r["c"] for r in cand}
    # (1, 3) share exactly neighbor 2; deg(1)=deg(3)=1 -> jaccard 1/1=1
    assert got[(1, 3)] == 1
    # adjacent pair (1,2) must not be predicted
    assert (1, 2) not in got
    # hub leaf pairs within the capped adjacency share exactly the hub
    leaf_pairs = [k for k in got if k[0] >= 100]
    assert leaf_pairs and all(got[k] == 1 for k in leaf_pairs)
    # capped wedge fanout: at most C(cap, 2) leaf pairs from the hub
    assert len(leaf_pairs) <= LP_NEIGHBOR_CAP * (LP_NEIGHBOR_CAP - 1) // 2
