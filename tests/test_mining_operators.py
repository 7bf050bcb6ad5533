"""Behavioral tests for the mining/sketch/eval/privacy operators
(operators/mining.py). Oracle parity is covered by
test_oracle_parity.py; these pin SEMANTICS on planted inputs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from jaffle_shop_classic_spark.operators.catalog import load_catalog


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{path}/events.parquet")


def _write_lineitem(spark, path, order_parts):
    rows = [
        (ok, pk, 1, i, 1.0, 10.0, 0.0, 0.0, "N", "O", "1995-01-01")
        for ok, parts in order_parts
        for i, pk in enumerate(parts)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{path}/lineitem.parquet")


def test_cms_overcounts_but_never_undercounts(spark, tmp_path):
    """CMS one-sided error: est >= true for every probed token, and the
    planted heavy hitter must surface as the top estimate."""
    rows = [(i, "zzz", "en", "src0", 3) for i in range(50)] + [
        (100 + i, f"tok{i} filler", "en", "src0", 10) for i in range(30)
    ]
    _write_docs(spark, tmp_path, rows)
    out = load_catalog()["sketch_cms_frequencies"].fn(spark, str(tmp_path)).collect()
    assert out[0]["tok"] == "zzz"
    assert out[0]["true_n"] == 50
    for r in out:
        assert r["cms_est"] >= r["true_n"], r
        assert r["overcount"] == r["cms_est"] - r["true_n"]


def test_khop_chain_distances_and_support_threshold(spark, tmp_path):
    """A support-2 chain 1-2-3-4-5: BFS from seed 1 reaches exactly
    depth 3 (node 5 is 4 hops away), and a pair sharing only ONE order
    (1, 9) never becomes an edge."""
    order_parts = [
        (1, [1, 2]), (2, [1, 2]),
        (3, [2, 3]), (4, [2, 3]),
        (5, [3, 4]), (6, [3, 4]),
        (7, [4, 5]), (8, [4, 5]),
        (9, [1, 9]),  # support 1 -> no edge
    ]
    _write_lineitem(spark, tmp_path, order_parts)
    got = {
        r["node"]: r["dist"]
        for r in load_catalog()["graph_khop_reach"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_auc_separable_is_one_and_ties_are_half(spark, tmp_path):
    """Perfectly separable scores give AUC=1; all-equal scores give the
    exact tie credit 0.5."""
    # even user_ids -> cohort A: purchases strictly above non-purchases
    rows_a = [
        (i, "2024-01-01 00:00:00", 2, "purchase", 100.0 + i, "{}")
        for i in range(5)
    ] + [
        (10 + i, "2024-01-01 00:00:00", 4, "view", float(i), "{}")
        for i in range(5)
    ]
    # odd user_ids -> cohort B: every score identical (pure ties)
    rows_b = [
        (20 + i, "2024-01-01 00:00:00", 3, "purchase" if i < 4 else "view", 7.0, "{}")
        for i in range(10)
    ]
    _write_events(spark, tmp_path, rows_a + rows_b)
    got = {
        r["cohort"]: r
        for r in load_catalog()["eval_auc_mannwhitney"].fn(spark, str(tmp_path)).collect()
    }
    assert got["A"]["auc"] == 1.0
    assert (got["A"]["n_pos"], got["A"]["n_neg"]) == (5, 5)
    assert got["B"]["auc"] == 0.5


def test_auc_matches_pairwise_definition(spark, sf_dir):
    """On real data the rank-statistic AUC must equal the O(P*N)
    pairwise definition: mean over (pos, neg) pairs of
    1[s_p > s_n] + 0.5*1[s_p = s_n]."""
    import duckdb

    got = {
        r["cohort"]: r["auc"]
        for r in load_catalog()["eval_auc_mannwhitney"].fn(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = dict(
        con.execute(
            """
            WITH l AS (
              SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS cohort,
                     value AS s,
                     event_type = 'purchase' AS y
              FROM events
            )
            SELECT p.cohort,
                   round(avg(CASE WHEN p.s > n.s THEN 1.0
                                  WHEN p.s = n.s THEN 0.5
                                  ELSE 0.0 END), 6)
            FROM l p JOIN l n ON p.cohort = n.cohort
            WHERE p.y AND NOT n.y
            GROUP BY p.cohort
            """
        ).fetchall()
    )
    assert got == want


def test_dp_noise_is_bounded_and_deterministic(spark, tmp_path):
    """Seeded Laplace noise: |noisy - true| <= b*ln(1e6), reproducible
    across runs, and distinct groups draw distinct noise."""
    rows = [(i, "x", "en", "src0", 1) for i in range(100)] + [
        (200 + i, "x", "de", "src1", 1) for i in range(40)
    ]
    _write_docs(spark, tmp_path, rows)
    fn = load_catalog()["dp_noisy_group_counts"].fn
    out1 = {(r["lang"], r["source"]): r["noisy_n"] for r in fn(spark, str(tmp_path)).collect()}
    out2 = {(r["lang"], r["source"]): r["noisy_n"] for r in fn(spark, str(tmp_path)).collect()}
    assert out1 == out2  # seeded -> reproducible release
    true = {("en", "src0"): 100, ("de", "src1"): 40}
    bound = math.log(1e6) + 1e-9
    noises = []
    for k, v in out1.items():
        noise = v - true[k]
        assert abs(noise) <= bound, (k, noise)
        noises.append(round(noise, 3))
    assert noises[0] != noises[1]  # per-group keys -> independent draws


def test_funnel_regex_matches_and_error_aborts(spark, tmp_path):
    """view->click->purchase converts; view->ERROR->purchase does not;
    a >30-min gap splits the session so the pattern cannot span it."""
    rows = [
        # user 1, one session: v c p => converted
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 10:01:00", 1, "click", 1.0, "{}"),
        (3, "2024-01-01 10:02:00", 1, "purchase", 1.0, "{}"),
        # user 2, one session: v e p => error aborts the funnel
        (4, "2024-01-01 10:00:00", 2, "view", 1.0, "{}"),
        (5, "2024-01-01 10:01:00", 2, "error", 1.0, "{}"),
        (6, "2024-01-01 10:02:00", 2, "purchase", 1.0, "{}"),
        # user 3: view, then purchase 31 min later => session split, no match
        (7, "2024-01-01 10:00:00", 3, "view", 1.0, "{}"),
        (8, "2024-01-01 10:31:00", 3, "purchase", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = load_catalog()["seq_pattern_funnel"].fn(spark, str(tmp_path)).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert [(r["seq"], r["funnel_hit"], r["converted"]) for r in by_user[1]] == [
        ("vcp", "vcp", 1)
    ]
    assert [(r["seq"], r["funnel_hit"], r["converted"]) for r in by_user[2]] == [
        ("vep", "", 0)
    ]
    assert [(r["sid"], r["seq"], r["converted"]) for r in by_user[3]] == [
        (1, "v", 0),
        (2, "p", 0),
    ]


def test_hll_estimate_tracks_exact_and_merges(spark, sf_dir):
    """Portable HLL: every group's estimate within 25% of exact (m=256
    => ~6.5% standard error), and the '__all__' merged row covers the
    union (exact side: event_ids are globally unique)."""
    rows = load_catalog()["sketch_hll_portable"].fn(spark, sf_dir).collect()
    by_type = {r["event_type"]: r for r in rows}
    assert "__all__" in by_type
    per_type_sum = sum(
        r["n_exact"] for t, r in by_type.items() if t != "__all__"
    )
    assert by_type["__all__"]["n_exact"] == per_type_sum
    for t, r in by_type.items():
        rel_err = abs(r["hll_est"] - r["n_exact"]) / r["n_exact"]
        assert rel_err < 0.25, (t, r)


def test_weighted_median_follows_units_not_rows(spark, tmp_path):
    """One heavy line (qty 10) must pull the weighted median to its
    price even though the row-median of prices is lower."""
    order_parts = []  # reuse lineitem writer with explicit quantities
    rows = [
        # flag A: prices 1,2 at qty 1; price 3 at qty 10 -> median 3.0
        (1, 1, 1, 0, 1.0, 1.0, 0.0, 0.0, "A", "O", "1995-01-01"),
        (1, 2, 1, 1, 1.0, 2.0, 0.0, 0.0, "A", "O", "1995-01-01"),
        (1, 3, 1, 2, 10.0, 3.0, 0.0, 0.0, "A", "O", "1995-01-01"),
        # flag B: equal weights -> lower-median convention picks 5.0
        (2, 4, 1, 0, 1.0, 5.0, 0.0, 0.0, "B", "O", "1995-01-01"),
        (2, 5, 1, 1, 1.0, 6.0, 0.0, 0.0, "B", "O", "1995-01-01"),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/lineitem.parquet")
    got = {
        r["l_returnflag"]: (r["weighted_median"], r["total_weight"])
        for r in load_catalog()["weighted_median_price"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {"A": (3.0, 12), "B": (5.0, 2)}


def test_islands_split_on_calendar_gaps(spark, tmp_path):
    """Consecutive days merge into one island; a single missing day
    splits; duplicate events on one day count once."""
    rows = [
        (1, "2024-01-01 09:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 17:00:00", 1, "click", 1.0, "{}"),  # same day
        (3, "2024-01-02 09:00:00", 1, "view", 1.0, "{}"),
        (4, "2024-01-03 09:00:00", 1, "view", 1.0, "{}"),
        # Jan 4 missing -> island break
        (5, "2024-01-05 09:00:00", 1, "view", 1.0, "{}"),
        (6, "2024-03-01 09:00:00", 2, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    got = [
        (r["user_id"], str(r["start_day"]), str(r["end_day"]), r["n_days"])
        for r in load_catalog()["user_activity_islands"].fn(spark, str(tmp_path)).collect()
    ]
    assert got == [
        (1, "2024-01-01", "2024-01-03", 3),
        (1, "2024-01-05", "2024-01-05", 1),
        (2, "2024-03-01", "2024-03-01", 1),
    ]


# stream_static_enrich is value-certified by its DuckDB oracle (parity)
# and by tests/test_streaming.py::test_stream_static_enrichment_equals_batch,
# which compares the drained stream against the batch join on real data.


def test_ndcg_perfect_ordering_is_one_and_inversion_penalized(spark, tmp_path):
    """A user whose value-ranking matches relevance exactly scores
    ndcg=1; the same relevance multiset ranked WORST scores the
    hand-computed minimum; an all-zero-relevance user scores 0."""
    rows = [
        # user 2 (cohort irrelevant here): perfect order p > c > v
        (1, "2024-01-01 00:00:00", 2, "purchase", 30.0, "{}"),
        (2, "2024-01-01 00:00:00", 2, "click", 20.0, "{}"),
        (3, "2024-01-01 00:00:00", 2, "view", 10.0, "{}"),
        # user 3: worst order v > c > p
        (4, "2024-01-01 00:00:00", 3, "view", 30.0, "{}"),
        (5, "2024-01-01 00:00:00", 3, "click", 20.0, "{}"),
        (6, "2024-01-01 00:00:00", 3, "purchase", 10.0, "{}"),
        # user 4: nothing relevant
        (7, "2024-01-01 00:00:00", 4, "error", 30.0, "{}"),
        (8, "2024-01-01 00:00:00", 4, "signup", 20.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: r
        for r in load_catalog()["eval_ndcg_at_k"].fn(spark, str(tmp_path)).collect()
    }
    assert got[2]["ndcg"] == 1.0
    disc = [1 / math.log2(i + 1) for i in range(1, 4)]
    dcg_worst = 1 * disc[0] + 3 * disc[1] + 7 * disc[2]
    idcg = 7 * disc[0] + 3 * disc[1] + 1 * disc[2]
    assert got[3]["ndcg"] == round(dcg_worst / idcg, 6)
    assert got[3]["ndcg"] < 1.0
    assert got[4]["ndcg"] == 0.0 and got[4]["idcg"] == 0.0


def test_calibration_bins_recover_planted_rates(spark, tmp_path):
    """Events planted so one bin is perfectly calibrated (frac_pos ==
    mean_p within the bin) and another is maximally miscalibrated
    (high p, zero positives) with the Brier gap to prove it."""
    # value=35 -> p=0.5 exactly (bin 5); 2 of 4 are purchases
    rows = [
        (1, "2024-01-01 00:00:00", 1, "purchase", 35.0, "{}"),
        (2, "2024-01-01 00:00:00", 1, "purchase", 35.0, "{}"),
        (3, "2024-01-01 00:00:00", 1, "view", 35.0, "{}"),
        (4, "2024-01-01 00:00:00", 1, "view", 35.0, "{}"),
        # value=95 -> p=sigmoid(3)=0.952574 (bin 9); zero purchases
        (5, "2024-01-01 00:00:00", 2, "view", 95.0, "{}"),
        (6, "2024-01-01 00:00:00", 2, "view", 95.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        r["bin"]: r
        for r in load_catalog()["eval_calibration_bins"].fn(spark, str(tmp_path)).collect()
    }
    assert set(got) == {5, 9}
    b5 = got[5]
    assert (b5["n"], b5["mean_p"], b5["frac_pos"]) == (4, 0.5, 0.5)
    assert b5["brier"] == 0.25  # (0.5-y)^2 = 0.25 for every row
    b9 = got[9]
    p9 = round(1 / (1 + math.exp(-3.0)), 6)
    assert (b9["n"], b9["mean_p"], b9["frac_pos"]) == (2, p9, 0.0)
    assert b9["brier"] == round(p9 * p9, 6)  # confident and wrong


def test_degree_powerlaw_star_graph(spark, tmp_path):
    """A 5-leaf star (every edge at support 2): hub degree 5, leaves
    degree 1, Hill tail holds exactly the hub."""
    # edges hub(0)-leaf(i): two orders each containing {0, i}
    order_parts = []
    ok = 1
    for leaf in range(1, 6):
        order_parts += [(ok, [0, leaf]), (ok + 1, [0, leaf])]
        ok += 2
    _write_lineitem(spark, tmp_path, order_parts)
    row = load_catalog()["graph_degree_powerlaw"].fn(spark, str(tmp_path)).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["max_degree"], row["n_tail"]) == (
        6, 5, 5, 1
    )
    assert row["alpha_hill"] == round(1 + 1 / round(math.log(5 / 1.5), 9), 4)


def test_vocab_overlap_identical_and_disjoint_sources(spark, tmp_path):
    """Identical token sets give Jaccard 1.0; disjoint sets give 0."""
    rows = [
        (1, "x y", "en", "srcA", 3),
        (2, "y x x", "en", "srcB", 5),
        (3, "z", "en", "srcC", 1),
    ]
    _write_docs(spark, tmp_path, rows)
    got = {
        (r["source_a"], r["source_b"]): (r["n_inter"], r["jaccard"])
        for r in load_catalog()["source_vocab_overlap"].fn(spark, str(tmp_path)).collect()
    }
    assert got[("srcA", "srcB")] == (2, 1.0)
    assert ("srcA", "srcC") not in got  # zero intersection -> no pair row


def test_quantile_normalize_aligns_group_marginals(spark, tmp_path):
    """After normalization, a low-scale and a high-scale group map onto
    the SAME global quantile values — their marginals coincide."""
    rows = [
        (1, 1, "O", 1.0, "1995-01-01", "U"),
        (2, 1, "O", 2.0, "1995-01-01", "U"),
        (3, 1, "O", 3.0, "1995-01-01", "U"),
        (4, 1, "O", 100.0, "1995-01-01", "V"),
        (5, 1, "O", 200.0, "1995-01-01", "V"),
        (6, 1, "O", 300.0, "1995-01-01", "V"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    out = load_catalog()["quantile_normalize_groups"].fn(spark, str(tmp_path)).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r["normalized_price"])
    assert sorted(by_grp["U"]) == sorted(by_grp["V"])  # aligned marginals
    # rank order within each group is preserved
    u = {r["price"]: r["normalized_price"] for r in out if r["grp"] == "U"}
    assert u[1.0] < u[2.0] < u[3.0]


def test_bootstrap_ci_brackets_true_mean_and_is_deterministic(spark, tmp_path):
    """Planted tight distribution: the CI must bracket the true mean,
    stay narrow, and reproduce exactly across runs (seeded draws)."""
    rows = [
        (i, 1, "O", 100.0 + (i % 5), "1995-01-01", "P1") for i in range(200)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    fn = load_catalog()["bootstrap_mean_ci"].fn
    r1 = fn(spark, str(tmp_path)).collect()
    r2 = fn(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
    row = r1[0]
    true_mean = sum(100.0 + (i % 5) for i in range(200)) / 200
    assert row["ci_lo"] <= true_mean <= row["ci_hi"]
    assert row["ci_hi"] - row["ci_lo"] < 1.0  # sd~1.4, n=200 -> tight CI


def test_decay_weights_recent_revenue_more(spark, tmp_path):
    """Same total spend: the customer whose orders are recent must
    outscore the one whose orders are years old."""
    rows = [
        # anchor order fixes max(o_orderdate)
        (1, 1, "O", 1000.0, "2000-01-01", "P1"),
        # customer 2: same 1000 but 3 years before the anchor
        (2, 2, "O", 1000.0, "1997-01-01", "P1"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    got = {
        r["o_custkey"]: r["decayed_revenue"]
        for r in load_catalog()["decay_weighted_revenue"].fn(spark, str(tmp_path)).collect()
    }
    assert got[1] == 1000.0  # zero age -> weight exactly 1
    import datetime

    age = (datetime.date(2000, 1, 1) - datetime.date(1997, 1, 1)).days
    assert got[2] == round(round(1000.0 * math.exp(-age / 180.0), 6), 2)
    assert got[2] < got[1]


def test_minplus_strong_ties_beat_direct_weak_edge(spark, tmp_path):
    """Triangle 1-2-3 where the direct 1-3 edge is weak (support 2,
    cost 99) but the 1-2-3 path is strong (support 50 each, cost 51+51
    = 102 > 99? no — make supports high enough that 2 hops win)."""
    order_parts = []
    ok = 1
    # edge 1-2 and 2-3: support 70 each -> cost 31 each, path = 62
    for _ in range(70):
        order_parts += [(ok, [1, 2]), (ok + 1, [2, 3])]
        ok += 2
    # direct edge 1-3: support 2 -> cost 99
    order_parts += [(ok, [1, 3]), (ok + 1, [1, 3])]
    _write_lineitem(spark, tmp_path, order_parts)
    got = {
        r["node"]: r["dist"]
        for r in load_catalog()["graph_minplus_distance"].fn(spark, str(tmp_path)).collect()
    }
    assert got[1] == 0
    assert got[2] == 31  # 101 - min(70,100)
    assert got[3] == 62  # 2-hop strong path beats the 99-cost direct edge


def test_xcorr_perfect_lag_alignment(spark, tmp_path):
    """Purchases exactly mirror views shifted by 2 days: corr at lag 2
    must be 1.0 and corr at lag 0 must be below it."""
    rows = []
    eid = 1
    # views ramp 1,2,...,10 on days 1..10; purchases same ramp days 3..12
    for day in range(1, 11):
        for _ in range(day):
            rows.append((eid, f"2024-01-{day:02d} 08:00:00", 1, "view", 1.0, "{}"))
            eid += 1
    for day in range(3, 13):
        for _ in range(day - 2):
            rows.append((eid, f"2024-01-{day:02d} 09:00:00", 1, "purchase", 1.0, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows)
    got = {
        r["lag"]: r["xcorr"]
        for r in load_catalog()["xcorr_daily_lags"].fn(spark, str(tmp_path)).collect()
    }
    assert got[2] == 1.0
    assert got[0] < 1.0


def test_position_attribution_u_shape(spark, tmp_path):
    """4-touch journey view,click,signup,view before purchase: ends get
    0.4 each, middles 0.1 each -> view 0.8 (both ends), rest 0.1."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 10:01:00", 1, "click", 1.0, "{}"),
        (3, "2024-01-01 10:02:00", 1, "signup", 1.0, "{}"),
        (4, "2024-01-01 10:03:00", 1, "view", 1.0, "{}"),
        (5, "2024-01-01 10:04:00", 1, "purchase", 1.0, "{}"),
        # post-conversion touches earn nothing
        (6, "2024-01-01 10:05:00", 1, "click", 1.0, "{}"),
        # single-touch journey: 100% to error? no — errors count as touches
        (7, "2024-01-02 10:00:00", 2, "error", 1.0, "{}"),
        (8, "2024-01-02 10:01:00", 2, "purchase", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        r["event_type"]: r["total_credit"]
        for r in load_catalog()["attribution_position_based"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {"view": 0.8, "click": 0.1, "signup": 0.1, "error": 1.0}


def test_bollinger_flags_spike_only(spark, tmp_path):
    """Flat revenue never breaks the band; a 10x single-day spike does."""
    rows = []
    ok = 1
    for day in range(1, 15):
        price = 1000.0 if day != 10 else 10000.0
        rows.append((ok, 1, "O", price, f"1995-01-{day:02d}", "P1"))
        ok += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    out = load_catalog()["rolling_bollinger_bands"].fn(spark, str(tmp_path)).collect()
    breaks = [str(r["day"]) for r in out if r["is_break"] == 1]
    assert breaks == ["1995-01-10"]  # only the spike day breaks the band
    flat = [r for r in out if str(r["day"]) == "1995-01-05"][0]
    assert flat["ma"] == 1000.0 and flat["upper_band"] == 1000.0  # sd=0 window


def test_seasonality_index_is_one_when_flat(spark, tmp_path):
    """Identical order values on every weekday give seasonal_index 1.0
    for all seven rows."""
    rows = [
        (i, 1, "O", 500.0, f"1995-01-{i:02d}", "P1") for i in range(1, 29)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    out = load_catalog()["seasonality_dow_profile"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 7
    assert all(r["seasonal_index"] == 1.0 for r in out)
    assert sorted(r["dow"] for r in out) == [1, 2, 3, 4, 5, 6, 7]


def _write_embeddings(spark, path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def test_label_centroids_exact_mean(spark, tmp_path):
    """Two vectors per label: every centroid component is the exact
    midpoint, across all 64 dims."""
    base = [0.5] * 64
    high = [1.5] * 64
    rows = [(1, base, 0), (2, high, 0), (3, base, 1), (4, base, 1)]
    _write_embeddings(spark, tmp_path, rows)
    out = load_catalog()["embedding_label_centroids"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 128  # 2 labels x 64 dims
    for r in out:
        assert r["n"] == 2
        assert r["centroid"] == (1.0 if r["label"] == 0 else 0.5)


def test_label_noise_flags_planted_mislabel(spark, tmp_path):
    """Six near-identical vectors, one labeled differently: only the
    odd one out is flagged, with a unanimous 5-vote majority."""
    def vec(eps):
        return [1.0 + eps] + [0.25] * 63

    rows = [(i, vec(0.001 * i), 1) for i in range(5)] + [(99, vec(0.006), 2)]
    # a far-away, consistently-labeled pair must NOT be flagged (the
    # big negative lead component lands it in a different LSH bucket)
    rows += [(200, [-9.0] + [0.1] * 63, 3), (201, [-9.0] + [0.1] * 63, 3)]
    _write_embeddings(spark, tmp_path, rows)
    out = load_catalog()["label_noise_knn_audit"].fn(spark, str(tmp_path)).collect()
    assert [(r["vec_id"], r["label"], r["majority_label"], r["n_votes"]) for r in out] == [
        (99, 2, 1, 5)
    ]


def test_km_survival_handles_censoring(spark, tmp_path):
    """4 customers: two repurchase at t=10, one at t=20, one censored at
    t=15. KM: S(10) = 1 - 2/4 = 0.5; at t=20 risk set is 1 (censored
    customer left at 15), S(20) = 0.5 * (1 - 1/1) -> excluded (d=n),
    so the curve ends at t=10. A naive uncensored mean would differ."""
    rows = [
        # customer 1 & 2: first 1995-01-01, second 1995-01-11 (t=10)
        (1, 1, "O", 10.0, "1995-01-01", "P"),
        (2, 1, "O", 10.0, "1995-01-11", "P"),
        (3, 2, "O", 10.0, "1995-01-01", "P"),
        (4, 2, "O", 10.0, "1995-01-11", "P"),
        # customer 3: first 1995-01-01, second 1995-01-21 (t=20)
        (5, 3, "O", 10.0, "1995-01-01", "P"),
        (6, 3, "O", 10.0, "1995-01-21", "P"),
        # customer 4: one order 1995-01-06; censored at horizon
        # (1995-01-21), duration 15, no event
        (7, 4, "O", 10.0, "1995-01-06", "P"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    out = load_catalog()["survival_repurchase_curve"].fn(spark, str(tmp_path)).collect()
    assert [(r["t_days"], r["n_risk"], r["d_events"], r["survival"]) for r in out] == [
        (10, 4, 2, 0.5)
    ]


def test_holt_tracks_linear_trend_exactly_in_the_limit(spark, tmp_path):
    """A perfectly linear monthly series: Holt's level converges to the
    last value and trend to the slope, so forecasts continue the line."""
    rows = []
    for i in range(24):
        y, mth = divmod(i, 12)
        rows.append(
            (i, 1, "O", 1000.0 + 100.0 * i, f"{1995 + y}-{mth + 1:02d}-15", "P")
        )
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    out = load_catalog()["holt_linear_forecast"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 6
    by_h = {r["h"]: r for r in out}
    last = 1000.0 + 100.0 * 23
    # after 24 points of a pure line, level ~ last value, trend ~ slope
    assert abs(by_h[1]["level"] - last) < 20.0
    assert abs(by_h[1]["trend"] - 100.0) < 10.0
    # forecasts increase by ~trend per step
    assert by_h[6]["forecast"] > by_h[1]["forecast"]
    step = by_h[2]["forecast"] - by_h[1]["forecast"]
    assert abs(step - by_h[1]["trend"]) < 0.02


def test_mann_kendall_detects_monotone_trend(spark, tmp_path):
    """A strictly increasing monthly series: S = n(n-1)/2 (every pair
    concordant), positive z, Sen slope = the planted step."""
    rows = []
    for i in range(12):
        rows.append((i, 1, "O", 1000.0 + 50.0 * i, f"1995-{i + 1:02d}-15", "P"))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    row = load_catalog()["trend_mann_kendall"].fn(spark, str(tmp_path)).collect()[0]
    n = 12
    assert row["n_months"] == n
    assert row["s_stat"] == n * (n - 1) // 2  # all pairs concordant
    assert row["var18_num"] == n * (n - 1) * (2 * n + 5)
    assert row["z_stat"] > 3.0  # decisively significant
    assert row["sen_slope"] == 50.0  # every pairwise slope is the step


def test_fd_discovery_key_holds_and_planted_violation(spark, tmp_path):
    """The key column determines everything; a planted duplicate name
    mapping to two custkeys breaks name->custkey but nothing else new."""
    rows = [
        (1, "Alice", 10, 5.0, "SEG_A"),
        (2, "Bob", 10, 6.0, "SEG_A"),
        (3, "Alice", 20, 7.0, "SEG_B"),  # Alice -> {1, 3}: FD violated
    ]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    got = {
        r["fd"]: (r["n_violating"], r["holds"])
        for r in load_catalog()["fd_discovery_profile"].fn(spark, str(tmp_path)).collect()
    }
    assert len(got) == 20
    # the key determines every other column
    for rhs in ("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"):
        assert got[f"c_custkey->{rhs}"] == (0, 1)
    # planted: Alice maps to two custkeys and two nations
    assert got["c_name->c_custkey"] == (1, 0)
    assert got["c_name->c_nationkey"] == (1, 0)
    # nationkey 10 -> one segment, 20 -> one segment: FD holds here
    assert got["c_nationkey->c_mktsegment"] == (0, 1)


def test_l_diversity_flags_homogeneous_class(spark, tmp_path):
    """A large-but-homogeneous QI class (k-anonymous, all one segment)
    must be flagged; a small diverse class must pass."""
    rows = [(i, f"C{i}", 10, 0.0, "SEG_A") for i in range(20)]  # nation 10: 20 rows, 1 segment
    rows += [(100, "X", 20, 0.0, "SEG_A"), (101, "Y", 20, 0.0, "SEG_B"),
             (102, "Z", 20, 0.0, "SEG_C")]  # nation 20: 3 rows, 3 segments
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    got = {
        r["c_nationkey"]: (r["group_size"], r["n_sensitive"], r["at_risk"])
        for r in load_catalog()["l_diversity_audit"].fn(spark, str(tmp_path)).collect()
    }
    assert got[10] == (20, 1, True)  # big but homogeneous -> leak
    assert got[20] == (3, 3, False)  # small but diverse -> safe here


def test_peak_concurrency_counts_overlap_and_touching(spark, tmp_path):
    """Three users: two fully overlapping sessions plus one that starts
    exactly when another ends — pinned tie order counts the touching
    pair as concurrent, so the peak is 3."""
    rows = [
        # user 1: session 10:00-10:10
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 10:10:00", 1, "click", 1.0, "{}"),
        # user 2: session 10:05-10:15 (overlaps user 1)
        (3, "2024-01-01 10:05:00", 2, "view", 1.0, "{}"),
        (4, "2024-01-01 10:15:00", 2, "click", 1.0, "{}"),
        # user 3: session starting exactly at user 1's end
        (5, "2024-01-01 10:10:00", 3, "view", 1.0, "{}"),
        (6, "2024-01-01 10:12:00", 3, "click", 1.0, "{}"),
        # next day: one lone session -> peak 1
        (7, "2024-01-02 09:00:00", 1, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        str(r["day"]): (r["peak_concurrent"], r["n_ticks"])
        for r in load_catalog()["events_peak_concurrency"].fn(spark, str(tmp_path)).collect()
    }
    assert got["2024-01-01"] == (3, 6)
    assert got["2024-01-02"] == (1, 2)


def test_share_of_parent_sums_to_one(spark, sf_dir):
    """Within every region the nation shares sum to 1, and the total
    shares sum to 1 across all rows (up to rounding)."""
    out = load_catalog()["share_of_parent_rollup"].fn(spark, sf_dir).collect()
    assert len(out) == 25
    by_region = {}
    for r in out:
        by_region.setdefault(r["region"], []).append(r["share_of_region"])
    for region, shares in by_region.items():
        assert abs(sum(shares) - 1.0) < 1e-4, region
    assert abs(sum(r["share_of_total"] for r in out) - 1.0) < 1e-4


def test_ndcg_ideal_set_includes_items_below_cutoff(spark, tmp_path):
    """A purchase ranked 11th (outside the top-10) must raise IDCG and
    drag nDCG below 1 even though the retrieved top-10 is ordered
    perfectly among themselves."""
    rows = [
        (i, "2024-01-01 00:00:00", 2, "view", 100.0 - i, "{}")
        for i in range(10)  # ranks 1..10: all views (gain 1)
    ]
    rows.append((99, "2024-01-01 00:00:00", 2, "purchase", 1.0, "{}"))  # rank 11
    _write_events(spark, tmp_path, rows)
    row = load_catalog()["eval_ndcg_at_k"].fn(spark, str(tmp_path)).collect()[0]
    disc = [1 / math.log2(i + 1) for i in range(1, 11)]
    dcg = sum(1 * d for d in disc)  # ten views retrieved
    idcg = 7 * disc[0] + sum(1 * d for d in disc[1:])  # ideal: purchase first
    assert row["n_ranked"] == 10
    assert row["ndcg"] == round(round(dcg, 6) / round(idcg, 6), 6) or row["ndcg"] == round(dcg / idcg, 6)
    assert row["ndcg"] < 1.0
