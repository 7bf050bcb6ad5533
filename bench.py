"""Benchmark runner — the driver's per-round perf gate.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on a
warm SparkSession and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (BASELINE.md): warm session, actions only (JVM startup and
first-touch parquet footer reads excluded via a warm-up pass), median of
N_RUNS per query. `value` is the summed median latency of the two
mart-analog queries — directly comparable to the DuckDB oracle baseline
(0.078 + 0.293 s at sf0.1); per-query medians for the wider headline
set ride along under "queries".
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from jaffle_shop_classic_spark.operators.catalog import load_catalog
from jaffle_shop_classic_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = 5
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# the two queries the baseline measures, then representative extensions
BASELINE_QUERIES = ["jaffle_customers", "jaffle_orders"]
HEADLINE_QUERIES = BASELINE_QUERIES + [
    "tpch_q1_style",
    "topk_per_group",
    "window_running_sum",
    "session_window_batch",
    "tumbling_window",
    "json_extract",
    "text_word_freq_topk",
    "dedup_exact",
    "dedup_minhash_fast_pairs",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "sim_ivf_multiprobe_topk",
    "pipeline_corpus_curation",
    "dedup_cluster_components",
    "kmeans_lloyd",
    "range_join_bucketed",
    "text_tfidf_topk",
    "embedding_quantize_int8",
    "text_lm_score",
    "text_boilerplate_shingles",
    "dedup_duplicate_ngram_spans",
    # round-5 additions
    "scd2_user_state_history",
    "zorder_orders_layout",
    "text_inverted_index",
    "text_pmi_collocations",
    # round-6 additions
    "embedding_pq_encode",
    "sim_pq_adc_topk",
    "sim_ivfpq_topk",
    "curation_strip_dup_spans",
    "join_bloom_prefilter",
    "dedup_ngram_containment",
    "dedup_semantic_clusters",
    "text_heavy_hitters_mg",
    "graph_triangle_count",
    "tpch_q5_style",
    "dedup_jaccard_prefix_filter",
    "graph_pagerank",
    "graph_label_propagation",
    "cdc_upsert_with_deletes",
    # round-7 additions
    "fuzzy_join_levenshtein",
    "quality_lr_classifier",
    "sim_sparse_tfidf_pairs",
    "event_ewma_smoothing",
    "corpus_token_ids",
    "decimal_exact_pricing",
    "lang_nb_classifier",
    "cf_item_cosine",
    "events_ohlc_bars",
    "segment_sales_trend",
    "drift_psi_monitor",
    "embedding_jl_project",
    "rfm_customer_segments",
    "skyline_pareto_parts",
    "assoc_rules_lift",
    "benford_first_digit",
    "contrastive_hard_negatives",
    "entity_resolution_clusters",
    "dau_wau_rollup",
    "recommend_copurchase_topk",
    "feature_hashing",
    "dedup_incremental_lsh",
    "sketch_cms_frequencies",
    "graph_khop_reach",
    "eval_auc_mannwhitney",
    "dp_noisy_group_counts",
    "seq_pattern_funnel",
    "sketch_hll_portable",
    "weighted_median_price",
    "user_activity_islands",
    "eval_ndcg_at_k",
    "eval_calibration_bins",
    "graph_degree_powerlaw",
    "source_vocab_overlap",
    "quantile_normalize_groups",
    "bootstrap_mean_ci",
    "decay_weighted_revenue",
    "graph_minplus_distance",
    "xcorr_daily_lags",
    "attribution_position_based",
    "rolling_bollinger_bands",
    "seasonality_dow_profile",
    "embedding_label_centroids",
    "label_noise_knn_audit",
    "survival_repurchase_curve",
    "holt_linear_forecast",
    "trend_mann_kendall",
    "fd_discovery_profile",
    "l_diversity_audit",
    "events_peak_concurrency",
    "share_of_parent_rollup",
    # round-8 additions
    "sim_ann_recall_eval",
    "er_fellegi_sunter_em",
    "udtf_installment_plan",
    "eval_bleu_corpus",
    "dedup_url_canonical",
    "tpch_q21_style",
    "tpch_q17_style",
    "tpch_q8_style",
    # round-9 additions
    "ks_test_two_sample",
    "tpch_q22_style",
    "tpch_q11_style",
    "winsorize_group_clip",
    "data_mixture_weights",
    "graph_kcore_peel",
    "yaml_model_customers_mart",
    "cusum_revenue_shift",
    "text_rouge_l",
    "tpch_q19_style",
    "sim_binary_hamming_topk",
    "eval_spearman_corr",
    "keyset_pagination_page3",
    "source_kl_divergence",
    "sim_truncated_dim_recall",
    "graph_link_prediction_jaccard",
]

# Round-10 (VERDICT item 2): the bench set is DERIVED from the catalog,
# not a hand list — every registered query gets a recorded timing unless
# it appears here with a reason. A new operator therefore cannot
# silently escape timing by not being added to HEADLINE_QUERIES.
# name -> reason string, emitted into BENCH_FULL.json under "skipped".
SKIP_QUERIES: dict[str, str] = {}


def tail_queries(catalog) -> list[str]:
    """Catalog entries outside the curated headline set and the skip
    list — timed with the lighter tail protocol (one excluded warm-up
    run, then single-shot for the cheap tail / median-of-3 for heavy)."""
    headline = set(HEADLINE_QUERIES)
    return [
        n for n in catalog
        if n not in headline and n not in SKIP_QUERIES
    ]


def time_query(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    # count() forces the full plan but keeps result transfer out of the
    # measurement (the driver-side collect is not the engine's cost)
    fn(spark, sf_dir).count()
    return time.perf_counter() - t0


# Per-query budget for the DuckDB twin timing loop: a handful of
# oracles are deliberately expensive at sf0.1 (unrolled iterative CTEs,
# recursive-closure twins that replay a whole fixpoint in SQL) — a
# timer thread interrupts any single oracle run at the budget so one
# pathological twin cannot stall the round's bench, and once the budget
# is spent the remaining reps are skipped (single-shot timing).
ORACLE_BUDGET_SEC = 15.0


def time_oracle(con, sql: str) -> float | None:
    """One timed oracle run, hard-capped at ORACLE_BUDGET_SEC via
    duckdb's interrupt API; returns None when the run was cut off
    (recorded as 'no twin timing', not a bogus number)."""
    timer = threading.Timer(ORACLE_BUDGET_SEC, con.interrupt)
    t0 = time.perf_counter()
    timer.start()
    try:
        con.execute(sql).fetchall()
        return time.perf_counter() - t0
    except duckdb.InterruptException:
        return None
    finally:
        timer.cancel()


def time_pair(spec, spark, con, n: int) -> tuple[float, float | None]:
    """Interleave n Spark runs with n DuckDB-oracle runs in THIS process
    (the load-immune discipline gate_with_ratio established for the two
    marts, round 12: extended catalog-wide per the round-11 verdict).
    Same loop iteration ⇒ host load inflates both engines alike, so the
    per-query ratio survives a loaded driver machine. Returns
    (spark_median, duck_median | None)."""
    s_runs: list[float] = []
    d_runs: list[float] = []
    d_spent = 0.0
    d_dead = spec.oracle is None
    for _ in range(n):
        s_runs.append(time_query(spec.fn, spark, SF_DIR))
        if not d_dead and d_spent < ORACLE_BUDGET_SEC:
            d = time_oracle(con, spec.oracle)
            if d is None:  # interrupted at the budget — stop trying
                d_dead = True
            else:
                d_runs.append(d)
                d_spent += d
    duck = round(statistics.median(d_runs), 4) if d_runs else None
    return round(statistics.median(s_runs), 4), duck


def gate_with_ratio(catalog, spark) -> tuple[dict[str, float], float]:
    """Time the two gate queries AND their DuckDB oracles interleaved in
    THIS process, same loop iteration — so host load (the driver machine
    runs its own Spark work around the bench) inflates numerator and
    denominator alike. The returned ratio spark_total/duckdb_total is
    the load-immune gate signal: BENCH_r08 recorded the marts at ~4x the
    quiet-machine absolute seconds while the catalog-wide median moved
    only 1.07x — absolute seconds under driver load confound the
    engine's speed with the host's. Absolute medians still ride along as
    `value` for cross-round history."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    # warm both engines on the gate queries (JIT / buffer caches)
    for name in BASELINE_QUERIES:
        catalog[name].fn(spark, SF_DIR).count()
        con.execute(catalog[name].oracle).fetchall()
    spark_runs: dict[str, list[float]] = {q: [] for q in BASELINE_QUERIES}
    duck_runs: dict[str, list[float]] = {q: [] for q in BASELINE_QUERIES}
    for _ in range(11):
        for name in BASELINE_QUERIES:
            spark_runs[name].append(time_query(catalog[name].fn, spark, SF_DIR))
            t0 = time.perf_counter()
            con.execute(catalog[name].oracle).fetchall()
            duck_runs[name].append(time.perf_counter() - t0)
    timings = {q: round(statistics.median(spark_runs[q]), 4) for q in BASELINE_QUERIES}
    ducks = {q: round(statistics.median(duck_runs[q]), 4) for q in BASELINE_QUERIES}
    duck_total = sum(ducks.values())
    ratio = round(sum(timings.values()) / duck_total, 4)
    return timings, ducks, ratio


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Bench-scale tuning (sf<=0.1: shuffles are single-digit MB):
    # - 8 shuffle partitions — more just add scheduler rounds
    # - AQE off — its per-stage re-planning round trips cost ~0.1s/query
    #   here and buy nothing under ~GB inputs; at cluster scale AQE goes
    #   back ON (session.py default) where skew/coalescing dominate.
    # Measured on jaffle_customers: 0.49s (AQE+sp16) -> 0.32s (off+sp8).
    spark = get_spark("bench", shuffle_partitions=8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    catalog = load_catalog()

    # three full warm-up passes over every query BEFORE any timing: JIT
    # compilation of the codegen'd stages dominates early runs (measured
    # ~0.45s -> ~0.33s for the same query within one session), and a
    # per-query warm-up right before its own timing loop still charges
    # the first queries for shared JIT work
    for _ in range(3):
        for name in HEADLINE_QUERIES:
            catalog[name].fn(spark, SF_DIR).count()

    # gate queries: interleaved Spark/DuckDB tournament (load-immune
    # ratio + absolute medians in one pass)
    timings, gate_ducks, value_ratio = gate_with_ratio(catalog, spark)
    # DuckDB connection for the catalog-wide twin timings (round-11
    # verdict item 5: the 2x target was only verifiable on the two
    # marts; now every oracle-backed entry records spark/duck medians
    # from the same interleaved in-process loop)
    duck_timings: dict[str, float | None] = dict(gate_ducks)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    for name in HEADLINE_QUERIES:
        if name in BASELINE_QUERIES:
            continue
        spec = catalog[name]
        # The first (post-global-warm-up) run only classifies the query
        # and is EXCLUDED from the median: C2 JIT compilation of this
        # query's own codegen'd stages keeps run 1 (and often runs 2-4)
        # 1.5-2x slower than steady state (measured: curation converges
        # 2.0s -> 0.95s over ~5 runs), and charging that to the median
        # misreports the engine's warm throughput, which is what
        # BASELINE.md's warm-median DuckDB numbers measure.
        first = time_query(spec.fn, spark, SF_DIR)
        # heavy queries (multi-second) get median-of-3; the rest
        # median-of-5 (host-level scheduling noise at this machine
        # swings single runs +/-50%)
        n = 3 if first > 2.0 else N_RUNS
        timings[name], duck_timings[name] = time_pair(spec, spark, con, n)

    # catalog-derived tail: every remaining registered query gets a
    # recorded timing. Lighter protocol than the headline set (the tail
    # is a coverage floor, not the cross-round comparison surface): one
    # warm-up run classifies the query and pays its JIT, then heavy
    # queries get median-of-3 and the cheap tail a single timed run —
    # sub-second single shots carry +/-20-25% noise (BASELINE.md), which
    # is fine for "is anything pathologically slow" screening.
    for name in tail_queries(catalog):
        spec = catalog[name]
        try:
            first = time_query(spec.fn, spark, SF_DIR)
            n = 3 if first > 1.0 else 1
            timings[name], duck_timings[name] = time_pair(spec, spark, con, n)
        except Exception as exc:  # a tail failure must not kill the gate
            timings[name] = None
            SKIP_QUERIES[name] = f"failed at bench SF: {type(exc).__name__}: {exc}"

    value = round(sum(timings[q] for q in BASELINE_QUERIES), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # catalog-wide per-query spark/duck ratios (round-11 verdict item 5).
    # Interpretation note for the >2x count: at this SF most entries sit
    # on Spark's fixed per-action floor (measured: range(1).count() =
    # 0.08-0.16 s, tools/ratio_scale.py) while their DuckDB twin runs in
    # single-digit ms, so the ratio measures fixed overhead, not
    # throughput — ratio_scale.json shows 11/12 worst-offender ratios
    # collapsing on 10x data (BASELINE.md table). The gate's load-immune
    # value_ratio (the two marts, real work both sides) stays the
    # headline signal.
    ratios = {
        q: round(timings[q] / duck_timings[q], 2)
        for q in duck_timings
        if duck_timings.get(q) and timings.get(q)
    }
    n_over_2x = sum(r > 2.0 for r in ratios.values())
    # Full per-query medians go to a repo file (diffable history); the
    # driver's stdout tail capture is ~2 KB, so stdout carries ONLY a
    # compact gate object as the FINAL line — the 94-query map overflowed
    # the capture in round 7 and the gate went unparsed (BENCH_r07.json
    # parsed: null).
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    with open(full_path, "w") as fh:
        json.dump(
            {
                "metric": "mart_analogs_total_sec",
                "value": value,
                "value_ratio": value_ratio,
                "unit": "sec",
                "sf": sf_val,
                "n_catalog": len(catalog),
                "n_timed": sum(v is not None for v in timings.values()),
                "n_oracle_timed": len(ratios),
                "n_over_2x": n_over_2x,
                "skipped": SKIP_QUERIES,
                "queries": timings,
                "duck": duck_timings,
                "ratios": ratios,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
        fh.write("\n")
    print(f"full per-query timings ({len(timings)} queries) -> {full_path}")
    print(
        json.dumps(
            {
                "metric": "mart_analogs_total_sec (jaffle_customers + jaffle_orders, "
                "median of 11 warm runs; value_ratio = spark/duckdb "
                "interleaved in-process, load-immune)",
                "value": value,
                "value_ratio": value_ratio,
                "unit": "sec",
                "queries": {q: timings[q] for q in BASELINE_QUERIES},
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
