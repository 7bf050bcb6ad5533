"""Regenerate COVERAGE.md's per-entry certification map.

For EVERY catalog entry this emits one row with its hard evidence:
  - the CORRECTNESS_r{N}.json rounds where the driver recorded it green
    (rows+schema+hash, err null), plus "window r{next}" if it currently
    sits in the gate window (so it is scheduled for the next record);
  - otherwise the NAMED certified class representative whose driver
    evidence covers the entry's operator class (same machinery, hard
    signal), chosen by name-family first, module fallback;
  - its local verification tier: every oracle-backed entry is
    value-hash-checked by tests/test_oracle_parity.py (sf0.001, CI) and
    tools/preflight.py (sf0.01, round end); rows-only entries name that
    they are covered by the engine-side value checks instead.

Usage: python tools/coverage_map.py   # rewrites the generated section
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN = "<!-- BEGIN GENERATED CERTIFICATION MAP (tools/coverage_map.py) -->"
END = "<!-- END GENERATED CERTIFICATION MAP -->"

# name-family -> the family's driver-certified representative(s); used
# only for entries with zero driver rounds of their own. Families are
# by shared machinery, not just shared prefix.
FAMILY_REPS = {
    "tpch_": ["tpch_q1_style", "tpch_q17_style", "tpch_q21_style", "tpch_q8_style"],
    "stream_": ["stream_left_outer_join", "stream_session_windows", "stream_chained_windows"],
    "dedup_minhash": ["dedup_minhash_lsh_pairs"],
    "dedup_": ["dedup_exact", "dedup_minhash_lsh_pairs", "dedup_cluster_components"],
    "sim_ivf": ["sim_ivf_topk"],
    "sim_pq": ["sim_ivf_topk"],
    "sim_": ["sim_cosine_topk", "sim_ann_recall_eval"],
    "text_": ["text_tfidf_topk", "quality_percentile_filter"],
    "tokenizer_": ["text_tfidf_topk"],
    "eval_": ["eval_ndcg_at_k", "eval_calibration_bins", "eval_bleu_corpus"],
    "graph_": ["graph_pagerank"],
    "sketch_": ["sketch_hll_portable", "distinct_exact_bitmap"],
    "sample_": ["train_test_split_hash"],
    "window_": ["topk_per_group", "window_range_frame"],
    "join_": ["join_semi"],
    "set_": ["set_except"],
    "filter_": ["filter_in_between"],
    "json_": ["json_schema_parse"],
    "mm_": ["mm_feature_extract"],
    "stg_": ["jaffle_customers", "stg_scalar_arith"],
    "test_": ["test_unique_violations", "test_relationships_violations"],
    "udf_": ["udf_apply_in_pandas"],
    "udtf_": ["udtf_installment_plan"],
    "source_": ["sink_manifest_roundtrip", "source_schema_evolution"],
    "attribution_": ["seq_pattern_funnel"],
    "quality_": ["quality_percentile_filter"],
    "embedding_": ["embedding_pq_encode", "sim_cosine_topk"],
    "events_": ["events_peak_concurrency"],
    "rollup_": ["rollup_flag_status"],
    "cube_": ["rollup_flag_status"],
    "grouping": ["rollup_flag_status"],
    "percentile_": ["percentile_exact"],
    "quantile": ["percentile_exact"],
    "pivot_": ["jaffle_orders"],
    "incremental_": ["incremental_orders_state"],
    "scd2_": ["scd2_user_state_history"],
    "cdc_": ["cdc_upsert_with_deletes"],
    "upsert_": ["cdc_upsert_with_deletes"],
}

# entries whose machinery is certified by a rep outside their name family
OVERRIDES = {
    # same daily-revenue rollup + exact-median + observation-sequence
    # window machinery as the windowed runs test; lagged self-join =
    # the certified xcorr shape
    "stats_ljung_box": ["stats_runs_test", "xcorr_daily_lags"],
    # identical doubled-integer rank substrate as the windowed KW entry
    "stats_dunn_posthoc": ["stats_kruskal_wallis"],
    # same jinja_lite render path as the windowed orders-file entry;
    # same mart algebra as the flagship customers mart
    "jinja_model_customers_mart": ["sql_model_orders_mart", "jaffle_customers"],
    # fof/first-occurrence token machinery = the windowed estimator +
    # tfidf token aggregates
    "vocab_heaps_law": ["vocab_unseen_estimate", "text_tfidf_topk"],
    # same term-frequency aggregate + windowed rank as the certified
    # token analytics; OLS runs on the vocabulary summary
    "vocab_zipf_fit": ["vocab_unseen_estimate", "text_tfidf_topk"],
    # two passes of the windowed BM25 probe around a broadcast feedback
    # model — same postings shuffle, same pruned-df broadcast
    "retrieval_rm3_expansion": ["retrieval_bm25_topk", "hybrid_retrieval_rrf"],
    # segment-keyed first-occurrence shuffle = exact dedup; rewrite =
    # the certified strip-dup-spans reassembly
    "curation_line_dedup": ["dedup_exact", "curation_strip_dup_spans"],
    "rank_bradley_terry": ["er_fellegi_sunter_em", "eval_calibration_bins"],
    "table_stats_profile": ["fd_discovery_profile", "distinct_exact_bitmap"],
    "ab_srm_check": ["train_test_split_hash", "ks_test_two_sample"],
    "graph_link_prediction_jaccard": ["graph_pagerank", "dedup_minhash_lsh_pairs"],
    "sim_truncated_dim_recall": ["sim_cosine_topk", "sim_ann_recall_eval"],
    "source_kl_divergence": ["text_tfidf_topk", "quality_percentile_filter"],
    # group-summary window algebra over the same per-nation z substrate
    # as the anomaly entries; the step-up rule runs on a 25-row frame
    "stats_fdr_bh": ["ks_test_two_sample", "trend_mann_kendall"],
    # same QI-class aggregate family as the certified release gates
    "t_closeness_audit": ["l_diversity_audit", "k_anonymity_audit"],
    # one-pass contingency aggregate + log-ratio scoring = the PMI /
    # chi-square screening machinery
    "feature_mi_audit": ["text_pmi_collocations", "chi2_feature_select"],
    # per-customer decimal aggregate + 1-row moment broadcast = the
    # certified experimentation substrate (arms via the SRM md5 bucket)
    "ab_cuped_adjustment": ["ab_srm_check", "bootstrap_mean_ci"],
    # same p6/label substrate as the windowed calibration entries;
    # tie-blocked cumsum = the certified AUC ranking machinery
    "eval_auprc": ["eval_calibration_bins", "eval_auc_mannwhitney"],
    # window cumsum + 1-row total broadcast = the certified split/
    # sampler machinery
    "sample_pps_systematic": ["train_test_split_hash", "sample_dsir_importance"],
    "train_test_split_temporal_purged": ["train_test_split_hash", "incremental_orders_state"],
    # group positive rates against a broadcast exact percentile = the
    # quality-gate aggregate shape
    "fairness_disparate_impact": ["quality_percentile_filter", "l_diversity_audit"],
    "keyset_pagination_page3": ["topk_per_group", "tpch_q11_style"],
    "sim_binary_hamming_topk": ["sim_cosine_topk", "sim_ivf_topk"],
    "eval_spearman_corr": ["trend_mann_kendall", "eval_calibration_bins"],
    "cusum_revenue_shift": ["trend_mann_kendall", "events_peak_concurrency"],
    "text_rouge_l": ["eval_bleu_corpus", "text_tfidf_topk"],
    "ks_test_two_sample": ["eval_calibration_bins", "trend_mann_kendall"],
    "winsorize_group_clip": ["percentile_exact"],
    "data_mixture_weights": ["train_test_split_hash", "quality_percentile_filter"],
    "graph_kcore_peel": ["graph_pagerank", "dedup_cluster_components"],
    "share_of_parent_rollup": ["rollup_flag_status", "jaffle_orders"],
    "train_test_split_by_source": ["train_test_split_hash"],
    "attribution_position_based": ["seq_pattern_funnel"],
    "attribution_last_touch": ["seq_pattern_funnel"],
    "agg_customer_orders": ["jaffle_customers"],
    "agg_over_join": ["jaffle_customers"],
    "approx_count_distinct": ["distinct_exact_bitmap"],
    "count_distinct_exact": ["distinct_exact_bitmap"],
    "array_explode_stats": ["array_vector_norm"],
    "map_ops": ["array_vector_norm"],
    "math_functions": ["tpch_q1_style"],
    "string_functions": ["dedup_url_canonical"],
    "date_functions": ["trend_mann_kendall"],
    "batch_length_bucketed": ["train_test_split_hash"],
    "pack_sequences": ["train_test_split_hash"],
    "shuffle_epoch_sample": ["train_test_split_hash"],
    "topk_orders": ["topk_per_group"],
    "tumbling_window": ["seq_pattern_funnel"],
    "sliding_window": ["seq_pattern_funnel"],
    "session_window_batch": ["seq_pattern_funnel"],
    "unpivot_amounts": ["jaffle_orders"],
    "distinct_pairs": ["dedup_exact"],
    "histogram_order_totals": ["percentile_exact"],
    "median_histogram_cdf": ["percentile_exact"],
    "gapfill_daily_orders": ["events_peak_concurrency"],
    "range_join_bucketed": ["asof_join_last_signup"],
    "fuzzy_join_levenshtein": ["label_noise_knn_audit"],
    "entity_resolution_clusters": ["dedup_cluster_components", "er_fellegi_sunter_em"],
    "er_fellegi_sunter_em": ["er_fellegi_sunter_em"],
    "kmeans_lloyd": ["dedup_semantic_clusters"],
    "pipeline_corpus_curation": ["dedup_exact", "dedup_minhash_lsh_pairs", "quality_percentile_filter"],
    "curation_strip_dup_spans": ["dedup_url_canonical", "dedup_minhash_lsh_pairs"],
    "decontam_ngram_overlap": ["dedup_minhash_lsh_pairs"],
    "pii_redact": ["dedup_url_canonical"],
    "hybrid_retrieval_rrf": ["sim_cosine_topk", "eval_ndcg_at_k"],
    "retrieval_bm25_topk": ["text_tfidf_topk", "eval_ndcg_at_k"],
    "dedup_winnowing_fingerprints": ["dedup_minhash_lsh_pairs", "dedup_substring_spans"],
    "embedding_pca_power": ["sim_cosine_topk", "graph_pagerank"],
    "vocab_unseen_estimate": ["text_tfidf_topk"],
    "vocab_id_assign": ["text_tfidf_topk"],
    "vocab_oov_rate": ["text_tfidf_topk"],
    "corpus_token_ids": ["text_tfidf_topk"],
    "feature_hashing": ["train_test_split_hash"],
    "target_encode_kfold": ["train_test_split_hash"],
    "util_surrogate_key": ["dedup_exact"],
    "audit_table_diff": ["cdc_upsert_with_deletes"],
    "check_source_freshness": ["incremental_orders_state"],
    "profile_orders_table": ["fd_discovery_profile"],
    "referential_integrity_profile": ["test_relationships_violations"],
    "gdpr_erase_users": ["test_relationships_violations"],
    "k_anonymity_audit": ["l_diversity_audit"],
    "dp_noisy_group_counts": ["l_diversity_audit"],
    "zorder_orders_layout": ["incremental_orders_state"],
    "impute_group_median": ["percentile_exact"],
    "skyline_pareto_parts": ["topk_per_group"],
    "benford_first_digit": ["trend_mann_kendall"],
    "ab_test_welch_ttest": ["bootstrap_mean_ci"],
    "forecast_backtest_mape": ["trend_mann_kendall"],
    "holt_linear_forecast": ["trend_mann_kendall"],
    "xcorr_daily_lags": ["trend_mann_kendall"],
    "seasonality_dow_profile": ["trend_mann_kendall"],
    "rolling_bollinger_bands": ["trend_mann_kendall"],
    "event_ewma_smoothing": ["trend_mann_kendall"],
    "segment_sales_trend": ["trend_mann_kendall"],
    "chi2_feature_select": ["eval_calibration_bins"],
    "drift_psi_monitor": ["eval_calibration_bins"],
    "lang_nb_classifier": ["label_noise_knn_audit"],
    "quality_lr_classifier": ["label_noise_knn_audit"],
    "cf_item_cosine": ["recommend_copurchase_topk", "sim_cosine_topk"],
    "recommend_copurchase_topk": ["topk_per_group"],
    "copurchase_part_pairs": ["topk_per_group"],
    "assoc_rules_lift": ["topk_per_group"],
    "retention_cohorts": ["survival_repurchase_curve"],
    "cohort_ltv_curve": ["survival_repurchase_curve"],
    "dau_wau_rollup": ["events_peak_concurrency"],
    "user_activity_islands": ["seq_pattern_funnel"],
    "user_max_drawdown": ["seq_pattern_funnel"],
    "session_top_paths": ["seq_pattern_funnel"],
    "funnel_conversion": ["seq_pattern_funnel"],
    "conversion_latency_percentiles": ["seq_pattern_funnel", "percentile_exact"],
    "event_markov_transitions": ["seq_pattern_funnel"],
    "event_time_weighted_avg": ["events_peak_concurrency"],
    "events_ohlc_bars": ["events_peak_concurrency"],
    "revenue_mom_growth": ["decimal_exact_pricing", "trend_mann_kendall"],
    "decimal_exact_pricing": ["tpch_q1_style"],
    "incremental_revenue_rollup": ["incremental_orders_state"],
    "weighted_median_price": ["percentile_exact"],
    "decay_weighted_revenue": ["trend_mann_kendall"],
    "revenue_concentration_gini": ["percentile_exact"],
    "rfm_customer_segments": ["percentile_exact"],
    "users_anomaly_zscore": ["trend_mann_kendall"],
    "users_anomaly_mad": ["percentile_exact"],
    "contrastive_hard_negatives": ["label_noise_knn_audit"],
    "dedup_keep_best_representative": ["dedup_cluster_components"],
}


def green_rounds() -> dict[str, list[int]]:
    out: dict[str, list[int]] = {}
    for path in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(os.path.join(REPO, path)) as f:
            data = json.load(f)
        for name, rec in data.items():
            if (
                rec.get("rows_match")
                and rec.get("schema_match") is not False
                and rec.get("hash_match") is not False
                and not rec.get("err")
            ):
                out.setdefault(name, []).append(rnd)
    return out


def pick_twin(name: str, certified: set[str]) -> list[str]:
    if name in OVERRIDES:
        reps = [r for r in OVERRIDES[name] if r in certified]
        if reps:
            return reps
    best = None
    for prefix, reps in FAMILY_REPS.items():
        if name.startswith(prefix) and (best is None or len(prefix) > len(best[0])):
            best = (prefix, reps)
    if best:
        reps = [r for r in best[1] if r in certified]
        if reps:
            return reps
    return []


def main() -> int:
    from jaffle_shop_classic_spark.operators.catalog import _PRIORITY, load_catalog

    cat = load_catalog()
    rounds = green_rounds()
    next_round = (
        max(int(re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p).group(1))
            for p in os.listdir(REPO) if re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p))
        + 1
    )
    certified = set(rounds) | set(_PRIORITY)
    window = set(_PRIORITY)

    lines = [
        BEGIN,
        "",
        "## Per-entry certification map (generated)",
        "",
        f"One row per catalog entry ({len(cat)} total). **driver rounds** = "
        "CORRECTNESS_r{N} records where the entry was green (rows+schema+hash); "
        f"`window r{next_round:02d}` = currently in the 50-slot gate window, "
        "scheduled for the next record. Entries with no driver rounds name the "
        "**certified class representative** whose hard signal covers their "
        "machinery. Every oracle-backed entry is additionally value-hash-checked "
        "locally each session (tests/test_oracle_parity.py at sf0.001; "
        "tools/preflight.py at sf0.01); `rows-only` entries name their "
        "engine-side value checks in the capability table above.",
        "",
        "| entry | oracle | driver rounds | certified class rep (if no rounds) |",
        "|---|---|---|---|",
    ]
    n_certified = n_twinned = n_orphan = 0
    orphans = []
    for name, spec in cat.items():
        oracle = "✓" if spec.oracle is not None else "rows-only"
        rds = rounds.get(name, [])
        cite = ", ".join(f"r{r:02d}" for r in rds)
        if name in window:
            cite = (cite + ", " if cite else "") + f"window r{next_round:02d}"
        twin = ""
        if rds or name in window:
            n_certified += 1
        else:
            reps = pick_twin(name, certified)
            if reps:
                n_twinned += 1
                twin = ", ".join(
                    f"`{r}` ({', '.join(f'r{x:02d}' for x in rounds.get(r, []))}"
                    + (f"{', ' if rounds.get(r) else ''}window)" if r in window else ")")
                    for r in reps
                )
            else:
                n_orphan += 1
                orphans.append(name)
                twin = "(none — see capability table)"
        lines.append(f"| `{name}` | {oracle} | {cite or '—'} | {twin or '—'} |")
    lines += [
        "",
        f"**Totals:** {n_certified} entries driver-certified or in-window, "
        f"{n_twinned} covered by a named certified class representative, "
        f"{n_orphan} unmapped.",
        "",
        END,
    ]
    if orphans:
        print("UNMAPPED:", orphans, file=sys.stderr)

    cov_path = os.path.join(REPO, "COVERAGE.md")
    with open(cov_path) as f:
        text = f.read()
    block = "\n".join(lines)
    if BEGIN in text:
        text = re.sub(
            re.escape(BEGIN) + ".*?" + re.escape(END), block, text, flags=re.S
        )
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(cov_path, "w") as f:
        f.write(text)
    print(
        f"wrote {cov_path}: {len(cat)} entries, {n_certified} hard, "
        f"{n_twinned} twinned, {n_orphan} unmapped"
    )
    return 1 if orphans else 0


if __name__ == "__main__":
    sys.exit(main())
