"""Catalog-wide plan audit: global anti-pattern sweep over every
registered query. Complements test_plans.py's targeted assertions.

Rules:
- no row-at-a-time Python UDFs anywhere (BatchEvalPython),
- no unintentional cartesian joins: cross products are allowed only
  where the operator is *defined* as one (explicit cross join, or a
  broadcast 1-row query vector).
"""

from __future__ import annotations

import pytest

from jaffle_shop_classic_spark.operators.catalog import load_catalog

# queries whose semantics ARE a cross product against a tiny side
CROSS_OK = {
    "join_cross",  # explicit dimension cross join
    "gapfill_daily_orders",  # deliberate spine x dimension grid
    "sim_cosine_topk",  # broadcast 1-row query vector
    "sim_ann_hyperplane",  # broadcast 1-row query bucket
    "sim_ivf_topk",  # broadcast K-centroid assignment join
    "sim_ivf_multiprobe_topk",  # broadcast K-centroid assignment join
    "kmeans_lloyd",  # broadcast K-centroid assignment join per iteration
    "sim_ivf_kmeans_topk",  # same broadcast K-centroid joins (train + probe)
    "text_tfidf_topk",  # broadcast 1-row corpus-size (N) join for idf
    "quality_percentile_filter",  # broadcast 1-row threshold join
    "quality_percentile_filter_approx",  # broadcast 1-row threshold join
    "sample_language_balanced",  # broadcast 1-row min-lang-count join
    "sample_temperature_mix",  # broadcast 1-row corpus-totals join
    "tokenizer_bpe_train",  # broadcast 1-row winning-pair join per round
    "tokenizer_bpe_encode",  # same 1-row pair joins inside the train subtree
    "tokenizer_bpe_decode_roundtrip",  # same 1-row pair joins (train subtree)
    "text_boilerplate_shingles",  # broadcast 1-row corpus-size (N) join
    "text_pmi_collocations",  # broadcast 1-row corpus-size (N) join
    "dedup_embedding_cosine",  # non-equi self pair join within label blocks
    "sim_pairs_blocked",
    "dedup_ngram_jaccard",
    "join_bloom_prefilter",  # broadcast 1-row bloom-bitmap join
    "text_heavy_hitters_mg",  # broadcast 1-row corpus-total join
    "users_anomaly_zscore",  # broadcast 1-row moment join
    "dedup_semantic_clusters",  # broadcast K-centroid assignment join
    "sim_ivfpq_topk",  # broadcast coarse-centroid assignment join
    "quantiles_histogram_cdf",  # broadcast 4-row quantile-threshold join
    "graph_pagerank",  # broadcast 1-row teleport/init constants join
    "users_anomaly_mad",  # broadcast 1-row median/MAD joins
    "impute_group_median",  # broadcast 1-row global-median fallback join
    "lang_nb_classifier",  # vocab x language smoothing grid (the model itself)
    "chi2_feature_select",  # vocab x language contingency grid + 1-row N join
    "drift_psi_monitor",  # broadcast 1-row decile-edge + totals joins
    "hybrid_retrieval_rrf",  # broadcast 1-row query vector + corpus-size joins
    "sim_sparse_tfidf_pairs",  # broadcast 1-row corpus-size (N) join for idf
    "rfm_customer_segments",  # broadcast 1-row recency-anchor join
    "assoc_rules_lift",  # broadcast 1-row basket-count (N) join
    "referential_integrity_profile",  # 1-row total x 1-row orphan-count joins
    "graph_degree_powerlaw",  # 1-row summary x 1-row edge-count/Hill joins
    "quantile_normalize_groups",  # broadcast 1-row corpus-size (N) join
    "decay_weighted_revenue",  # broadcast 1-row max-date anchor join
    "seasonality_dow_profile",  # broadcast 1-row grand-total join
    "label_noise_knn_audit",  # LSH-bucketed non-equi self pair join
    "survival_repurchase_curve",  # broadcast 1-row horizon/total joins
    "trend_mann_kendall",  # month-bounded pair join + 1-row reductions
    "er_fellegi_sunter_em",  # broadcast 1-row EM parameter frame per round
    "sim_ann_recall_eval",  # broadcast query-sample scored cross join (exact side)
    "ks_test_two_sample",  # broadcast 1-row totals (n1,n2) join
    "tpch_q22_style",  # broadcast 1-row (total,cnt) threshold join
    "tpch_q11_style",  # broadcast 1-row corpus-total threshold join
    "data_mixture_weights",  # broadcast 1-row source-count join
    "cusum_revenue_shift",  # broadcast 1-row (total,n) reference join
    "sim_binary_hamming_topk",  # broadcast 1-row query (words + vector) join
    "keyset_pagination_page3",  # broadcast 1-row cursor-tuple join
    "source_kl_divergence",  # vocab x sources smoothing grid + 1-row (V,N) join
    "sim_truncated_dim_recall",  # broadcast 1-row query vector join (two rankings)
    "tpch_q15_style",  # broadcast 1-row max-revenue scalar join
    "sketch_kmv_intersection",  # broadcast 1-row theta/count scalar joins
    "sample_dsir_importance",  # broadcast 1-row bucket-total join (DSIR smoothing)
    "retrieval_bm25_topk",  # broadcast 1-row corpus-stats (N, avgdl) join
    "embedding_pca_power",  # O(dim^2) local eigensolve; no cross join remains
    "vocab_heaps_law",  # broadcast 1-row bucket-width join
    "retrieval_rm3_expansion",  # broadcast 1-row corpus-stats + sum-w joins
    # round-13 batch 2/3 newcomers — every cross/BNLJ below is a
    # broadcast of a 1-row scalar frame or a bounded summary frame:
    "text_kneser_ney_score",  # broadcast 1-row bigram-type-count (T) join
    "graph_hits_scores",  # broadcast 1-row L1-normalizer join per half-round
    "eval_isotonic_calibration",  # bin-range non-equi joins on the <=50-row summary
    "stats_fdr_bh",  # broadcast 1-row global moments + k* threshold joins
    "t_closeness_audit",  # QI x sensitive-domain grid (the output shape) + 1-row total
    "feature_mi_audit",  # broadcast 1-row exact-median label threshold join
    "ab_cuped_adjustment",  # broadcast 1-row pooled-moment (theta, mx) join
    "fairness_disparate_impact",  # broadcast 1-row median + best-rate joins
    "eval_auprc",  # broadcast 1-row totals (P, N) + final AP scalar joins
    "vocab_zipf_fit",  # 1-row moment frame; OLS closed form
    "sample_pps_systematic",  # broadcast 1-row total-weight (T) join
    # round-14 newcomers — every cross/BNLJ below is a broadcast of a
    # 1-row scalar frame or a bounded (#groups/#strata-sized) summary:
    "stats_kruskal_wallis",  # 1-row (N, tie_sum) + 1-row H joins
    "stats_brown_forsythe",  # bounded per-group medians + 1-row totals/parts
    "eval_brier_decomposition",  # 1-row corpus-count + 1-row totals joins
    "stats_runs_test",  # broadcast 1-row doubled-median join
    "sample_neyman_allocation",  # broadcast 1-row weight-total join
    "dedup_minhash_recall_eval",  # three 1-row metric-count joins
    "graph_modularity_score",  # 1-row edge-count (m) + 1-row Q joins
    "ab_randomization_test",  # broadcast 1-row observed-statistic join
    "stats_ljung_box",  # broadcast 7-row lag frame + 1-row moment joins
    "stats_dunn_posthoc",  # 5x5 group-pair non-equi join + 1-row totals
    "tokenizer_unigram_viterbi",  # broadcast 1-row vocab-total (T) join
}


@pytest.mark.parametrize("name", sorted(load_catalog()))
def test_no_plan_antipatterns(name, spark, sf_dir):
    spec = load_catalog()[name]
    df = spec.fn(spark, sf_dir)
    if df.isStreaming:  # pragma: no cover — none registered today
        pytest.skip("streaming plan")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in CROSS_OK:
        assert "CartesianProduct" not in plan, f"{name}: unintended cartesian"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: unintended BNLJ"
