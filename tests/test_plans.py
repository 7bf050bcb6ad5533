"""Physical-plan assertions for the scale-critical claims in SCALING.md.

These lock in the *plan shapes* — pushdown reaching the parquet scan,
broadcasts where dimensions are small, TakeOrdered instead of global
sorts, no Python eval in JVM-only paths — so a refactor that silently
degrades a plan fails CI, not the 100 TB run.
"""

from __future__ import annotations

import pytest

from jaffle_shop_classic_spark.operators.catalog import load_catalog


def _plan(spark, sf_dir, name: str, mode: str = "formatted") -> str:
    df = load_catalog()[name].fn(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filter_in_between")
    assert "PushedFilters: [" in plan
    # the status IN-filter must be pushed, not evaluated post-scan only
    assert "In(o_orderstatus" in plan


def test_staging_projection_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "stg_project_rename")
    # ReadSchema lists only the 4 referenced columns of the 6-column table
    read = [line for line in plan.splitlines() if "ReadSchema" in line][0]
    assert "o_totalprice" not in read and "o_orderpriority" not in read
    assert "o_orderkey" in read


def test_staging_is_shuffle_free(spark, sf_dir):
    plan = _plan(spark, sf_dir, "stg_scalar_arith")
    assert "Exchange" not in plan


def test_global_topk_uses_take_ordered_not_full_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_mart_join_broadcasts_aggregated_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "jaffle_customers")
    assert "BroadcastHashJoin" in plan


def test_relationships_check_uses_anti_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "test_relationships_violations")
    assert "LeftAnti" in plan


def test_jvm_only_paths_have_no_python_eval(spark, sf_dir):
    for name in (
        "jaffle_customers",
        "jaffle_orders",
        "text_token_stats",
        "dedup_minhash_signature",
        "sim_cosine_topk",
        "session_window_batch",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name  # row-at-a-time UDF
        assert "ArrowEvalPython" not in plan, name  # no Python at all here


def test_udf_paths_are_arrow_not_row_at_a_time(spark, sf_dir):
    plan = _plan(spark, sf_dir, "udf_pandas_scalar")
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_whole_stage_codegen_covers_mart_aggregation(spark, sf_dir):
    # "codegen" mode compiles the stages; AQE "simple" plans don't show
    # WholeStageCodegen wrappers pre-execution
    plan = _plan(spark, sf_dir, "jaffle_orders", mode="codegen")
    assert "WholeStageCodegen" in plan


def test_minhash_lsh_join_is_equi_join_on_band_key(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_minhash_lsh_pairs")
    # candidate generation must be a hash-partitioned equi join on the
    # band key — a cartesian/BNL join here would be the O(n^2) failure
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pre_aggregation_below_mart_payments_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "jaffle_customers", mode="simple")
    # fused mart shape (SCALING.md R6): per-order subtotal aggregated
    # BEFORE the orders join, then exactly one per-customer aggregate
    # computing all four measures — 2 aggs x (partial+final) = 4 stages,
    # and only two shuffles total (l_orderkey, o_custkey)
    assert plan.count("HashAggregate") == 4
    assert plan.count("Exchange hashpartitioning") == 2
    # the payments branch must pre-aggregate on l_orderkey below the join
    order_agg = plan.index("hashpartitioning(l_orderkey")
    cust_agg = plan.index("hashpartitioning(o_custkey")
    assert cust_agg < order_agg  # custkey agg is above (printed first)


def test_pivot_native_single_scan_no_discovery_pass(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pivot_native", mode="simple")
    # declared pivot values -> two-level hash aggregate ((key, pivot-col)
    # sum, then pivotfirst), ONE scan, and crucially no second scan to
    # discover the pivot values
    assert plan.count("FileScan") == 1
    assert "pivotfirst" in plan
    assert plan.count("HashAggregate") == 4


def test_epoch_shuffle_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "shuffle_epoch_sample", mode="simple")
    # first-shard of the permutation must be per-partition top-k + merge,
    # never a global sort
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_length_bucketed_single_window_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "batch_length_bucketed", mode="simple")
    # one hash exchange for the per-bucket window; bucketing itself is
    # map-only
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


# ------------------------------------------------------- round-5 operators
def test_zorder_key_is_map_only(spark, sf_dir):
    # the Morton key is a pure expression: no Exchange at any scale
    plan = _plan(spark, sf_dir, "zorder_orders_layout")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scd2_single_entity_shuffle(spark, sf_dir):
    # change detection (lag) and interval build (lead) must reuse ONE
    # user_id hash partitioning — a second Exchange means the two window
    # specs diverged
    plan = _plan(spark, sf_dir, "scd2_user_state_history", mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1


def test_inverted_index_single_shuffle(spark, sf_dir):
    # per-doc dedup is map-side (array_distinct), so the term aggregate
    # is the only Exchange
    plan = _plan(spark, sf_dir, "text_inverted_index", mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1


def test_pmi_broadcasts_unigram_side(spark, sf_dir):
    # the corpus-sized bigram table must join vocabulary-sized unigram
    # counts via broadcast — a sort-merge here reshuffles the big side
    plan = _plan(spark, sf_dir, "text_pmi_collocations")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan  # top-25 is never a full sort


def test_mg_heavy_hitters_bounded_summaries_and_broadcast_recount(spark, sf_dir):
    # the vocabulary must never hash-aggregate raw: summaries come from
    # an Arrow mapInPandas pass, candidates broadcast back for the
    # exact recount (semi join build side is broadcast)
    plan = _plan(spark, sf_dir, "text_heavy_hitters_mg")
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin LeftSemi" in plan.replace("\n", " ") or (
        "LeftSemi" in plan and "BroadcastExchange" in plan
    )


def test_zorder_like_map_only_pq_encode_codebook_broadcasts(spark, sf_dir):
    # every codebook join in PQ training/encode must broadcast the
    # (M*K)-row model side — a sort-merge would shuffle the subvector
    # long-form per iteration. Since round 7 the trained codebook is a
    # session-cached localCheckpoint (see similarity._TRAINED), so the
    # TRAINING plan is inspected directly and the encode query's final
    # plan must broadcast the checkpointed codebook.
    from jaffle_shop_classic_spark.operators.similarity import _pq_codebooks, _pq_sub

    train_df = _pq_codebooks(_pq_sub(spark, sf_dir))
    train_plan = train_df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "SortMergeJoin" not in train_plan
    assert train_plan.count("BroadcastHashJoin") >= 2  # one per Lloyd iteration
    plan = _plan(spark, sf_dir, "embedding_pq_encode")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 1  # encode argmin join


def test_tpch_q5_single_aggregate_exchange(spark, sf_dir):
    # the 6-way join compiles to a broadcast chain: the ONLY exchange
    # beyond broadcasts is the final aggregate's shuffle
    plan = _plan(spark, sf_dir, "tpch_q5_style")
    non_broadcast_exchanges = plan.count("+- Exchange") + plan.count(": Exchange")
    assert non_broadcast_exchanges <= 1, plan
    assert "SortMergeJoin" not in plan


def test_strip_dup_spans_no_token_stream_shuffle(spark, sf_dir):
    # only gram hashes and position integers may ride exchanges; the
    # rewrite is a higher-order filter over the carried token array —
    # no window/sort over the token stream
    plan = _plan(spark, sf_dir, "curation_strip_dup_spans")
    assert "Window" not in plan
    assert "SortAggregate" not in plan


def test_jl_projection_is_map_only(spark, sf_dir):
    # the projection must be a pure map stage: no Exchange except the
    # final presentation sort, no joins (the matrix is a literal)
    plan = _plan(spark, sf_dir, "embedding_jl_project", mode="simple")
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1  # only the ORDER BY vec_id sort


def test_ohlc_single_aggregate_exchange(spark, sf_dir):
    # one partial->final aggregate on (user, bucket), one data exchange,
    # no joins/windows. Spark plans min_by/max_by's (value, ord) pair
    # buffer as SortAggregate (declarative struct buffers aren't
    # hash-agg-eligible) — the sort is on the GROUPING key only, the
    # standard sort-based-agg cost, not a window over the event stream.
    plan = _plan(spark, sf_dir, "events_ohlc_bars", mode="simple")
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_ols_trend_exchanges_only_aggregate_keys(spark, sf_dir):
    # the five sufficient statistics aggregate on the segment key; the
    # customer join must broadcast (dimension side)
    plan = _plan(spark, sf_dir, "segment_sales_trend")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fuzzy_join_blocks_on_equi_keys(spark, sf_dir):
    # blocking must compile to an equi-join on (brand, first letter) —
    # a cartesian/BNLJ would mean the blocking key was lost
    plan = _plan(spark, sf_dir, "fuzzy_join_levenshtein")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan  # the verify predicate rides the join


def test_q19_disjunction_pushes_to_both_scans(spark, sf_dir):
    # the OR-of-clause-bundles must be projected onto each join side and
    # reach the parquet scans as PushedFilters — the disjunctive-
    # predicate class q19 exists to certify
    plan = _plan(spark, sf_dir, "tpch_q19_style")
    import re
    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    part_side = [s for s in pushed if "p_brand" in s]
    line_side = [s for s in pushed if "l_quantity" in s]
    assert part_side and "Or(" in part_side[0] and "Brand#25" in part_side[0]
    assert line_side and "Or(" in line_side[0]
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan


def test_q6_every_predicate_pushes_to_scan(spark, sf_dir):
    # Q6 is the pure pushdown query: ship-year bounds, discount band and
    # quantity cap must all reach the lineitem scan's PushedFilters —
    # at 100 TB this query's whole cost is the pruned scan
    plan = _plan(spark, sf_dir, "tpch_q6_style")
    import re

    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    assert pushed, plan
    line = pushed[0]
    assert "l_shipdate" in line and "l_discount" in line and "l_quantity" in line
    # single aggregate: nothing shuffles ABOVE the (final) HashAggregate
    assert "Exchange" not in plan.split("HashAggregate")[0]
    assert "Join" not in plan


def test_q9_like_prunes_part_before_broadcast(spark, sf_dir):
    # the LIKE filter must sit under the BroadcastExchange, not above
    # the join: broadcasting the unfiltered part table ships rows the
    # predicate would discard
    plan = _plan(spark, sf_dir, "tpch_q9_style")
    assert "BroadcastHashJoin" in plan
    bx = plan.find("StringContains(p_name,r)")
    assert bx != -1, plan  # pushed into the part scan itself
    assert "CartesianProduct" not in plan


def test_q4_exists_decorrelates_to_one_semi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q4_style")
    tree = plan[: plan.find("(1) Scan")]  # formatted mode repeats nodes below
    assert tree.count("LeftSemi") == 1
    # the quarter filter reaches the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q20_pair_aggregate_precedes_threshold_join(spark, sf_dir):
    # the (part, supplier) volume aggregate must run BEFORE any join
    # with the per-part average — the quadratic never materializes
    plan = _plan(spark, sf_dir, "tpch_q20_style")
    tree = plan[: plan.find("(1) Scan")]
    assert "HashAggregate" in plan
    assert tree.count("LeftSemi") == 1
    assert "CartesianProduct" not in plan


def _broadcast_subtrees(tree: str) -> list[str]:
    """Extract each BroadcastExchange node's subtree from a formatted
    plan tree, using node-marker indentation."""
    lines = tree.splitlines()
    out = []
    for i, line in enumerate(lines):
        if "BroadcastExchange (" not in line:
            continue
        indent = max(line.find("+- "), line.find(":- "))
        sub = [line]
        for nxt in lines[i + 1 :]:
            pos = max(nxt.find("+- "), nxt.find(":- "))
            if pos != -1 and pos <= indent:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


def test_bm25_broadcasts_query_pruned_df_not_vocabulary(spark, sf_dir):
    # the vocabulary-sized term->df table must be semi-joined down to
    # the <=8 query terms BEFORE broadcasting: the broadcast build side
    # of the postings probe is therefore a join (dfreq x windowed query),
    # never the raw df aggregate. At 100 TB the raw vocabulary is
    # 1e8-1e9 rows and an unpruned broadcast OOMs.
    plan = _plan(spark, sf_dir, "retrieval_bm25_topk")
    tree = plan[: plan.find("(1) Scan")]
    pruned = [
        s
        for s in _broadcast_subtrees(tree)
        if "BroadcastHashJoin" in s and "Window" in s
    ]
    assert pruned, tree  # the df broadcast wraps the query-pruned join
