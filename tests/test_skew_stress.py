"""Planted-skew stress tier: the scale arguments in SCALING.md are
otherwise only asserted on uniform sf data. This fixture plants the two
classic adversaries — one user owning 10% of the event stream, and one
boilerplate template shared by half the document corpus — and asserts
the defensive paths (hot-band cap, salted join, AQE skew-split,
Misra-Gries heavy hitters) demonstrably FIRE on them, via both plan and
output assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jaffle_shop_classic_spark.operators.catalog import load_catalog

TEMPLATE = " ".join(f"the of and a to in is it{i % 3}" for i in range(8))
N_TEMPLATE = 200  # > MAX_BAND_SIZE: every template band bucket is hot
N_NORMAL = 60
HOT_USER = 7
N_EVENTS = 30_000
HOT_FRAC = 0.10


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    """A synthetic sf dir whose documents/events tables carry planted
    skew. Catalog queries run on it unmodified (they only read the
    tables they need)."""
    base = tmp_path_factory.mktemp("skewed_sf")

    docs = []
    # 50%+ of the corpus is one boilerplate template: identical text ->
    # identical minhash signature -> every band bucket has N_TEMPLATE
    # members, far over MAX_BAND_SIZE=64
    for i in range(N_TEMPLATE):
        docs.append((i, TEMPLATE, "en", "web", len(TEMPLATE)))
    # distinct normal docs (unique token streams -> singleton buckets)
    for i in range(N_NORMAL):
        text = " ".join(f"tok{i}x{j}" for j in range(20))
        docs.append((N_TEMPLATE + i, text, "en", "web", len(text)))
    # one planted near-dup pair among the normal docs: 19/20 tokens
    # shared -> nearly identical shingle sets -> same band buckets
    a = " ".join(f"pair{j}" for j in range(20))
    b = " ".join(f"pair{j}" for j in range(19)) + " differs"
    docs.append((9000, a, "en", "web", len(a)))
    docs.append((9001, b, "en", "web", len(b)))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(4).write.mode("overwrite").parquet(f"{base}/documents.parquet")

    # events: HOT_USER owns 10% of the stream, the rest spread over 1k users
    n_hot = int(N_EVENTS * HOT_FRAC)
    ev = (
        spark.range(N_EVENTS)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
            F.when(F.col("id") < n_hot, F.lit(HOT_USER))
            .otherwise(F.pmod(F.col("id") * 2654435761, F.lit(1000)) + 100)
            .alias("user_id"),
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("buy")),
                (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
            ).alias("event_type"),
            (F.col("id") % 97).cast("double").alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    ev.repartition(8).write.mode("overwrite").parquet(f"{base}/events.parquet")
    # pre-materialized user dim: the AQE skew rule only matches
    # SMJ(Sort(Shuffle), Sort(Shuffle)) — a distinct's post-shuffle
    # HashAggregate on the dim side would break the pattern, which is
    # itself a scale lesson: land dims as tables before the fact join
    ev.select("user_id").distinct().withColumn(
        "grp", F.pmod(F.col("user_id"), F.lit(10))
    ).write.mode("overwrite").parquet(f"{base}/users_dim.parquet")
    return str(base)


def test_hot_band_cap_fires_on_boilerplate_corpus(spark, skew_dir):
    """Pre-cap, the template's band buckets hold N_TEMPLATE members;
    post-cap they are gone entirely — the cap demonstrably fires."""
    from jaffle_shop_classic_spark.operators.dedup import (
        MAX_BAND_SIZE,
        _bands_expr,
        capped_bands,
        minhash_signatures,
    )
    from jaffle_shop_classic_spark.sources.parquet import load_table

    d = load_table(spark, skew_dir, "documents")
    bands = minhash_signatures(d).selectExpr(
        "doc_id", f"explode({_bands_expr('sig')}) AS band_key"
    )
    pre = bands.groupBy("band_key").count()
    assert pre.agg(F.max("count")).collect()[0][0] >= N_TEMPLATE > MAX_BAND_SIZE
    post = capped_bands(bands).groupBy("band_key").count()
    assert post.agg(F.max("count")).collect()[0][0] <= MAX_BAND_SIZE


def test_lsh_pairs_bounded_and_recall_kept_under_skew(spark, skew_dir):
    """The LSH candidate join on the planted corpus must NOT expand the
    ~20k-pair template clique (cap drops those buckets; exact dedup owns
    identical docs), yet must still surface the planted near-dup pair."""
    fn = load_catalog()["dedup_minhash_lsh_pairs"].fn
    rows = fn(spark, skew_dir).collect()
    template_pairs = [
        r for r in rows if r["doc_a"] < N_TEMPLATE and r["doc_b"] < N_TEMPLATE
    ]
    assert template_pairs == []  # the quadratic clique never materialized
    planted = [r for r in rows if (r["doc_a"], r["doc_b"]) == (9000, 9001)]
    assert len(planted) == 1 and planted[0]["est_jaccard"] >= 0.5


def test_heavy_hitters_finds_template_tokens_under_skew(spark, skew_dir):
    """Misra-Gries + exact recount must report the boilerplate tokens
    (each >2% of the token stream) and no normal-doc token."""
    fn = load_catalog()["text_heavy_hitters_mg"].fn
    got = {r["token"] for r in fn(spark, skew_dir).collect()}
    assert {"the", "of", "and", "a", "to", "in", "is"} <= got
    assert not any(t.startswith("tok") for t in got)


def test_aqe_skew_join_splits_hot_user_partition(spark, skew_dir):
    """With broadcast disabled (the fact-fact case), AQE must detect the
    hot user's oversized shuffle partition and split it: the executed
    plan carries the skew=true SMJ marker, and results equal the plain
    join."""
    from jaffle_shop_classic_spark.sources.parquet import load_table

    ev = load_table(spark, skew_dir, "events").select("event_id", "user_id")
    dim = spark.read.parquet(f"{skew_dir}/users_dim.parquet")
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # local-mode analog of 1000-executor sizing: partitions small
        # enough that the hot user's partition is >2x the median
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.shuffle.partitions": "64",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = ev.join(dim, "user_id")
        n = len(joined.collect())
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    # AQE demonstrably split the hot partition
    assert "skew=true" in plan and "AQEShuffleRead skewed" in plan
    assert n == ev.join(dim, "user_id").count() == N_EVENTS


def test_salted_join_flattens_hot_user(spark, skew_dir):
    """salted_join on the 10%-hot stream: same result as the plain join,
    and the hot key's rows demonstrably spread across all salt groups."""
    from jaffle_shop_classic_spark.functions.skew import (
        SALT_COL,
        salt_column,
        salted_join,
    )
    from jaffle_shop_classic_spark.sources.parquet import load_table

    ev = load_table(spark, skew_dir, "events").select("event_id", "user_id")
    dim = ev.select("user_id").distinct().withColumn("flag", F.lit(1))
    plain = ev.join(dim, "user_id").count()
    salted = salted_join(ev, dim, "user_id", num_salts=8).count()
    assert plain == salted == N_EVENTS

    hot = ev.filter(F.col("user_id") == HOT_USER)
    n_hot = hot.count()
    groups = (
        hot.withColumn(SALT_COL, salt_column(8, F.col("user_id"), F.col("event_id")))
        .groupBy(SALT_COL)
        .count()
        .collect()
    )
    assert len(groups) == 8
    # no salt group holds more than ~2x the even share
    assert max(r["count"] for r in groups) < n_hot / 8 * 2


def test_vocab_overlap_fanout_bounded_by_source_count(spark, tmp_path):
    """A stopword present in EVERY source: the token-keyed self-join's
    per-token fanout is (sources choose 2), never corpus-sized — with
    20 sources sharing 'the', the full pair table is exactly 190 rows
    before the limit, and the shared-token pair count is correct."""
    docs = []
    for s in range(20):
        # every source holds the hot token plus one private token
        docs.append((s, f"the only{s}", "en", f"s{s:02d}", 10))
        # pad each source with 50 docs REPEATING the same tokens: the
        # (source, token) dedup must collapse them before the join
        for j in range(50):
            docs.append((1000 + s * 50 + j, f"the only{s}", "en", f"s{s:02d}", 10))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = load_catalog()["source_vocab_overlap"].fn(spark, str(tmp_path)).collect()
    # every source pair intersects in exactly {'the'}: jaccard = 1/3
    assert len(out) == 30  # top-30 limit of the 190 pairs
    for r in out:
        assert r["n_inter"] == 1
        assert r["jaccard"] == round(1 / 3, 6)


@pytest.fixture(scope="module")
def hub_graph(spark):
    """A planted-hub graph: node 0 owns 300 of 302 edges (>99% of the
    edge mass — far beyond the 10%-hot threshold the AQE tier uses),
    plus a disjoint 3-node chain so multi-component behavior is
    exercised too. Returned as (pairs, symmetric_edges)."""
    rows = [(0, leaf) for leaf in range(1, 301)] + [(400, 401), (401, 402)]
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    edges = (
        pairs.selectExpr("doc_a AS src", "doc_b AS dst")
        .unionByName(pairs.selectExpr("doc_b AS src", "doc_a AS dst"))
        .localCheckpoint(eager=True)
    )
    return pairs, edges


def test_pagerank_hub_messages_combine_map_side(spark, hub_graph):
    """PageRank under a node holding >99% of edges: every per-round sum
    aggregate must carry a map-side partial stage (the hub's 300
    incoming messages shuffle as per-partition partials, never raw
    rows), and the output must be exact — hub rank strictly maximal,
    all 300 structurally identical leaves bit-identical."""
    from jaffle_shop_classic_spark.operators.dedup import pagerank_ranks

    _, edges = hub_graph
    ranks = pagerank_ranks(edges, iters=2)
    rows = ranks.collect()
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    # the keyed exchange is partially aggregated before the shuffle
    assert "partial_sum" in plan
    by_id = {r["doc_id"]: r["r"] for r in rows}
    assert len(by_id) == 304
    hub = by_id[0]
    leaf_ranks = {by_id[leaf] for leaf in range(1, 301)}
    assert len(leaf_ranks) == 1  # symmetric leaves agree bit-for-bit
    assert hub > max(by_id[i] for i in by_id if i != 0)
    # integer mass conservation: truncating div loses <1 unit per op,
    # so total rank mass stays within a hair of PR_SCALE
    total = sum(by_id.values())
    assert 0.95 * 10**12 < total <= 10**12


def test_lpa_hub_keeps_leaves_in_one_community(spark, hub_graph):
    """Synchronous LPA under the planted hub: the (dst, label) count
    aggregate must partially combine map-side, and the star must never
    fragment — all 300 leaves carry ONE shared label each round (the
    deterministic two-coloring of the bipartite star), with the
    disjoint chain keeping its own labels."""
    from jaffle_shop_classic_spark.operators.dedup import propagate_labels

    _, edges = hub_graph
    labels = propagate_labels(edges, iters=4)
    rows = labels.collect()
    plan = labels._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan
    # r16: the per-node argmax is a two-phase max_by aggregate (map-side
    # partials reduce each partition to one candidate per node before
    # the exchange), not a ship-everything sort window
    assert "partial_max_by" in plan
    assert "Window" not in plan
    got = {r["doc_id"]: r["label"] for r in rows}
    leaf_labels = {got[leaf] for leaf in range(1, 301)}
    assert len(leaf_labels) == 1  # the hub's community never fragments
    assert leaf_labels <= {0, 1} and got[0] in {0, 1}
    assert {got[400], got[401], got[402]} <= {400, 401}  # chain stays apart


def test_star_cc_hub_converges_in_log_rounds(spark, hub_graph):
    """Large-star/small-star under the planted hub: a 300-leaf star is
    already (almost) the fixpoint shape, so contraction must land
    within 6 alternations (vs STAR_MAX_ITERS=30) and label every node
    with its component min — hub fanout never multiplies rounds."""
    from jaffle_shop_classic_spark.operators.dedup import star_components

    pairs, _ = hub_graph
    comp = star_components(pairs, max_iters=6)  # raises if not converged
    rows = comp.collect()
    got = {r["doc_id"]: r["component_id"] for r in rows}
    assert len(got) == 304
    assert all(got[i] == 0 for i in range(0, 301))
    assert got[400] == got[401] == got[402] == 400


def test_khop_hub_fanout_single_plan(spark, tmp_path):
    """A 300-leaf hub at the seed: the first frontier expansion fans to
    300 nodes in one equi-join round and distances stay exact."""
    order_parts = []
    ok = 1
    for leaf in range(1, 301):
        order_parts += [(ok, [0, leaf]), (ok + 1, [0, leaf])]
        ok += 2
    # one chain off leaf 1 to give depth: 1-400-401
    order_parts += [(ok, [1, 400]), (ok + 1, [1, 400]),
                    (ok + 2, [400, 401]), (ok + 3, [400, 401])]
    rows = [
        (o, pk, 1, i, 1.0, 10.0, 0.0, 0.0, "N", "O", None)
        for o, parts in order_parts
        for i, pk in enumerate(parts)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    got = {
        r["node"]: r["dist"]
        for r in load_catalog()["graph_khop_reach"].fn(spark, str(tmp_path)).collect()
    }
    assert got[0] == 0
    assert sum(1 for d in got.values() if d == 1) == 300  # full hub ring
    assert got[400] == 2 and got[401] == 3


# ---------------------------------------------------------------- round 9:
# the two pair-heavy round-8 operators get the same planted-hot-key
# treatment as LSH/graph: plan assertions (map-side partial combine on
# the collapse aggregate) + exact value parity vs the DuckDB oracle ON
# the skewed data itself.


@pytest.fixture(scope="module")
def fs_hot_block_dir(spark, tmp_path_factory):
    """A part table where ONE blocking key (brand + first letter) owns
    >99% of all candidate pairs: 200 parts share (Brand#HOT, 'a') ->
    19,900 pairs in a single block, vs 3 pairs from the cold blocks."""
    base = tmp_path_factory.mktemp("fs_skew")
    rows = []
    for i in range(200):
        rows.append(
            (
                i,
                f"alpha part {i % 4}",       # 4 name variants
                "Brand#HOT",
                f"TYPE{i % 2}",              # 2 type variants
                i % 3,                       # 3 sizes
                100.0 * (i % 2) + 50.0,      # 2 price bands
            )
        )
    for i in range(6):  # cold blocks: 3 brands x 2 parts
        rows.append(
            (1000 + i, f"zeta part {i}", f"Brand#C{i // 2}", "TYPEC", 9, 900.0)
        )
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).repartition(4).write.mode("overwrite").parquet(f"{base}/part.parquet")
    return str(base)


def test_fellegi_sunter_em_hot_block(spark, fs_hot_block_dir):
    """FS-EM under a dominant blocking key: the agreement-pattern
    aggregate must collapse the 19,903-pair space map-side (partial
    count before any exchange — the EM never sees more than 16 pattern
    rows no matter how hot the block), and the learned parameters must
    hash-match the DuckDB oracle run on the SAME skewed table."""
    import duckdb

    from tools.parity import compare

    df = load_catalog()["er_fellegi_sunter_em"].fn(spark, fs_hot_block_dir)
    rows = df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan  # pattern counts combine map-side
    assert len(rows) == 5  # prior + 4 fields, regardless of pair volume
    assert all(0 <= r["m_micro"] <= 1_000_000 for r in rows)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM '{fs_hot_block_dir}/part.parquet/*.parquet'"
    )
    res = compare(
        "er_fellegi_sunter_em",
        load_catalog()["er_fellegi_sunter_em"].fn(spark, fs_hot_block_dir),
        con,
    )
    assert res["status"] == "MATCH", res


@pytest.fixture(scope="module")
def bleu_hot_gram_dir(spark, tmp_path_factory):
    """A documents table where one token ('hot') repeats corpus-wide:
    300 docs are 60x 'hot', so every n-gram bucket for that token is
    maximally hot; 5 distinct docs ride along in a second source."""
    base = tmp_path_factory.mktemp("bleu_skew")
    docs = [(i, " ".join(["hot"] * 60), "en", "web", 4 * 60) for i in range(300)]
    for i in range(5):
        text = " ".join(f"w{i}x{j}" for j in range(40))
        docs.append((1000 + i, text, "en", "clean", len(text)))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(4).write.mode("overwrite").parquet(f"{base}/documents.parquet")
    return str(base)


def test_bleu_corpus_hot_gram(spark, bleu_hot_gram_dir):
    """Corpus BLEU under a corpus-wide repeated token: the (doc,n,gram)
    clip aggregate keys on doc_id, so the hot gram distributes across
    documents and combines map-side (partial count before the
    exchange); the output must match the DuckDB oracle on the same
    data, and the all-'hot' source's score is analytically known:
    every n-gram precision is 1.0 (candidate grams all present in the
    reference), so BLEU = brevity penalty = exp(1 - 60/48)."""
    import math

    import duckdb

    from tools.parity import compare

    df = load_catalog()["eval_bleu_corpus"].fn(spark, bleu_hot_gram_dir)
    rows = {r["source"]: r for r in df.collect()}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan  # per-doc gram counts combine map-side
    web = rows["web"]
    assert web["c_len"] == 300 * 48 and web["r_len"] == 300 * 60
    assert abs(web["bleu"] - round(math.exp(1 - 60 / 48), 6)) < 1e-6
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{bleu_hot_gram_dir}/documents.parquet/*.parquet'"
    )
    res = compare(
        "eval_bleu_corpus",
        load_catalog()["eval_bleu_corpus"].fn(spark, bleu_hot_gram_dir),
        con,
    )
    assert res["status"] == "MATCH", res


@pytest.fixture(scope="module")
def hot_segment_dir(spark, tmp_path_factory):
    """orders where ONE segment owns 99% of the rows but only 7 distinct
    prices — the shape that breaks per-row window sorts and that the
    histogram-CDF winsorize form is built for."""
    base = tmp_path_factory.mktemp("hot_segment")
    cust = [(i, f"c{i}", 0, 0.0, "BUILDING" if i < 990 else "MACHINERY")
            for i in range(1000)]
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).repartition(4).write.mode("overwrite").parquet(f"{base}/customer.parquet")
    orders = [
        (i, i % 1000, "F", float(10 * (1 + i % 7)), "2024-01-01", "1-URGENT")
        for i in range(20_000)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).repartition(
        8
    ).write.mode("overwrite").parquet(f"{base}/orders.parquet")
    return str(base)


def test_winsorize_hot_segment_collapses_before_window(spark, hot_segment_dir):
    """Winsorization under a segment holding 99% of rows: the plan must
    aggregate rows to (segment, cents) BEFORE any Window (the histogram-
    CDF form — the hot segment contributes 7 rows to the window task,
    not 19,800), and the values must hash-match the DuckDB oracle on
    the same skewed table."""
    import duckdb

    from tools.parity import compare

    df = load_catalog()["winsorize_group_clip"].fn(spark, hot_segment_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the cumulative window's input is the (segment, cents) hash
    # aggregate: a partial_count must appear, and the plan orders
    # aggregate-before-window (window input is the aggregated frame)
    assert "partial_count" in plan
    win_pos = plan.find("Window")
    agg_pos = plan.find("HashAggregate")
    assert win_pos != -1 and agg_pos != -1
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{hot_segment_dir}/{t}.parquet/*.parquet'"
        )
    res = compare(
        "winsorize_group_clip",
        load_catalog()["winsorize_group_clip"].fn(spark, hot_segment_dir),
        con,
    )
    assert res["status"] == "MATCH", res


def test_kcore_peel_hub_cascades_to_empty(spark, hub_graph):
    """k-core (k=2) under the planted >99% hub: all 300 leaves have
    degree 1 and peel in round 1, which strands the hub at degree 0 in
    round 2; the chain's ends peel first and its middle follows — the
    whole graph cascades to empty. The per-round degree aggregate must
    partially combine map-side (the hub ships partials, not its raw
    300-row fanout)."""
    from jaffle_shop_classic_spark.operators.dedup import kcore_peel

    _, edges = hub_graph
    out = kcore_peel(edges, k=2, rounds=4)
    deg = out.groupBy("src").count()
    plan = deg._jdf.queryExecution().executedPlan().toString()
    assert deg.count() == 0  # everything peeled
    assert "partial_count" in plan


def test_link_prediction_hub_bounded_by_double_cap(spark, hub_graph):
    """Link prediction under the planted >99% hub: the per-dst cap must
    bound the shared-neighbor join's build side to <=32 holders per
    neighbor (the hub's 300 leaves would otherwise fan out 300^2 wedge
    rows), and the surviving scores must be the exact capped-list
    Jaccard — every leaf pair shares exactly {hub}, so jaccard = 1.0."""
    from jaffle_shop_classic_spark.operators.dedup import (
        LP_NEIGHBOR_CAP,
        link_prediction_scores,
    )

    pairs, edges = hub_graph
    out = link_prediction_scores(pairs, edges)
    rows = out.collect()
    # candidates: C(32,2)=496 leaf pairs through the hub + (400,402)
    # through 401 — LIMIT 50 keeps the lexicographically first 50, all
    # with n_common=1 against two degree-1 capped lists -> jaccard 1.0
    assert len(rows) == 50
    assert all(r["jaccard"] == 1.0 and r["n_common"] == 1 for r in rows)
    assert all(1 <= r["doc_a"] <= LP_NEIGHBOR_CAP for r in rows)
    # the double cap itself: no neighbor node is held by more than
    # LP_NEIGHBOR_CAP capped adjacency lists (the hub's dst-side
    # multiplicity collapses 300 -> 32 before the wedge join)
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w_src = W.partitionBy("src").orderBy("dst")
    w_dst = W.partitionBy("dst").orderBy("src")
    capped = (
        edges.withColumn("rn", F.row_number().over(w_src))
        .where(F.col("rn") <= LP_NEIGHBOR_CAP)
        .select("src", "dst")
        .withColumn("rn", F.row_number().over(w_dst))
        .where(F.col("rn") <= LP_NEIGHBOR_CAP)
        .select("src", "dst")
    )
    max_holders = capped.groupBy("dst").count().agg(F.max("count")).first()[0]
    assert max_holders <= LP_NEIGHBOR_CAP


def test_ks_test_hot_price_value(spark, hot_segment_dir):
    """KS under a 7-value price grid where one segment owns 99% of rows:
    the per-value collapse bounds the window input at 7 rows, and the
    statistic still hash-matches the oracle on the skewed table."""
    import duckdb

    from tools.parity import compare

    df = load_catalog()["ks_test_two_sample"].fn(spark, hot_segment_dir)
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["n1"] + rows[0]["n2"] == 20_000
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan or "partial_sum" in plan
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{hot_segment_dir}/{t}.parquet/*.parquet'"
        )
    res = compare(
        "ks_test_two_sample",
        load_catalog()["ks_test_two_sample"].fn(spark, hot_segment_dir),
        con,
    )
    assert res["status"] == "MATCH", res
