"""Round-15 optimization invariants.

Each r15 plan change claims value-neutrality by an algebraic argument;
these tests pin the argument itself (the full query outputs are already
pinned by tests/test_oracle_parity.py):

- minhash signatures fold identically over the shingle MULTISET and the
  deduped shingle SET (min commutes with dedup) — the shared-stage
  rewrite in dedup_minhash_recall_eval depends on it;
- RM3's dl / dfreq derivations from the materialized tf frame equal the
  direct token-stream aggregates (dl = sum of tf per doc, df = rows per
  term) — the one-corpus-pass rewrite depends on it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jaffle_shop_classic_spark.operators.dedup import (
    exploded_shingles,
    load_table,
    minhash_signatures,
)
from jaffle_shop_classic_spark.operators.text import tokens_col


def test_minhash_signatures_set_equals_multiset(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    direct = minhash_signatures(d)
    sh = exploded_shingles(d).dropDuplicates(["doc_id", "s"])
    via_set = minhash_signatures(d, shingles=sh)
    a = {r["doc_id"]: tuple(r["sig"]) for r in direct.collect()}
    b = {r["doc_id"]: tuple(r["sig"]) for r in via_set.collect()}
    assert a == b


def test_rm3_tf_derivations_match_direct_aggregates(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))

    dl_direct = {
        r["doc_id"]: r["dl"]
        for r in tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl")).collect()
    }
    dl_derived = {
        r["doc_id"]: r["dl"]
        for r in tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")).collect()
    }
    assert dl_direct == dl_derived

    df_direct = {
        r["term"]: r["df"]
        for r in tok.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .collect()
    }
    df_derived = {
        r["term"]: r["df"]
        for r in tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .collect()
    }
    assert df_direct == df_derived


def test_cdc_gear_recurrence_equals_windowed_closed_form(spark):
    # dedup_cdc_chunks replan: the O(n) left-fold Gear recurrence
    # h_i = (2*h_{i-1} + g(c_i)) mod 2^31 must produce the exact
    # boundary set of the oracle's windowed closed form
    # h_i = sum_{k=0}^{min(i,31)-1} g(c_{i-k})*2^k mod 2^31 — terms
    # with k >= 31 are multiples of 2^31 and vanish under the modulus.
    import random

    from jaffle_shop_classic_spark.operators.dedup import (
        CDC_MOD,
        _CDC_M,
        _CDC_P,
    )

    rng = random.Random(7)
    strs = [
        "".join(chr(rng.randint(32, 126)) for _ in range(rng.randint(0, 200)))
        for _ in range(40)
    ]
    strs += ["", "a", "é" * 40]  # empty, single char, non-ASCII
    df = spark.createDataFrame([(s,) for s in strs], "text string")
    closed = (
        f"CASE WHEN length(text) >= 1 THEN "
        f"filter(sequence(1, length(text)), "
        f"i -> (aggregate(sequence(0, least(i, 31) - 1), 0L, "
        f"(acc, k) -> acc + ((ascii(substring(text, i - k, 1)) * {_CDC_M}L) "
        f"% {_CDC_P}L * CAST(pow(2, k) AS BIGINT)) % {_CDC_P}L)"
        f") % {_CDC_P}L % {CDC_MOD} = 0) "
        f"ELSE CAST(array() AS ARRAY<INT>) END"
    )
    rec = (
        f"CASE WHEN length(text) >= 1 THEN "
        f"aggregate(split(text, ''), "
        f"struct(CAST(0 AS BIGINT) AS h, CAST(array() AS ARRAY<INT>) AS bs, "
        f"0 AS i), "
        f"(acc, c) -> struct("
        f"(acc.h * 2 + (ascii(c) * {_CDC_M}L) % {_CDC_P}L) % {_CDC_P}L AS h, "
        f"CASE WHEN (acc.h * 2 + (ascii(c) * {_CDC_M}L) % {_CDC_P}L) "
        f"% {_CDC_P}L % {CDC_MOD} = 0 "
        f"THEN concat(acc.bs, array(acc.i + 1)) ELSE acc.bs END AS bs, "
        f"acc.i + 1 AS i), "
        f"acc -> acc.bs) "
        f"ELSE CAST(array() AS ARRAY<INT>) END"
    )
    rows = df.selectExpr(f"{closed} AS c", f"{rec} AS r").collect()
    assert len(rows) == len(strs)
    for row in rows:
        assert row.c == row.r


def test_array_intersect_equals_explode_join_count(spark, sf_dir):
    # dedup_minhash_recall_eval verify replan: for per-doc shingle SETS,
    # size(array_intersect(a, b)) over candidate pairs must equal the
    # exploded (doc, s) equi-join count — including the zero-intersection
    # pairs the inner join drops (3*0 >= la+lb is false for non-empty
    # docs, so they fall out of the threshold filter either way).
    from jaffle_shop_classic_spark.operators.dedup import (
        exploded_shingles,
        load_table,
    )

    d = load_table(spark, sf_dir, "documents").limit(80)
    sh = exploded_shingles(d).dropDuplicates(["doc_id", "s"])
    ids = [r["doc_id"] for r in sh.select("doc_id").distinct().collect()]
    pairs = spark.createDataFrame(
        [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 : i + 4]],
        "doc_a long, doc_b long",
    )
    x = sh.select(F.col("doc_id").alias("doc_a"), "s")
    y = sh.select(F.col("doc_id").alias("doc_b"), "s")
    joined = {
        (r["doc_a"], r["doc_b"]): r["n"]
        for r in pairs.join(x, "doc_a")
        .join(y, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    arr = sh.groupBy("doc_id").agg(F.collect_list("s").alias("ss"))
    via_arr = {
        (r["doc_a"], r["doc_b"]): r["n"]
        for r in pairs.join(
            arr.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("sa")),
            "doc_a",
        )
        .join(
            arr.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("sb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sa", "sb")).alias("n"),
        )
        .collect()
    }
    assert len(via_arr) > 0
    for k, n in via_arr.items():
        assert joined.get(k, 0) == n


def test_basket_pair_expansion_equals_distinct_self_join(spark, sf_dir):
    # copurchase_part_pairs replan: sorted collect_set per order +
    # slice-based pair expansion must reproduce the distinct
    # (order, part) self-join's per-pair order counts exactly.
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select("l_orderkey", "l_partkey").distinct()
    a, b = d.alias("a"), d.alias("b")
    via_join = {
        (r["part_a"], r["part_b"]): r["n"]
        for r in a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    via_arr = {
        (r["part_a"], r["part_b"]): r["n"]
        for r in baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts) - i - 1), "
                    "y -> named_struct('part_a', x, 'part_b', y))))"
                )
            ).alias("p")
        )
        .groupBy("p.part_a", "p.part_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(via_arr) > 0
    assert via_join == via_arr


def test_kmv_membership_flags_equal_per_type_distinct(spark, sf_dir):
    # sketch_kmv_intersection replan: one groupBy(h) with per-type
    # membership flags must yield the same two distinct hash sets as
    # the old per-event-type scan+distinct pipelines.
    from jaffle_shop_classic_spark.operators.mining import (
        load_table as load_mining,
    )

    ev = load_mining(spark, sf_dir, "events")
    h_expr = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h")
    )
    old_a = {
        r["h"]
        for r in ev.where(F.col("event_type") == "view")
        .select(h_expr)
        .distinct()
        .collect()
    }
    old_b = {
        r["h"]
        for r in ev.where(F.col("event_type") == "purchase")
        .select(h_expr)
        .distinct()
        .collect()
    }
    base = (
        ev.where(F.col("event_type").isin("view", "purchase"))
        .select(h_expr, F.col("event_type").alias("et"))
        .groupBy("h")
        .agg(
            F.max(F.when(F.col("et") == "view", 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("et") == "purchase", 1).otherwise(0)).alias("in_b"),
        )
        .collect()
    )
    new_a = {r["h"] for r in base if r["in_a"] == 1}
    new_b = {r["h"] for r in base if r["in_b"] == 1}
    assert old_a == new_a and old_b == new_b
    assert len(new_a) > 0 and len(new_b) > 0


def test_symmetric_moments_equal_stacked_union(spark):
    # graph_degree_assortativity replan: one-pass symmetric moments
    # over (x, y) must equal the stacked-union aggregate exactly,
    # including the decimal-exact sxx/sxy before the double cast.
    ends = spark.createDataFrame(
        [(3, 7), (2, 2), (9, 1), (4, 6), (123456, 7890)], "x long, y long"
    )
    stacked = ends.unionByName(
        ends.select(F.col("y").alias("x"), F.col("x").alias("y"))
    )
    old = stacked.agg(
        F.count(F.lit(1)).cast("bigint").alias("m2"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("sxy"),
    ).collect()[0]
    new = ends.agg(
        (F.count(F.lit(1)) * 2).cast("bigint").alias("m2"),
        (F.sum("x") + F.sum("y")).cast("bigint").alias("sx"),
        (
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
            + F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        )
        .cast("double")
        .alias("sxx"),
        (F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")) * 2)
        .cast("double")
        .alias("sxy"),
    ).collect()[0]
    assert old.m2 == new.m2 and old.sx == new.sx
    assert old.sxx == new.sxx and old.sxy == new.sxy


def test_numpy_bit_partials_equal_jvm_conditional_aggregates(spark, sf_dir):
    # ab_randomization_test replan: the mapInPandas numpy reduction
    # (bits x values matrix product per Arrow batch, summed across
    # partitions) must equal the r14 JVM conditional aggregates
    # sum(v * bit_b) / sum(bit_b) exactly, bit for bit, including the
    # grand totals row and the observed g==1 cell lane (row n_b+1).
    from pyspark.sql import functions as F

    from jaffle_shop_classic_spark.operators.mining import (
        RAND_TEST_B,
        _rand_test_partials,
        load_table,
    )

    n_words = (RAND_TEST_B + 31) // 32
    o = load_table(spark, sf_dir, "orders")
    hashed = o.select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_custkey") % 2).cast("int").alias("g"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("v"),
    ).selectExpr(
        "v",
        "g",
        *[
            f"CAST(conv(substring(md5(CAST(k AS STRING)), {1 + 8 * i}, 8), "
            f"16, 10) AS BIGINT) AS w{i}"
            for i in range(n_words)
        ],
    )
    aggs = []
    for b in range(RAND_TEST_B):
        gb = f"(shiftright(w{b // 32}, {31 - b % 32}) & 1)"
        aggs.append(F.expr(f"sum(v * {gb})").cast("bigint").alias(f"s{b}"))
        aggs.append(F.expr(f"sum({gb})").cast("bigint").alias(f"n{b}"))
    aggs.append(F.sum("v").cast("bigint").alias("s_all"))
    aggs.append(F.count(F.lit(1)).cast("bigint").alias("n_all"))
    aggs.append(F.expr("sum(v * g)").cast("bigint").alias("s_obs"))
    aggs.append(F.expr("sum(g)").cast("bigint").alias("n_obs"))
    old = hashed.agg(*aggs).collect()[0]
    new = {
        r["b"]: (r["s"], r["n"])
        for r in hashed.mapInPandas(
            _rand_test_partials(RAND_TEST_B, n_words),
            schema="b int, s long, n long",
        )
        .groupBy("b")
        .agg(
            F.sum("s").cast("bigint").alias("s"),
            F.sum("n").cast("bigint").alias("n"),
        )
        .collect()
    }
    for b in range(RAND_TEST_B):
        assert new[b] == (old[f"s{b}"], old[f"n{b}"]), f"replicate {b}"
    assert new[RAND_TEST_B] == (old["s_all"], old["n_all"])
    assert new[RAND_TEST_B + 1] == (old["s_obs"], old["n_obs"])
