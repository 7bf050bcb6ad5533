"""Round-16 optimization invariants.

Each r16 plan change claims value-neutrality by an algebraic argument;
these tests pin the argument itself (the full query outputs are already
pinned by tests/test_oracle_parity.py):

- the capped LSH candidate generation's basket-array expansion emits
  exactly the pairs of the windowed-cap + band_key self-join it
  replaced, including under a hot bucket that exceeds the cap and a
  pathological duplicated bucket member;
- sim_sparse_tfidf_pairs' df derived from the tf frame equals the
  direct count(DISTINCT doc_id) over the raw token stream (tf holds
  exactly one row per (doc, term) present).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jaffle_shop_classic_spark.operators.dedup import (
    candidate_pairs,
    load_table,
)


def _join_form_pairs(bands, cap):
    """The pre-r16 capped candidate generation: windowed hot-band cap +
    band_key self-join (reimplemented verbatim as the test oracle)."""
    w = Window.partitionBy("band_key")
    sized = (
        bands.withColumn("band_n", F.count(F.lit(1)).over(w))
        .filter(F.col("band_n") <= cap)
        .drop("band_n")
    )
    x, y = sized.alias("x"), sized.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def test_basket_candidate_pairs_equal_join_form_synthetic(spark):
    # bucket "hot" has 5 members (over cap=4 -> dropped entirely),
    # bucket "b1" has 3 (all pairs), "b2" has 2, "b3" has 1 (no pair),
    # "b4" carries a duplicated member (band-hash collision stand-in:
    # must not emit a self-pair), and pair (1,2) appears in two buckets
    # (distinct must fold it).
    rows = (
        [(i, "hot") for i in range(5)]
        + [(1, "b1"), (2, "b1"), (3, "b1")]
        + [(1, "b2"), (2, "b2")]
        + [(9, "b3")]
        + [(7, "b4"), (7, "b4"), (8, "b4")]
    )
    bands = spark.createDataFrame(rows, "doc_id long, band_key string")
    cap = 4
    got = {
        (r["doc_a"], r["doc_b"])
        for r in candidate_pairs(bands, cap=cap).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"])
        for r in _join_form_pairs(bands, cap).collect()
    }
    assert got == want
    assert (1, 2) in got and (7, 8) in got
    assert all(a < b for a, b in got)
    # docs 0 and 4 exist ONLY in the over-cap bucket: no pair may
    # reference them (the cap dropped the bucket before expansion)
    assert not any(0 in p or 4 in p for p in got)


def test_basket_candidate_pairs_equal_join_form_corpus(spark, sf_dir):
    from jaffle_shop_classic_spark.operators.dedup import (
        _bands_expr,
        minhash_signatures,
    )

    d = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(d)
    bands = sigs.selectExpr(
        "doc_id", f"explode({_bands_expr('sig')}) AS band_key"
    )
    got = {
        (r["doc_a"], r["doc_b"]) for r in candidate_pairs(bands).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"]) for r in _join_form_pairs(bands, 64).collect()
    }
    assert got == want and got


# (a df-from-tf identity test lived here while sim_sparse_tfidf_pairs
# briefly derived df from the tf frame; the rewrite LOST its cross-
# commit A/B — see OPTIMIZATION_r16.md — and was reverted, so the pin
# went with it)


def test_lpa_argmax_aggregate_equals_window(spark):
    # ties on cnt must break to the MIN label; max_by over
    # struct(cnt, -label) must match the row_number window exactly
    rows = [
        (1, 10, 3), (1, 7, 3), (1, 99, 2),   # tie on cnt=3 -> label 7
        (2, 5, 1),                            # singleton
        (3, 4, 2), (3, 4, 2),                 # duplicate rows same label
        (4, 8, 5), (4, 2, 5), (4, 1, 5),      # three-way tie -> label 1
    ]
    counts = spark.createDataFrame(rows, "doc_id long, label long, cnt long")
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    via_window = {
        r["doc_id"]: r["label"]
        for r in counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    via_agg = {
        r["doc_id"]: r["label"]
        for r in counts.groupBy("doc_id")
        .agg(F.expr("max_by(label, struct(cnt, -label))").alias("label"))
        .collect()
    }
    assert via_window == via_agg
    assert via_agg[1] == 7 and via_agg[4] == 1


def test_copurchase_half_mirror_equals_selfjoin_pairs(spark):
    """recommend_copurchase_topk r16 pair rewrite: the sorted-basket
    a < b expansion + symmetric mirror must emit exactly the (x, y, n)
    multiset of the distinct + self-join (x != y) form, including under
    duplicate lineitem rows (collect_set dedups like DISTINCT did) and
    single-part orders (no pairs)."""
    rows = [
        (1, 10), (1, 20), (1, 30), (1, 20),  # dup (1,20) must not inflate n
        (2, 20), (2, 10),
        (3, 40),                              # singleton basket -> no pairs
        (4, 10), (4, 20),
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    old = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_x"),
            F.col("b.l_partkey").alias("part_y"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )

    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    pair_half = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts) - i - 1), "
                    "y -> named_struct('part_x', x, 'part_y', y))))"
                )
            ).alias("p")
        )
        .select("p.part_x", "p.part_y")
        .groupBy("part_x", "part_y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    new = pair_half.unionByName(
        pair_half.select(
            F.col("part_y").alias("part_x"), F.col("part_x").alias("part_y"), "n"
        )
    )

    old_rows = sorted(map(tuple, old.collect()))
    new_rows = sorted(map(tuple, new.collect()))
    assert old_rows == new_rows
    assert (10, 20, 3) in old_rows  # orders 1, 2, 4 share {10, 20}
