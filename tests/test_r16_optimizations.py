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
    exploded_shingles,
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


def test_sparse_tfidf_df_from_tf_equals_distinct_count(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    tok = d.transform(exploded_shingles).select(
        "doc_id", F.col("s").alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_direct = {
        r["term"]: r["df"]
        for r in tok.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .collect()
    }
    df_derived = {
        r["term"]: r["df"]
        for r in tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    assert df_direct == df_derived
