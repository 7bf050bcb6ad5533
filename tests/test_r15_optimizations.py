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
