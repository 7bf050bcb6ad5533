"""Engine-side VALUE checks for catalog entries whose output has no
portable DuckDB oracle (engine-internal RNG / hash functions). The
driver records these as rows-only; these tests pin their semantics
anyway:

- sim_ml_lsh_bucketed: precision is EXACT by construction (the approx
  join's final distance filter recomputes true distances), so zero
  false pairs is a hard assertion; recall vs the brute-force pair set
  is deterministic at a fixed seed (0.93 measured), pinned at >=0.85.
- sample_seeded_random: Spark's Bernoulli sampler is deterministic for
  a fixed (seed, partitioning), so two invocations must return the
  identical row set, and the count must sit in a 4-sigma Chernoff band
  around fraction*n.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jaffle_shop_classic_spark.operators.catalog import load_catalog
from jaffle_shop_classic_spark.sources.parquet import load_table

ML_LSH_THRESHOLD = 1.25  # must match q_sim_ml_lsh_bucketed


def _exact_euclidean_pairs(spark, sf_dir, threshold):
    e = load_table(spark, sf_dir, "embeddings")
    a, b = e.alias("a"), e.alias("b")
    d2 = F.aggregate(
        F.zip_with(
            F.col("a.embedding"),
            F.col("b.embedding"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return {
        (r["va"], r["vb"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            F.sqrt(d2).alias("d"),
        )
        .filter(F.col("d") <= threshold)
        .collect()
    }


def test_ml_lsh_exact_precision_and_pinned_recall(spark, sf_dir):
    got = {
        (r["vec_a"], r["vec_b"])
        for r in load_catalog()["sim_ml_lsh_bucketed"].fn(spark, sf_dir).collect()
    }
    exact = _exact_euclidean_pairs(spark, sf_dir, ML_LSH_THRESHOLD)
    assert exact, "fixture produced no close pairs — test is vacuous"
    # precision: the approx join's distCol filter is exact, so every
    # reported pair must be a true pair
    assert got <= exact
    # recall: deterministic at seed=42 on immutable test data; measured
    # 0.932 at sf0.001 and 0.931 at sf0.01 with 3 hash tables
    recall = len(got & exact) / len(exact)
    assert recall >= 0.85, f"LSH recall collapsed: {recall:.3f}"


def test_ml_lsh_distances_match_brute_force(spark, sf_dir):
    """The dist column itself must equal the true euclidean distance
    (4dp) — approxSimilarityJoin reports exact distances, not
    estimates."""
    rows = load_catalog()["sim_ml_lsh_bucketed"].fn(spark, sf_dir).collect()
    sample = sorted(rows, key=lambda r: (r["vec_a"], r["vec_b"]))[:50]
    e = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    for r in sample:
        want = sum((float(x) - float(y)) ** 2 for x, y in zip(e[r["vec_a"]], e[r["vec_b"]])) ** 0.5
        assert abs(r["euclidean_dist"] - round(want, 4)) <= 1e-4


def test_sample_seeded_random_deterministic_and_in_band(spark, sf_dir):
    fn = load_catalog()["sample_seeded_random"].fn
    s1 = {r["doc_id"] for r in fn(spark, sf_dir).collect()}
    s2 = {r["doc_id"] for r in fn(spark, sf_dir).collect()}
    assert s1 == s2  # fixed seed + fixed partitioning => identical set
    n = load_table(spark, sf_dir, "documents").count()
    mean, frac = n * 0.2, 0.2
    sigma = (n * frac * (1 - frac)) ** 0.5
    assert abs(len(s1) - mean) <= 4 * sigma, (len(s1), mean, sigma)
