"""Round-11 additions: advice-fix regressions + new operator value checks."""

from __future__ import annotations

import pytest

from jaffle_shop_classic_spark.operators.catalog import load_catalog


def test_decode_stub_degrades_gracefully_on_corrupt_png(spark):
    """Round-10 advice fix: a truncated/corrupt payload carrying a valid
    PNG signature must fall through to the deterministic fake branch
    instead of raising struct.error/zlib.error and failing the query."""
    from jaffle_shop_classic_spark.operators.multimodal import (
        DECODE_SCHEMA,
        decode_stub_batch,
        png_encode,
    )

    png = png_encode(5, 4, bytes(range(60)))
    truncated = png[:20]  # signature intact, IHDR/IDAT gone
    corrupt = bytearray(png)
    corrupt[40] ^= 0xFF  # garble the IDAT stream
    df = spark.createDataFrame(
        [(1, bytearray(truncated)), (2, bytes(corrupt)), (3, bytearray(png))],
        "doc_id long, payload binary",
    )
    rows = {
        r["doc_id"]: r
        for r in df.mapInPandas(decode_stub_batch, DECODE_SCHEMA).collect()
    }
    # 1 and 2 take the fake branch: geometry derives from byte length
    assert rows[1]["width"] == len(truncated) % 640
    assert rows[2]["width"] == len(corrupt) % 640
    # the intact payload still decodes for real
    assert (rows[3]["width"], rows[3]["height"]) == (5, 4)


# ---------------------------------------------------------------------------
# Integer-overflow audit (round-10 verdict item 5): the round-9 Spearman
# overflow was a class, not an instance. One planted-worst-case test per
# integer-exact operator family, each asserting the DOCUMENTED int64
# headroom bound.


def test_pagerank_int64_headroom_under_total_mass_concentration(spark):
    """PageRank integer units: total rank mass stays ~PR_SCALE (1e12)
    regardless of node count — it is a distribution, not a sum over
    rows — so the hottest possible intermediate is 85 * (all mass at
    one node) ~ 8.5e13, five decimal orders inside int64. Planted
    worst case: a star hub that receives every leaf's full contribution
    each round; values must match an exact Python simulation of the
    same integer ops bit-for-bit."""
    from pyspark.sql import functions as F

    from jaffle_shop_classic_spark.operators.dedup import PR_SCALE, pagerank_ranks

    n_leaves = 50
    pairs = [(0, leaf) for leaf in range(1, n_leaves + 1)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    got = {r["doc_id"]: r["r"] for r in pagerank_ranks(edges).collect()}

    # exact Python twin of the integer recurrence
    n = n_leaves + 1
    base = (15 * PR_SCALE) // (100 * n)
    deg = {0: n_leaves, **{leaf: 1 for leaf in range(1, n_leaves + 1)}}
    r = {v: PR_SCALE // n for v in deg}
    for _ in range(5):  # PR_ITERS
        contrib = {v: r[v] // deg[v] for v in deg}
        msgs = {0: sum(contrib[leaf] for leaf in range(1, n_leaves + 1))}
        for leaf in range(1, n_leaves + 1):
            msgs[leaf] = contrib[0]
        r = {v: base + (85 * msgs[v]) // 100 for v in deg}
    assert got == r
    # headroom: even with EVERY unit of mass at the hub, the widest
    # intermediate is 85 * mass — assert the documented 1e5x margin
    assert 85 * sum(r.values()) < 2**63 / 10**4


def test_pass_at_k_integer_exact_at_documented_headroom(spark, tmp_path):
    """pass@k millionths: the widest integer term is f*(f-1)*(f-2) with
    f <= n = samples per task, so int64 holds up to n = 2_097_151
    (n^3 < 2^63). Plant a single task at n = 2_000_000 (just inside the
    bound) and check the Spark value against exact Python arithmetic."""
    import datetime

    from pyspark.sql import functions as F

    from jaffle_shop_classic_spark.operators.catalog import load_catalog

    n, n_pass = 2_000_000, 3  # f = 1_999_997 -> f^3 ~ 8.0e18 < 2^63
    spark.createDataFrame(
        [(1, 1, "O", 10.0, datetime.datetime(1995, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    (
        spark.range(n)
        .select(
            F.lit(1).alias("l_orderkey"),
            # first n_pass lines have quantity >= 25 (the 'pass' rubric)
            F.when(F.col("id") < n_pass, 30.0).otherwise(1.0).alias("l_quantity"),
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/lineitem.parquet")
    )
    rows = load_catalog()["eval_pass_at_k"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    f = n - n_pass
    # Mirror the operator's arithmetic exactly: it casts numerator and
    # denominator to double BEFORE dividing, which differs from Python
    # big-int true division by 1 ulp at n = 2e6 (round-11 advice).
    ratio = 1.0 - float(f * (f - 1) * (f - 2)) / float(n * (n - 1) * (n - 2))
    expected = round((ratio * 1_000_000 + 0.5) // 1 / 1_000_000, 6)
    assert rows[0]["pass_at_k"] == expected
    # the documented bound itself: max n whose cube fits int64
    assert 2_097_151**3 < 2**63 <= 2_097_152**3


def test_bitmap_distinct_exact_across_int64_domain(spark, tmp_path):
    """distinct_exact_bitmap: bucket/position arithmetic is id div/mod
    32768 — safe over the full non-negative int64 id domain (no
    multiply). Plant ids at 2^62 and adjacent, with duplicates, and
    assert exact distinct counts."""
    from jaffle_shop_classic_spark.operators.catalog import load_catalog

    import datetime

    big = 2**62
    ids = [big, big, big + 1, big + 32768, 5, 5, 6]
    spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1, 0, 0, i), uid, "view", 1.0, "{}")
            for i, uid in enumerate(ids)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    rows = load_catalog()["distinct_exact_bitmap"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["n_distinct_users"] == 5 and rows[0]["n_events"] == 7


def test_histogram_bucket_assignment_at_exact_edges(spark, tmp_path):
    """histogram_order_totals: integer surface is plain counts (no
    multiply — headroom is the int64 count ceiling itself). The exact
    risk is EDGE assignment: values exactly on a bucket boundary, below
    range, and at/above the top must land deterministically in the same
    bucket in Spark and in the oracle's spelled-out floor arithmetic."""
    import datetime

    import duckdb

    from jaffle_shop_classic_spark.operators.catalog import load_catalog
    from jaffle_shop_classic_spark.operators.extensions import (
        HIST_BUCKETS,
        HIST_HI,
        HIST_LO,
    )

    width = (HIST_HI - HIST_LO) / HIST_BUCKETS
    vals = [
        HIST_LO - 1.0,  # underflow bucket 0
        HIST_LO,  # first bucket
        width,  # exactly on the 1->2 boundary
        3 * width,  # exactly on a later boundary
        HIST_HI - 0.01,  # last in-range bucket
        HIST_HI,  # overflow bucket n+1
        HIST_HI + 1.0,
    ]
    spark.createDataFrame(
        [
            (i, 1, "O", v, datetime.datetime(1995, 1, 1), "x")
            for i, v in enumerate(vals)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spec = load_catalog()["histogram_order_totals"]
    got = sorted(
        (r["bucket"], r["n"], r["lo"], r["hi"])
        for r in spec.fn(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"'{tmp_path}/orders.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert got == want
