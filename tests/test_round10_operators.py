"""Value-level tests for round-10 operators."""

from pyspark.sql import functions as F

from jaffle_shop_classic_spark.operators.catalog import load_catalog


def test_kcore_fixpoint_outruns_bounded_peel(spark):
    """A 12-node path peels one vertex from each end per round (6 rounds
    to empty) — the bounded 4-round peel leaves a residue, while the
    fixpoint runs until the probe stops and returns only the attached
    triangle. This is exactly the gap the fixpoint twin exists to close."""
    from jaffle_shop_classic_spark.operators.dedup import kcore_fixpoint, kcore_peel

    path = [(i, i + 1) for i in range(12)]  # 13 nodes, ends deg 1
    tri = [(100, 101), (101, 102), (100, 102)]
    edges = spark.createDataFrame(path + tri, "src long, dst long")
    edges = edges.unionByName(edges.selectExpr("dst AS src", "src AS dst"))

    residue = kcore_peel(edges, k=2, rounds=4).where("src < 100").count()
    assert residue > 0  # bounded peel hasn't finished the chain

    out, rounds_run = kcore_fixpoint(edges, k=2)
    got = {r["src"]: r["deg"] for r in out.groupBy("src").agg(
        F.count(F.lit(1)).alias("deg")).collect()}
    assert got == {100: 2, 101: 2, 102: 2}
    assert rounds_run <= 8


def test_png_codec_roundtrip_all_filters_and_color_types():
    """The stdlib PNG codec must invert every scanline filter (the
    encoder cycles 0..4 per row) for gray, RGB, and RGBA — byte-exact
    roundtrip on a pattern with enough rows to hit all five filters."""
    from jaffle_shop_classic_spark.operators.multimodal import png_decode, png_encode

    for color_type, ch in ((0, 1), (2, 3), (6, 4)):
        w, h = 7, 11  # 11 rows -> every filter type used at least twice
        px = bytes(
            (x * 31 + y * 17 + c * 53) % 256
            for y in range(h)
            for x in range(w)
            for c in range(ch)
        )
        dw, dh, dch, out = png_decode(png_encode(w, h, px, color_type))
        assert (dw, dh, dch) == (w, h, ch)
        assert out == px


def test_png_decode_rejects_unsupported_features():
    from jaffle_shop_classic_spark.operators.multimodal import png_decode, png_encode
    import pytest

    with pytest.raises(ValueError):
        png_decode(b"not a png at all, clearly")
    # palette PNG (color type 3) is outside the envelope: splice the
    # IHDR of a valid file
    good = bytearray(png_encode(2, 2, bytes(12)))
    good[8 + 4 + 4 + 9] = 3  # IHDR color-type byte
    with pytest.raises(NotImplementedError):
        png_decode(bytes(good))


def test_decode_stub_batch_decodes_real_png_payloads(spark):
    """decode_stub_batch's PNG branch: a real PNG payload must come back
    with its true geometry (not the fake's n_bytes-derived one)."""
    from jaffle_shop_classic_spark.operators.multimodal import (
        DECODE_SCHEMA,
        decode_stub_batch,
        png_encode,
    )

    png = png_encode(5, 4, bytes(range(60)))
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"plain text payload"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in df.mapInPandas(decode_stub_batch, DECODE_SCHEMA).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (5, 4, 3)
    assert rows[2]["channels"] == 3 and rows[2]["width"] == len(b"plain text payload") % 640


def test_mm_decode_png_means_match_closed_form(spark, tmp_path):
    """The catalog entry's decoded means must equal the closed-form
    pixel-pattern means — computed independently here in Python."""
    spark.createDataFrame(
        [(i, "x") for i in range(6)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = load_catalog()["mm_decode_png"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 6
    for r in rows:
        d = r["doc_id"]
        w, h = 4 + d % 5, 3 + d % 4
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        n = w * h
        exp_r = round(sum((x + y + d) % 256 for y in range(h) for x in range(w)) / n, 4)
        exp_g = round(sum((2 * x + 3 * y) % 256 for y in range(h) for x in range(w)) / n, 4)
        exp_b = round(sum((x * y + 7) % 256 for y in range(h) for x in range(w)) / n, 4)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (exp_r, exp_g, exp_b)


def test_link_prediction_true_intersection_values(spark):
    """The round-9 advice fix made n_common the TRUE intersection of
    both endpoints' capped lists. Planted: u=0 with neighbors
    {10,11,12}, v=1 with {11,12,13}, u and v non-adjacent -> the (0,1)
    prediction must score n_common=2 (shared {11,12}), n_union=4,
    jaccard=0.5."""
    from jaffle_shop_classic_spark.operators.dedup import link_prediction_scores

    raw = [(0, 10), (0, 11), (0, 12), (1, 11), (1, 12), (1, 13)]
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in raw], "doc_a long, doc_b long"
    )
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in link_prediction_scores(pairs, edges).collect()
    }
    r01 = rows[(0, 1)]
    assert r01["n_common"] == 2 and r01["n_union"] == 4
    assert r01["jaccard"] == 0.5


def test_kcore_fixpoint_converges_inside_oracle_unroll(spark):
    """The catalog entry's oracle unrolls KCORE_FIXPOINT_ORACLE_ROUNDS
    peel rounds; the unrolled form equals the true fixpoint only if the
    live graph converges within that depth — assert it does at sf0.001,
    with margin."""
    from jaffle_shop_classic_spark.operators.dedup import (
        KCORE_FIXPOINT_ORACLE_ROUNDS,
        _lsh_candidate_pairs,
        _symmetric_edges,
        kcore_fixpoint,
    )

    edges = _symmetric_edges(_lsh_candidate_pairs(spark, "/root/testdata/sf0.001"))
    _, rounds_run = kcore_fixpoint(edges)
    assert rounds_run <= KCORE_FIXPOINT_ORACLE_ROUNDS - 2


def test_pass_at_k_estimator_values(spark, tmp_path):
    """Planted tasks with known (n, c): n=4,c=1 -> 1 - C(3,3)/C(4,3) =
    0.75; n=3,c=0 -> 0; n=3,c=3 -> 1. One priority per task keeps the
    groups separable."""
    orders, lines = [], []
    specs = [("1-URGENT", 4, 1), ("2-HIGH", 3, 0), ("3-MEDIUM", 3, 3)]
    lid = 0
    for oid, (prio, n, c) in enumerate(specs):
        orders.append((oid, 0, "F", 1.0, "2024-01-01", prio))
        for i in range(n):
            qty = 30.0 if i < c else 1.0
            lines.append((oid, lid, 1, 1, qty, 10.0, 0.0, 0.0, "N", "O", "2024-01-02"))
            lid += 1
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate string, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    rows = {
        r["priority"]: r["pass_at_k"]
        for r in load_catalog()["eval_pass_at_k"].fn(spark, str(tmp_path)).collect()
    }
    assert rows == {"1-URGENT": 0.75, "2-HIGH": 0.0, "3-MEDIUM": 1.0}


def test_cohens_kappa_known_table(spark, tmp_path):
    """Hand-checkable contingency: labels derive from n_chars % 3 and
    (n_chars + doc_id) % 3 — choose rows so annotators agree on 2 of 4
    docs with known marginals: po=0.5, pe=(2*2 + 1*1 + 1*1)/16=0.375,
    kappa=(0.5-0.375)/(1-0.375)=0.2."""
    # (doc_id, n_chars): ann_a = n_chars%3, ann_b = (n_chars+doc_id)%3
    rows = [(0, 3), (3, 3), (1, 1), (2, 2)]
    # a: 0,0,1,2  b: 0,0,2,1 -> agree 2; a-marg (2,1,1), b-marg (2,1,1)
    spark.createDataFrame(
        [(d, "x" * n, "en", "s", n) for d, n in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = load_catalog()["eval_cohens_kappa"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["p_observed"], r["p_expected"], r["kappa"]) == (0.5, 0.375, 0.2)


def test_bradley_terry_dominant_source_wins(spark, tmp_path):
    """A source whose docs are always longer must come out with the
    highest strength; strengths are positive and sum to ~1."""
    docs = []
    for i in range(60):
        src = ("big", "mid", "small")[i % 3]
        n = {"big": 300 + i, "mid": 200 + i, "small": 100 + i}[src]
        docs.append((i, "t", "en", src, n))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = load_catalog()["rank_bradley_terry"].fn(spark, str(tmp_path)).collect()
    assert [r["source"] for r in rows][0] == "big"
    total = sum(r["strength"] for r in rows)
    assert abs(total - 1.0) < 1e-4
    assert rows[0]["strength"] > rows[-1]["strength"]


def test_char_entropy_gate_flags_degenerate_text(spark, tmp_path):
    """'aaaa...' has 0 entropy and must be flagged; varied text clears
    the gate; empty text yields NULLs."""
    import math

    docs = [
        (0, "a" * 50, "en", "s", 50),
        (1, "the quick brown fox jumps over the lazy dog with zeal", "en", "s", 53),
        (2, "", "en", "s", 0),
        (3, "ababababab", "en", "s", 10),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in load_catalog()["text_char_entropy_gate"].fn(spark, str(tmp_path)).collect()
    }
    assert rows[0]["entropy_bits"] == 0.0 and rows[0]["is_low_entropy"] is True
    assert rows[1]["entropy_bits"] > 3.5 and rows[1]["is_low_entropy"] is False
    assert rows[2]["entropy_bits"] is None and rows[2]["is_low_entropy"] is None
    assert rows[3]["entropy_bits"] == round(math.log2(2), 6) == 1.0
    assert rows[3]["is_low_entropy"] is True


def test_mcnemar_discordant_counts_and_significance(spark, tmp_path):
    """30 docs with n_chars = doc_id: a_ok = id%5 in {0,1,2} (18 true),
    b_ok = id%3 in {0,1} (20 true). Discordants: b = a and not b,
    c = b and not a — hand-enumerated below; chi2 = (b-c)^2/(b+c)."""
    ids = list(range(30))
    b = sum(1 for i in ids if i % 5 in (0, 1, 2) and i % 3 == 2)
    c = sum(1 for i in ids if i % 5 in (3, 4) and i % 3 in (0, 1))
    spark.createDataFrame(
        [(i, "t", "en", "s", i) for i in ids],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = load_catalog()["eval_mcnemar_test"].fn(spark, str(tmp_path)).collect()[0]
    assert (r["b_discordant"], r["c_discordant"]) == (b, c)
    assert r["chi2_statistic"] == round((b - c) ** 2 / (b + c), 6)
    assert r["significant_05"] is False  # b+c < 25 on 30 docs


def test_f1_identity_on_planted_confusion(spark, tmp_path):
    """Planted verdicts with a known 3x3 confusion matrix; F1 must equal
    2tp/(2tp+fp+fn) per class, cross-checked against sklearn-style
    hand computation."""
    rows, did = [], 0
    # (y_true, y_pred, count): y_true=n%3, y_pred=(n+d)%3 -> choose n, d
    for y_true, y_pred, count in [(0, 0, 5), (0, 1, 2), (1, 1, 4), (2, 0, 3), (2, 2, 6)]:
        for _ in range(count):
            n = [3, 4, 5][y_true]  # n % 3 == y_true
            d = (y_pred - n) % 3
            while d < did:  # keep doc_ids unique with d % 3 preserved
                d += 3
            rows.append((d, "t", "en", "s", n))
            did = d + 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["cls"]: r for r in load_catalog()["eval_f1_per_class"].fn(spark, str(tmp_path)).collect()}
    # class 0: tp=5 fp=3 fn=2 -> f1 = 10/15; class 1: tp=4 fp=2 fn=0;
    # class 2: tp=6 fp=0 fn=3
    assert (out[0]["tp"], out[0]["fp"], out[0]["fn"]) == (5, 3, 2)
    assert out[0]["f1"] == round(10 / 15, 6)
    assert (out[1]["tp"], out[1]["fp"], out[1]["fn"]) == (4, 2, 0)
    assert out[1]["f1"] == round(8 / 10, 6)
    assert (out[2]["tp"], out[2]["fp"], out[2]["fn"]) == (6, 0, 3)
    assert out[2]["f1"] == round(12 / 15, 6)


def test_minplus_fixpoint_idempotent_inside_oracle_unroll(spark):
    """The fixpoint result at sf0.001 must equal an explicit
    MINPLUS_FIXPOINT_ORACLE_ROUNDS-round bounded unrolling — proving
    convergence lands inside the oracle's unroll depth (rounds past the
    fixpoint are idempotent)."""
    from jaffle_shop_classic_spark.operators.mining import (
        KHOP_MIN_SUPPORT,
        MINPLUS_FIXPOINT_ORACLE_ROUNDS,
        _copurchase_pairs,
    )

    sf = "/root/testdata/sf0.001"
    fix = {
        (r["node"], r["dist"])
        for r in load_catalog()["graph_minplus_fixpoint"].fn(spark, sf).collect()
    }
    p = _copurchase_pairs(spark, sf, KHOP_MIN_SUPPORT).select(
        "pa", "pb", (101 - F.least(F.col("cnt"), F.lit(100))).cast("bigint").alias("w")
    )
    e = p.selectExpr("pa AS s", "pb AS t", "w").unionAll(
        p.selectExpr("pb AS s", "pa AS t", "w")
    )
    cur = e.agg(F.min("s").alias("node")).select(
        "node", F.lit(0).cast("bigint").alias("dist")
    )
    for _ in range(MINPLUS_FIXPOINT_ORACLE_ROUNDS):
        relaxed = (
            e.join(cur.hint("broadcast"), e["s"] == cur["node"])
            .select(F.col("t").alias("node"), (cur["dist"] + e["w"]).alias("dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        cur = relaxed.unionAll(cur).groupBy("node").agg(F.min("dist").alias("dist"))
        cur = cur.localCheckpoint(eager=False)
    bounded = {(r["node"], r["dist"]) for r in cur.collect()}
    assert fix == bounded


def test_mm_resize_png_nearest_neighbor_values(spark, tmp_path):
    """The resized means must equal the pattern evaluated at the
    nearest-neighbor index map sx = tx*w//tw, sy = ty*h//th — computed
    independently here."""
    from jaffle_shop_classic_spark.operators.multimodal import (
        MM_RESIZE_TH,
        MM_RESIZE_TW,
    )

    spark.createDataFrame(
        [(i, "x") for i in range(5)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = load_catalog()["mm_resize_png"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 5
    for r in rows:
        d = r["doc_id"]
        w, h = 4 + d % 5, 3 + d % 4
        coords = [
            ((tx * w) // MM_RESIZE_TW, (ty * h) // MM_RESIZE_TH)
            for ty in range(MM_RESIZE_TH)
            for tx in range(MM_RESIZE_TW)
        ]
        n = len(coords)
        assert (r["src_w"], r["src_h"]) == (w, h)
        assert r["mean_r"] == round(sum((x + y + d) % 256 for x, y in coords) / n, 4)
        assert r["mean_g"] == round(sum((2 * x + 3 * y) % 256 for x, y in coords) / n, 4)
        assert r["mean_b"] == round(sum((x * y + 7) % 256 for x, y in coords) / n, 4)


def test_kmv_intersection_exact_when_sets_fit_inside_k(spark, tmp_path):
    """With both distinct-user sets below k=256, theta covers the full
    hash domain, every common hash is retained, and the estimate
    DEGRADES TO EXACT: est == exact == |A ∩ B| (planted overlap 40)."""
    rows, eid = [], 0
    for u in range(100):  # viewers 0..99
        rows.append((eid, "2024-01-01 00:00:00", u, "view", 1.0, "{}")); eid += 1
    for u in range(60, 180):  # purchasers 60..179 -> overlap 60..99 = 40
        rows.append((eid, "2024-01-01 00:00:00", u, "purchase", 1.0, "{}")); eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = load_catalog()["sketch_kmv_intersection"].fn(spark, str(tmp_path)).collect()[0]
    assert r["exact_intersection"] == 40
    assert r["n_retained"] == 40
    assert r["est_intersection"] == 40.0
    assert r["theta"] == 4294967296
