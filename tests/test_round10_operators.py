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
