"""Round-14 planted regression tests for the r13 ADVICE.md findings."""

from __future__ import annotations

from jaffle_shop_classic_spark.operators.catalog import load_catalog


def _write_docs(spark, tmp_path, docs):
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def test_cdc_chunks_handles_empty_text(spark, tmp_path):
    """Empty text must not evaluate the rolling hash on Spark's
    descending sequence(1, 0) = [1, 0] (DuckDB's range(1,1) is empty).
    The guard makes the boundary list empty, so the only chunk is the
    empty substring, filtered by CDC_MIN_LEN — and duplicated long text
    still dedups."""
    dup = "the same shared sentence appears verbatim in both docs"
    _write_docs(spark, tmp_path, {1: "", 2: dup, 3: dup, 4: " "})
    rows = (
        load_catalog()["dedup_cdc_chunks"].fn(spark, str(tmp_path)).collect()
    )
    # no chunk fingerprint may come from the empty/whitespace docs
    assert all(r["chunk_len"] >= 16 for r in rows)
    assert any(r["occ"] == 2 and r["docs"] == 2 for r in rows), rows


def test_cdc_empty_text_boundary_list_is_empty(spark):
    """The guarded boundary expression itself (not just the filtered
    output) yields [] for empty text — asserting the CASE guard, which
    CDC_MIN_LEN previously masked."""
    # reproduce the descending-sequence hazard in isolation
    df = spark.sql(
        "SELECT CASE WHEN length('') >= 1 THEN sequence(1, length('')) "
        "ELSE CAST(array() AS ARRAY<INT>) END AS b"
    )
    assert df.collect()[0]["b"] == []
    # and confirm the hazard is real: unguarded sequence(1, 0) descends
    assert spark.sql("SELECT sequence(1, 0) AS s").collect()[0]["s"] == [1, 0]


def test_mmr_complement_full_precision():
    """MMR_MU must be the exact complement of MMR_LAMBDA, not a
    1-decimal rounding of it (which silently mis-weights any future
    lambda with more decimals)."""
    from jaffle_shop_classic_spark.operators import similarity as sim

    assert sim.MMR_MU == 1 - sim.MMR_LAMBDA


def test_verbatim_ref_entries_degrade_loudly_without_checkout(
    spark, sf_dir, monkeypatch
):
    """The two verbatim-reference-file entries must fail with a clear,
    named error (not a deep ENOENT) when /root/reference is absent —
    and the catalog itself must stay loadable."""
    import pytest

    from jaffle_shop_classic_spark.operators import relational

    monkeypatch.setattr(
        relational, "_REF_MODELS_DIR", "/nonexistent/reference/models"
    )
    cat = load_catalog()  # loads fine regardless
    for name in ("sql_model_orders_mart", "jinja_model_customers_mart"):
        with pytest.raises(FileNotFoundError, match="reference models dir"):
            cat[name].fn(spark, sf_dir)


def test_hits_init_survives_many_nodes(spark):
    """h0's unit is greatest(SCALE, n): with n > HITS_SCALE a naive
    SCALE div n zeroes all hub mass and the first normalizer
    divides by zero. Exercise the kernel expression at a planted
    n > SCALE without materializing 1e6 rows by shrinking the check to
    the expression level."""
    from jaffle_shop_classic_spark.operators.dedup import HITS_SCALE

    n = HITS_SCALE * 10
    row = spark.sql(
        f"SELECT greatest({HITS_SCALE}L, {n}L) div {n}L AS h"
    ).collect()[0]
    assert row["h"] == 1  # unit mass survives; naive form would be 0


def test_wordpiece_greedy_longest_match(spark, tmp_path):
    """Greedy must take the longest in-vocab prefix: with 'abcd' and
    'abce' sharing 'abc' (3 words needed for a multi-char piece, so
    plant 3 carriers), 'abcd' segments abc|d (2 pieces), never
    a|b|c|d."""
    _write_docs(
        spark,
        tmp_path,
        {1: "abcd abce abcf", 2: "abcd abcd abcd", 3: "zz"},
    )
    rows = {
        r["doc_id"]: r
        for r in load_catalog()["tokenizer_wordpiece_encode"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    # doc 2: three occurrences of abcd -> 3 words, 3 * (abc|d) = 6 pieces
    assert rows[2]["n_words"] == 3 and rows[2]["n_wordpieces"] == 6, rows[2]
    # doc 3: zz -> z|z (no multi-char piece reaches 3 distinct words)
    assert rows[3]["n_words"] == 1 and rows[3]["n_wordpieces"] == 2, rows[3]


def test_unigram_viterbi_beats_greedy(spark, tmp_path):
    """Viterbi is globally optimal: construct a word where greedy
    longest-match-first yields MORE pieces than the optimum. With
    pieces {ab, cde} frequent and 'abc' also frequent, greedy on
    'abcde' takes abc|de or abc|d|e while Viterbi can take ab|cde
    (2 pieces). Assert the unigram path segments 'abcde' into 2."""
    filler = " ".join(["ab"] * 10 + ["cde"] * 10 + ["abc"] * 10)
    _write_docs(spark, tmp_path, {1: filler, 2: "abcde"})
    rows = {
        r["doc_id"]: r
        for r in load_catalog()["tokenizer_unigram_viterbi"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert rows[2]["n_subwords"] == 2, rows[2]


def test_simhash_hamming_finds_near_identical_docs(spark, tmp_path):
    """Two docs differing by one token out of many have hamming <= 3
    on the 64-bit fingerprint and must surface as a pair; unrelated
    docs must not."""
    base = " ".join(f"tok{i}" for i in range(120))
    near = " ".join(f"tok{i}" for i in range(119)) + " changed"
    other = " ".join(f"zzz{i}" for i in range(120))
    _write_docs(spark, tmp_path, {1: base, 2: near, 3: other})
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in load_catalog()["dedup_simhash_hamming_pairs"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert (1, 2) in pairs, pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs, pairs
