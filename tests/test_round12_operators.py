"""Round-12 additions: advice-fix regressions + new operator value checks."""

from __future__ import annotations

import struct
import zlib

import pytest


def _png_payload(ihdr_body: bytes, raw: bytes) -> bytes:
    from jaffle_shop_classic_spark.operators import multimodal as mm

    return (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr_body)
        + mm._png_chunk(b"IDAT", zlib.compress(raw))
        + mm._png_chunk(b"IEND", b"")
    )


def test_png_decode_short_idat_is_value_error_not_index_error(spark):
    """Round-11 advice (medium): a payload with a valid PNG signature and
    valid-zlib IDAT shorter than the IHDR-declared height used to raise
    IndexError at raw[y*(stride+1)], escaping the graceful-degrade tuple
    in the batch kernels and failing the whole query."""
    from jaffle_shop_classic_spark.operators import multimodal as mm

    # IHDR declares 4x5 gray (needs 5*(4+1)=25 raw bytes); IDAT carries 10
    short = _png_payload(struct.pack(">IIBBBBB", 4, 5, 8, 0, 0, 0, 0), bytes(10))
    with pytest.raises(ValueError, match="IDAT length"):
        mm.png_decode(short)

    # crafted IHDR declaring absurd dimensions must not try to allocate
    huge = _png_payload(
        struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 0, 0, 0, 0), b""
    )
    with pytest.raises(ValueError, match="decode budget"):
        mm.png_decode(huge)

    # and the batch kernel degrades to the deterministic fake branch
    df = spark.createDataFrame(
        [(1, bytearray(short)), (2, bytearray(huge))],
        "doc_id long, payload binary",
    )
    rows = {
        r["doc_id"]: r
        for r in df.mapInPandas(mm.decode_stub_batch, mm.DECODE_SCHEMA).collect()
    }
    assert rows[1]["width"] == len(short) % 640
    assert rows[2]["width"] == len(huge) % 640


def test_substring_dup_spans_recovers_planted_overlaps(spark):
    """Exact substring dedup (Lee et al. ExactSubstr analog): plant a
    40-char string shared verbatim by two documents at different
    offsets, a 29-char shared string (below the 30-char threshold), and
    two disjoint shared spans inside one document — the operator must
    emit exactly the maximal spans at their exact (start, length)."""
    from jaffle_shop_classic_spark.operators.dedup import substring_dup_spans

    shared40 = "THE-QUICK-BROWN-FOX-JUMPS-OVER-LAZY-DOGS"  # 40 chars
    assert len(shared40) == 40
    shared29 = "x" * 29
    other35 = "PACK-MY-BOX-WITH-FIVE-DOZEN-JUGS-OK"  # 35 chars
    assert len(other35) == 35
    # fillers from disjoint alphabets so no accidental 30-gram collisions
    docs = spark.createDataFrame(
        [
            # shared40 at 1-based pos 11; shared29 tails doc 1 only
            (1, "aAbBcCdDeE" + shared40 + "fFgGhHiIjJ" + shared29),
            # shared40 at pos 21; other35 at pos 20+40+6+1 = 67
            (2, "kKlLmMnNoOpPqQrRsStT" + shared40 + "uUvVwW"
             + other35 + "zZyYxX"),
            # other35 at pos 6; shared29 tails doc 3 (still < threshold)
            (3, "01234" + other35 + "56789" + shared29),
            (4, "entirely unique text with no repeats anywhere at all ok"),
        ],
        "doc_id long, text string",
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in substring_dup_spans(docs, 30).collect()
    }
    assert spans == {
        (1, 11, 40),
        (2, 21, 40),
        (2, 67, 35),
        (3, 6, 35),
    }


def test_gopher_rules_flag_each_planted_violation(spark, tmp_path):
    """Gopher quality gate: one document per rule violation, each
    engineered to fail EXACTLY that rule (others hold), plus one clean
    passer — the per-rule booleans must isolate the planted defect."""
    from jaffle_shop_classic_spark.operators.catalog import load_catalog

    good_words = ("the quick brown foxes jumped over that lazy hound "
                  "keeping pace with every passing season ") * 6  # 60 words
    docs = {
        1: good_words,  # passes everything
        2: "the of and that have with just a few words here",  # 11 words < 50
        3: ("#### " + good_words).replace("jumped", "####ed"),  # symbol spam
        4: " ".join(["12345"] * 30 + good_words.split()[:30]),  # 50% non-alpha
        5: " ".join(["zq"] * 60),  # mean word length 2 < 3, no stopwords
        6: "\n".join(["- bullet line of the have"] * 10),  # 100% bullets
        7: "\n".join([f"the sentence number {i} trails off..." for i in range(10)]),
    }
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in load_catalog()["quality_gopher_rules"].fn(spark, str(tmp_path)).collect()
    }
    assert rows[1]["pass_gopher"], rows[1]
    assert not rows[2]["words_in_range"] and rows[2]["stopwords_ok"]
    assert not rows[3]["symbol_ratio_ok"]
    assert not rows[4]["alpha_ratio_ok"] and rows[4]["words_in_range"]
    assert not rows[5]["mean_word_len_ok"] and not rows[5]["stopwords_ok"]
    assert not rows[6]["bullet_ok"]
    assert not rows[7]["ellipsis_ok"]
    for i in range(2, 8):
        assert not rows[i]["pass_gopher"], i


def test_dsir_importance_matches_exact_python_twin(spark, tmp_path):
    """DSIR importance weights: plant a corpus where the target (en)
    docs share one bigram vocabulary and the off-target docs another,
    then check every Spark score bit-for-bit against a Python twin that
    mirrors the operator's arithmetic (md5 bucket fold, one ln per
    bucket, micro-unit requantization, integer sums) — and that the
    ordering separates target-like from off-target docs."""
    import hashlib
    import math

    from jaffle_shop_classic_spark.operators.catalog import load_catalog
    from jaffle_shop_classic_spark.operators.text import DSIR_BUCKETS

    docs = [
        (1, "alpha beta alpha beta alpha", "en"),
        (2, "alpha beta gamma", "en"),
        (3, "gamma delta gamma delta", "de"),
        (4, "delta gamma delta", "de"),
        (5, "alpha beta epsilon zeta", "fr"),  # target-like content
    ]
    spark.createDataFrame(
        [(i, t, lang, "src0", len(t)) for i, t, lang in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    rows = {
        r["doc_id"]: r
        for r in load_catalog()["sample_dsir_importance"]
        .fn(spark, str(tmp_path))
        .collect()
    }

    def bucket(bg: str) -> int:
        return int(hashlib.md5(bg.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS

    n_raw: dict[int, int] = {}
    n_tgt: dict[int, int] = {}
    per_doc: dict[int, list[int]] = {}
    for doc_id, text, lang in docs:
        toks = text.split()
        for a, b in zip(toks, toks[1:]):
            bk = bucket(f"{a} {b}")
            n_raw[bk] = n_raw.get(bk, 0) + 1
            if lang == "en":
                n_tgt[bk] = n_tgt.get(bk, 0) + 1
            per_doc.setdefault(doc_id, []).append(bk)
    tot_raw, tot_tgt = sum(n_raw.values()), sum(n_tgt.values())
    w_int = {
        bk: int(
            round(
                math.log(
                    (float(n_tgt.get(bk, 0) + 1) * float(tot_raw + DSIR_BUCKETS))
                    / (float(n_raw[bk] + 1) * float(tot_tgt + DSIR_BUCKETS))
                )
                * 1000000.0
            )
        )
        for bk in n_raw
    }
    for doc_id, _, _ in docs:
        expected = round(sum(w_int[bk] for bk in per_doc[doc_id]) / 1000000.0, 6)
        assert rows[doc_id]["dsir_score"] == expected, doc_id
        assert rows[doc_id]["n_bigrams"] == len(per_doc[doc_id])
    # target-vocabulary docs outrank off-target ones, and the fr doc
    # with target-like content scores above the pure off-target docs
    assert min(rows[1]["dsir_score"], rows[2]["dsir_score"]) > max(
        rows[3]["dsir_score"], rows[4]["dsir_score"]
    )
    assert rows[5]["dsir_score"] > max(rows[3]["dsir_score"], rows[4]["dsir_score"])


def test_stream_legacy_pending_adopted_when_its_batches_exist(spark, tmp_path):
    """Round-11 advice (low): a LEGACY pending file (pre-'checkpoint'-key
    format) left by a run that crashed after committing batches but
    before the generation flip used to be treated as foreign on resume
    (pending_ckpt None != ckpt_id), silently deleted, and the resume fell
    back to the prior generation — leaving that generation's stale
    higher-numbered batch dirs live (duplicate rows). The migration path
    adopts a checkpoint-less pending IFF batch dirs stamped with its
    generation already exist on disk."""
    import json
    import os

    from pyspark.sql import functions as F

    from jaffle_shop_classic_spark.sources.jsonl_sink import (
        GENERATION_FILE,
        GENERATION_PENDING_FILE,
        read_all_batches,
        write_stream_exactly_once,
    )

    src = str(tmp_path / "src")

    def add_file(i):
        spark.range(i * 10, i * 10 + 10).select(
            F.col("id").alias("k")
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}")

    def start(checkpoint):
        q = write_stream_exactly_once(
            spark.readStream.schema("k bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*"),
            sink,
            checkpoint,
        )
        q.awaitTermination(120)

    sink = str(tmp_path / "sink")
    for i in range(2):
        add_file(i)
    # run 1 (ckpt1): batches 0,1 live as generation 1
    start(str(tmp_path / "ckpt1"))
    # fresh restart (ckpt2): reprocesses everything as generation 2
    add_file(2)
    start(str(tmp_path / "ckpt2"))
    gpath = os.path.join(sink, GENERATION_FILE)
    ppath = os.path.join(sink, GENERATION_PENDING_FILE)
    with open(gpath) as f:
        assert json.load(f)["generation"] == 2

    # rewind disk to the legacy crash-pre-flip state: live file still at
    # generation 1, pending staged in the OLD format (no checkpoint key),
    # batch dirs already stamped with generation 2
    with open(gpath, "w") as f:
        json.dump({"generation": 1}, f)
    with open(ppath, "w") as f:
        json.dump({"generation": 2}, f)

    # resume ckpt2: the checkpoint-less pending is adoptable because its
    # generation's batches exist — flip completes on the next commit
    add_file(3)
    start(str(tmp_path / "ckpt2"))
    with open(gpath) as f:
        assert json.load(f)["generation"] == 2
    assert not os.path.exists(ppath)
    got, rows = read_all_batches(spark, sink)
    assert rows == 40 and sorted(r["k"] for r in got.collect()) == list(range(40))

    # a checkpoint-less pending with NO batches stamped by it is still
    # foreign: dropped, generation unchanged
    with open(ppath, "w") as f:
        json.dump({"generation": 9}, f)
    add_file(4)
    start(str(tmp_path / "ckpt2"))
    assert not os.path.exists(ppath)
    with open(gpath) as f:
        assert json.load(f)["generation"] == 2
    got2, rows2 = read_all_batches(spark, sink)
    assert rows2 == 50 and sorted(r["k"] for r in got2.collect()) == list(range(50))


def test_bm25_matches_exact_python_twin(spark, tmp_path):
    """Okapi BM25: plant a corpus where term frequency and document
    length pull in opposite directions, then check every score against
    a Python twin that mirrors the operator's arithmetic exactly
    (Lucene idf, 9dp HALF_UP contribution rounding, exact decimal sum,
    6dp final round) — and that length normalization actually demotes
    the padded document."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from jaffle_shop_classic_spark.operators.catalog import load_catalog
    from jaffle_shop_classic_spark.operators.text import BM25_B, BM25_K1

    pad = " ".join(["filler"] * 200)
    docs = {
        0: "spark shuffle spark join spark agg",  # query doc
        1: "spark shuffle join agg",  # short, all query terms once
        2: "spark spark spark shuffle shuffle join " + pad,  # high tf, padded
        3: "spark join",  # short, two terms
        4: "filler only document with no query words",
        5: "shuffle shuffle shuffle shuffle agg",  # tf saturation case
    }
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = {
        r["doc_id"]: r["bm25"]
        for r in load_catalog()["retrieval_bm25_topk"].fn(spark, str(tmp_path)).collect()
    }

    def r_half_up(x: float, n: int) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP)
        )

    toks = {i: t.strip().split() for i, t in docs.items()}
    tf = {
        i: {w: ts.count(w) for w in set(ts)} for i, ts in toks.items()
    }
    dl = {i: len(ts) for i, ts in toks.items()}
    n_docs = len(dl)
    avgdl = float(sum(dl.values())) / n_docs
    df: dict[str, int] = {}
    for ts in tf.values():
        for w in ts:
            df[w] = df.get(w, 0) + 1
    # query = doc 0's top-8 terms by (tf desc, term asc) — doc 0 has 4
    q = sorted(tf[0], key=lambda w: (-tf[0][w], w))[:8]
    expect: dict[int, float] = {}
    for i in range(1, 6):
        contribs = []
        for w in q:
            if w not in tf[i]:
                continue
            idf = math.log(1.0 + (n_docs - df[w] + 0.5) / (df[w] + 0.5))
            c = (
                idf
                * (tf[i][w] * (BM25_K1 + 1.0))
                / (tf[i][w] + BM25_K1 * (1.0 - BM25_B + BM25_B * dl[i] / avgdl))
            )
            contribs.append(Decimal(repr(r_half_up(c, 9))))
        if contribs:
            expect[i] = r_half_up(float(sum(contribs)), 6)
    assert got == expect  # doc 4 matches no query term: absent both sides
    # the padded high-tf doc must rank below the short exact-match doc
    assert got[1] > got[2]


def test_winnowing_guarantee_and_hot_cap(spark, tmp_path):
    """Winnowing (Schleimer et al. 2003): (a) any token run of length
    >= K+W-1 shared verbatim by two documents must yield >= 1 shared
    fingerprint (the paper's coverage guarantee) — with >= MIN_SHARED
    met here, the pair must surface; (b) documents with no shared
    K-gram share nothing; (c) a fingerprint bucket hotter than the cap
    is dropped, so a 70-document boilerplate cluster produces NO pairs
    from the boilerplate run alone."""
    from jaffle_shop_classic_spark.operators.catalog import load_catalog
    from jaffle_shop_classic_spark.operators.dedup import (
        MAX_BAND_SIZE,
        WINNOW_K,
        WINNOW_W,
    )

    run = " ".join(f"shared{i}" for i in range(2 * (WINNOW_K + WINNOW_W - 1)))
    boiler = " ".join(f"boiler{i}" for i in range(WINNOW_K + WINNOW_W - 1))
    docs = [
        (1, "alpha beta gamma " + run + " delta"),
        (2, run + " epsilon zeta eta theta iota"),
        (3, "kappa lam mu nu xi omicron pi rho sigma tau"),  # disjoint
    ]
    # 70 docs (> MAX_BAND_SIZE) sharing ONLY the boilerplate run, each
    # padded with a unique tail so they share nothing else
    assert MAX_BAND_SIZE < 70
    docs += [
        (100 + i, boiler + f" unique{i}a unique{i}b unique{i}c unique{i}d")
        for i in range(70)
    ]
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    rows = (
        load_catalog()["dedup_winnowing_fingerprints"].fn(spark, str(tmp_path)).collect()
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["shared_fps"] for r in rows}
    # (a) the long shared run surfaces the (1, 2) pair
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    # (b) doc 3 shares no K-gram with anything
    assert not any(3 in p for p in pairs)
    # (c) the boilerplate cluster's only shared content sits in a
    # fingerprint bucket of 70 > cap — dropped, so no 100-series pairs
    assert not any(a >= 100 or b >= 100 for a, b in pairs)


def test_pca_power_matches_numpy_on_planted_direction(spark, tmp_path):
    """PCA power iteration: plant a 64-dim corpus with one dominant
    variance direction (big eigengap, so 12 power iterations converge
    far past the rounding grain), then check the operator's loadings
    and eigenvalue against numpy's exact eigendecomposition of the SAME
    quantized integer covariance the operator defines."""
    import numpy as np

    from jaffle_shop_classic_spark.operators.catalog import load_catalog
    from jaffle_shop_classic_spark.operators.similarity import (
        _PCA_SCALE,
        _PCA_SCALE_SQ,
        PCA_DIM,
    )

    rng = np.random.RandomState(7)
    u = rng.randn(PCA_DIM)
    u /= np.linalg.norm(u)
    # dominant direction variance ~0.04, isotropic noise variance 1e-4
    data = (
        np.outer(rng.randn(300) * 0.2, u) + rng.randn(300, PCA_DIM) * 0.01
    ).astype(np.float32)
    spark.createDataFrame(
        [(i, [float(x) for x in row], 0) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")

    rows = (
        load_catalog()["embedding_pca_power"]
        .fn(spark, str(tmp_path))
        .orderBy("dim")
        .collect()
    )
    got = np.array([r["loading"] for r in rows])
    got_eig = rows[0]["eigenvalue"]

    # numpy twin of the operator's definition: floor-quantized ints,
    # covariance in original units
    xq = np.floor(data.astype(np.float64) * _PCA_SCALE)
    n = xq.shape[0]
    s = xq.T @ xq
    m = xq.sum(axis=0)
    cov = (s - np.outer(m, m) / n) / n / _PCA_SCALE_SQ
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    # sign: power iteration starts from all-positive, so align signs
    if np.dot(got, top) < 0:
        top = -top
    assert np.abs(np.dot(got, top)) > 0.999999, np.dot(got, top)
    assert abs(got_eig - evals[-1]) < 1e-6, (got_eig, evals[-1])
    # and the planted direction is what it found
    assert abs(abs(np.dot(got, u)) - 1.0) < 1e-2


def test_vocab_unseen_estimate_exact_counts(spark, tmp_path):
    """Good-Turing/Chao1: plant a corpus with a known
    frequency-of-frequencies profile (3 hapaxes, 2 doubletons, 1
    triple) and check every output, then the no-doubleton
    bias-corrected Chao1 branch."""
    from jaffle_shop_classic_spark.operators.catalog import load_catalog

    def write(docs, sub):
        d = tmp_path / sub
        spark.createDataFrame(
            [(i, t, "en", "src0", len(t)) for i, t in docs],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        return str(d)

    # tokens: a,b,c once; d,e twice; f three times -> N=10, V=6
    p = write([(1, "a b c d e f"), (2, "d e f"), (3, "f")], "case1")
    row = load_catalog()["vocab_unseen_estimate"].fn(spark, p).collect()[0]
    assert row["n_tokens"] == 10 and row["v_observed"] == 6
    assert row["v_hapax"] == 3 and row["v_dis"] == 2
    assert row["p_unseen_gt"] == 0.3  # 3/10
    assert row["chao1_richness"] == 6 + 3 * 3 / (2 * 2)  # 8.25

    # no doubletons: V1=2, V2=0 -> chao1 = V + V1(V1-1)/2 = 4 + 1
    p = write([(1, "x y z z"), (2, "z w w w")], "case2")
    row = load_catalog()["vocab_unseen_estimate"].fn(spark, p).collect()[0]
    assert row["v_hapax"] == 2 and row["v_dis"] == 0
    assert row["chao1_richness"] == 5.0
