"""Property-based tests (hypothesis) for the check framework and the
portable-hash dedup primitives — invariants that must hold for ANY data,
not just the fixtures."""

from __future__ import annotations

import hashlib

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jaffle_shop_classic_spark.testing import checks

ids = st.lists(st.one_of(st.integers(-50, 50), st.none()), min_size=0, max_size=30)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(vals=ids)
@SLOW
def test_unique_check_matches_python_multiset(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "id: int") if vals else spark.createDataFrame(
        [], "id: int"
    )
    viol = {(r["value"], r["n_rows"]) for r in checks.unique(df, "id").collect()}
    counts: dict[int, int] = {}
    for v in vals:
        if v is not None:
            counts[v] = counts.get(v, 0) + 1
    want = {(k, n) for k, n in counts.items() if n > 1}
    assert viol == want


@given(vals=ids)
@SLOW
def test_not_null_count_matches(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "id: int") if vals else spark.createDataFrame(
        [], "id: int"
    )
    assert checks.not_null(df, "id").count() == sum(1 for v in vals if v is None)


@given(child=ids, parent=ids)
@SLOW
def test_relationships_matches_set_difference(spark, child, parent):
    cdf = spark.createDataFrame([(v,) for v in child], "fk: int") if child else spark.createDataFrame(
        [], "fk: int"
    )
    pdf = spark.createDataFrame([(v,) for v in parent], "pk: int") if parent else spark.createDataFrame(
        [], "pk: int"
    )
    viol = [r["fk"] for r in checks.relationships(cdf, "fk", pdf, "pk").collect()]
    pset = {v for v in parent if v is not None}
    want = [v for v in child if v is not None and v not in pset]
    assert sorted(viol) == sorted(want)


@given(
    words=st.lists(
        st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=3, max_size=12
    )
)
@SLOW
def test_minhash_signature_matches_python_reference(spark, words):
    """The Spark minhash must equal a direct python implementation of the
    same definition (shingle set -> min per 8-hex-char lane of
    md5(s)||md5('x'||s)) for any token sequence."""
    from pyspark.sql import functions as F

    from jaffle_shop_classic_spark.operators.dedup import (
        NUM_HASHES,
        minhash_sig,
        shingles_col,
    )

    text = " ".join(words)
    df = spark.createDataFrame([(text,)], ["text"])
    got = df.select(minhash_sig(shingles_col(F.col("text"))).alias("s")).collect()[0]["s"]
    toks = text.split()
    sh = (
        {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        if len(toks) >= 3
        else {text.strip()}
    )
    def lane(s: str, i: int) -> str:
        hh = (
            hashlib.md5(s.encode()).hexdigest()
            + hashlib.md5(f"x{s}".encode()).hexdigest()
        )
        return hh[8 * i : 8 * i + 8]

    want = [min(lane(s, i) for s in sh) for i in range(NUM_HASHES)]
    assert got == want


_edges = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=30,
)

_FAST = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(raw=_edges)
@_FAST
def test_star_cc_matches_union_find(spark, raw):
    """Star contraction must equal a direct union-find on ANY graph —
    the adversarial check for the trickiest iterative algorithm (random
    topologies, multi-edges, arbitrary component shapes)."""
    from jaffle_shop_classic_spark.operators.dedup import star_components

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw})
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["component_id"] for r in star_components(pairs).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    # normalize: component id = min node of the component
    comp_min: dict[int, int] = {}
    for n, r in want.items():
        comp_min[find(r)] = min(comp_min.get(find(r), n), n)
    want = {n: comp_min[find(n)] for n in want}
    assert got == want


_bpe_words = st.lists(
    st.sampled_from(["ab", "abc", "bc", "aab", "b", "cab", "abab"]),
    min_size=3,
    max_size=12,
)


@given(words=_bpe_words)
@_FAST
def test_bpe_train_matches_python_reference(spark, words):
    """The distributed BPE merge loop must equal a direct python BPE on
    ANY corpus — including tie-breaks, overlap handling ('abab'), and
    early pair exhaustion."""
    import os
    import tempfile

    from jaffle_shop_classic_spark.operators.text import (
        BPE_MERGES,
        q_tokenizer_bpe_train,
    )

    text = " ".join(words)
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame([(0, text)], "doc_id long, text string").write.parquet(
            os.path.join(tmp, "documents.parquet")
        )
        got = [
            (r["merge_rank"], r["a"], r["b"], r["cnt"])
            for r in q_tokenizer_bpe_train(spark, tmp).collect()
        ]

    # python reference: word-frequency table, '|'-delimited symbols,
    # left-to-right non-overlapping replace
    freq: dict[str, int] = {}
    for w in text.split():
        freq[w] = freq.get(w, 0) + 1
    sym = {w: "|" + "|".join(w) + "|" for w in freq}
    want = []
    for k in range(1, BPE_MERGES + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, n in freq.items():
            parts = sym[w].split("|")[1:-1]
            for i in range(len(parts) - 1):
                counts[(parts[i], parts[i + 1])] = (
                    counts.get((parts[i], parts[i + 1]), 0) + n
                )
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        want.append((k, a, b, cnt))
        sym = {
            w: s.replace(f"|{a}|{b}|", f"|{a}{b}|") for w, s in sym.items()
        }
    assert got == want


# ------------------------------------------------------- round-5 operators
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1)),
        min_size=1,
        max_size=25,
    )
)
@SLOW
def test_zorder_interleave_matches_python_reference(spark, pairs):
    """The Morton key must equal the textbook bit-interleave, and be
    monotone under quadrant refinement (equal high bits of (x,y) =>
    adjacent z-range) — verified by exact value equality with the
    Python reference."""
    from pyspark.sql import functions as F

    from jaffle_shop_classic_spark.operators.extensions import _zvalue

    def py_z(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(pairs, "x: long, y: long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", _zvalue(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in pairs:
        assert got[(x, y)] == py_z(x, y)


@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 3),  # user
            st.integers(0, 20),  # time
            st.sampled_from(["a", "b", "c"]),  # state
        ),
        min_size=1,
        max_size=25,
    )
)
@SLOW
def test_scd2_intervals_partition_each_users_timeline(spark, events):
    """SCD2 output invariants for ANY event stream: per user, intervals
    are non-overlapping, contiguous (each valid_to == next valid_from),
    exactly one open row, consecutive states differ, and replaying the
    intervals reproduces the state at every event time."""
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=t), u, s, 1.0, "{}")
        for i, (u, t, s) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        df.select(
            "user_id", F.col("event_type").alias("state"), "ts", "event_id",
            F.lag("event_type").over(w).alias("prev_state"),
        )
        .filter(F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state")))
        .select("user_id", "state", F.col("ts").alias("valid_from"), "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    nxt = F.lead("valid_from").over(w2)
    out = changes.select(
        "user_id", "state", "valid_from", nxt.alias("valid_to"), nxt.isNull().alias("is_current")
    ).collect()

    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r["valid_from"])
        assert sum(1 for r in rs if r["is_current"]) == 1
        assert rs[-1]["valid_to"] is None
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"]  # contiguous, non-overlapping
            assert a["state"] != b["state"]  # versions only on change
    # replay: the interval covering each event's ts must carry its state
    # (ties broken by event order: the last change at a given ts wins)
    latest = {}
    for i, (u, t, s) in enumerate(events):
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=t)
        key = (u, ts)
        latest[key] = s  # max event_id at that (user, ts) wins
    for (u, ts), s in latest.items():
        rs = by_user[u]
        covering = [
            r for r in rs if r["valid_from"] <= ts and (r["valid_to"] is None or ts < r["valid_to"])
        ]
        assert len(covering) == 1
        assert covering[0]["state"] == s


# -- jsonl_manifest round-trip: ANY flat rows survive write+read ---------

_json_text = st.text(
    # JSON-legal but adversarial: unicode, quotes, newlines, backslashes
    alphabet=st.characters(blacklist_categories=("Cs",)),
    max_size=40,
)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(-(2**63), 2**63 - 1),
            st.one_of(st.none(), _json_text),
            st.one_of(
                st.none(),
                st.floats(allow_nan=False, allow_infinity=False, width=64),
            ),
        ),
        min_size=0,
        max_size=25,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_jsonl_manifest_round_trips_any_flat_rows(spark, tmp_path_factory, rows):
    """write.format('jsonl_manifest') -> read.format('jsonl_manifest')
    is identity for any flat (bigint, string, double) rows — unicode,
    embedded quotes/newlines, int64 extremes, NULLs, empty frame."""
    from jaffle_shop_classic_spark.sources.jsonl_sink import (
        JsonlManifestDataSource,
    )

    spark.dataSource.register(JsonlManifestDataSource)
    schema = "k bigint, s string, x double"
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path_factory.mktemp("jm") / "rt")
    df.write.format("jsonl_manifest").option("path", out).mode("append").save()
    back = spark.read.format("jsonl_manifest").load(out)
    assert back.schema == df.schema

    def key(t):  # None-safe total order across the nullable columns
        return (
            t[0],
            t[1] is not None,
            t[1] or "",
            t[2] is not None,
            t[2] if t[2] is not None else 0.0,
        )

    assert sorted(map(tuple, back.collect()), key=key) == sorted(
        map(tuple, rows), key=key
    )


@given(
    prices=st.lists(
        st.integers(1, 500),  # daily revenue in dollars, any shape of series
        min_size=1,
        max_size=25,
    )
)
@SLOW
@pytest.mark.slow  # ~90 s brute-force pin; opt-in tier (pytest.ini)
def test_cusum_prefix_min_rewrite_matches_recursion(spark, prices):
    """The window rewrite S_t = cum_t - min(0, min prefix cum) must equal
    the textbook clamped fold S_t = max(0, S_{t-1} + x_t - k) for ANY
    series — the identity cusum_revenue_shift's plan depends on."""
    import datetime

    from pyspark.sql import functions as F

    from jaffle_shop_classic_spark.operators.catalog import load_catalog

    rows = [
        (
            i,
            i,
            "F",
            float(p),
            datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i),
            "1-URGENT",
        )
        for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    import os
    import tempfile

    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    got = load_catalog()["cusum_revenue_shift"].fn(spark, d).collect()
    cents = [p * 100 for p in prices]
    k = sum(cents) // len(cents)
    s, ref = 0, []
    for x in cents:
        s = max(0, s + x - k)
        ref.append(s)
    assert [r["s_cents"] for r in got] == ref
    assert [r["flagged"] for r in got] == [v > k for v in ref]


@given(
    prices=st.lists(st.integers(1, 50), min_size=1, max_size=40),
)
@SLOW
@pytest.mark.slow  # ~190 s brute-force pin; opt-in tier (pytest.ini)
def test_winsorize_matches_python_order_statistics(spark, prices):
    """The histogram-CDF thresholds must equal the direct order
    statistics v[ceil(p*n)] for ANY multiset of prices, and the clip
    counters / winsorized total must match a plain Python fold."""
    import math
    import os
    import tempfile

    from pyspark.sql import functions as F

    from jaffle_shop_classic_spark.operators.catalog import load_catalog

    d = tempfile.mkdtemp()
    n = len(prices)
    cust = [(i, f"c{i}", 0, 0.0, "SEG") for i in range(n)]
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    orders = [
        (i, i, "F", float(p), "2024-01-01", "1-URGENT") for i, p in enumerate(prices)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    r = load_catalog()["winsorize_group_clip"].fn(spark, d).collect()[0]
    cents = sorted(p * 100 for p in prices)
    lo = cents[math.ceil(n / 20) - 1]
    hi = cents[math.ceil(19 * n / 20) - 1]
    assert (r["lo_cents"], r["hi_cents"]) == (lo, hi)
    assert r["n_clipped_low"] == sum(1 for v in cents if v < lo)
    assert r["n_clipped_high"] == sum(1 for v in cents if v > hi)
    want_total = round(sum(min(hi, max(lo, v)) for v in cents) / 100.0, 2)
    assert r["winsorized_total"] == want_total


@given(
    w=st.integers(min_value=1, max_value=13),
    h=st.integers(min_value=1, max_value=13),
    color_type=st.sampled_from([0, 2, 6]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, color_type, seed):
    """Property: png_decode(png_encode(px)) == px for arbitrary
    geometry, any supported color type, and arbitrary pixel bytes —
    the encoder cycles all five scanline filters, so every (w, h >= 5)
    case exercises the full filter set in both directions."""
    import random

    from jaffle_shop_classic_spark.operators.multimodal import (
        _PNG_CHANNELS,
        png_decode,
        png_encode,
    )

    rng = random.Random(seed)
    ch = _PNG_CHANNELS[color_type]
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    dw, dh, dch, out = png_decode(png_encode(w, h, px, color_type))
    assert (dw, dh, dch) == (w, h, ch)
    assert out == px
