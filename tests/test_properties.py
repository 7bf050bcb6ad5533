"""Property-based tests (hypothesis) for the check framework and the
portable-hash dedup primitives — invariants that must hold for ANY data,
not just the fixtures."""

from __future__ import annotations

import hashlib

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
