"""UDF/UDAF surface X16 + composite patterns (as-of join, unpivot).

UDF policy (SURVEY §2.4, pyspark guide): built-ins first; when Python is
genuinely needed, Arrow-batched pandas UDFs only — never row-at-a-time.
The pandas UDFs here intentionally compute things SQL *can* express, so
the DuckDB oracle can certify the plumbing end-to-end (serialization,
batching, null handling); real deployments put the non-SQL logic
(model scoring, tokenizers) in the same shells.

The as-of join is the one operator here Spark lacks natively: expressed
as union + last-non-null window — pure DataFrame ops, one shuffle on
(user_id), no pandas. DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..sources.parquet import load_table
from .catalog import register


# pandas UDFs are created inside the query functions: the decorator
# parses its return type against the active SparkContext, and the
# catalog imports before any session exists.


def _make_scaled_log_price():
    @F.pandas_udf("double")
    def scaled_log_price(price: pd.Series) -> pd.Series:
        import numpy as np

        # np.log(x + 1), NOT log1p: the oracle computes ln(x + 1), and
        # the two formulas differ in last bits for large x — mirroring
        # the formula removes the divergence before the 4dp round
        return np.log(price + 1.0) * 100.0

    return scaled_log_price


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT o_orderkey AS order_id,
           round(ln(o_totalprice + 1) * 100.0, 4) AS scaled_log_price
    FROM orders
    """,
    doc="X16: scalar pandas UDF (Arrow-batched, vectorized numpy body) — "
    "the sanctioned shape for custom per-row Python. Oracle-certified "
    "because the body is SQL-expressible; swap in model scoring etc.",
)
def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    udf = _make_scaled_log_price()
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        F.round(udf("o_totalprice"), 4).alias("scaled_log_price"),
    )


def _make_weighted_avg_price():
    @F.pandas_udf("double")
    def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
        s = float(qty.sum())
        return float((price * qty).sum() / s) if s else float("nan")

    return weighted_avg_price


@register(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT l_returnflag AS flag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="X16: grouped-aggregate pandas UDF (a UDAF) — one Arrow batch per "
    "group feeds a scalar-returning kernel.",
)
def q_udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    udaf = _make_weighted_avg_price()
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.round(udaf("l_extendedprice", "l_quantity"), 4).alias("weighted_avg_price")
    )


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mean = pdf["value"].mean()
    # population std (ddof=0) to match the SQL oracle's stddev_pop; for a
    # constant-valued group stddev_pop = 0 and the oracle's division
    # yields NULL, so assign None (an object column Arrow converts to
    # SQL NULL). Rounding happens OUTSIDE the kernel with F.round:
    # pandas .round is binary half-even while DuckDB/F.round round the
    # decimal repr half-away — a near-boundary zscore would diverge.
    std = pdf["value"].std(ddof=0)
    if std:
        pdf["zscore"] = (pdf["value"] - mean) / std
    else:
        pdf["zscore"] = None  # oracle: x / stddev_pop(...)=0 -> NULL
    return pdf[["event_id", "event_type", "zscore"]]


@register(
    "udf_apply_in_pandas",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_pop(value) OVER (PARTITION BY event_type), 4) AS zscore
    FROM events
    """,
    doc="X16: applyInPandas grouped-map — per-group pandas DataFrame "
    "transform (z-score normalization per event_type). One shuffle on "
    "the group key; each group must fit in one worker's memory, which "
    "is the documented constraint of this operator class.",
)
def q_udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    raw = e.groupBy("event_type").applyInPandas(
        _zscore_group, "event_id long, event_type string, zscore double"
    )
    # F.round (decimal half-away, like the oracle) — never pandas .round
    return raw.select(
        "event_id", "event_type", F.round("zscore", 4).alias("zscore")
    )


def _make_installment_udtf():
    # created inside the query fn (not at import) for the same reason as
    # the pandas UDFs above: decorator-time schema parsing wants a live
    # session, and the catalog imports before one exists
    @F.udtf(returnType="installment_no int, amount_cents bigint", useArrow=True)
    class InstallmentPlan:
        """Split an integer-cent total into 3 installments, remainder on
        the first — one input row expands to a variable-shape row SET,
        which is exactly what a table function expresses and a scalar
        UDF cannot."""

        def eval(self, total_cents):
            if total_cents is None:
                return
            base = total_cents // 3
            yield 1, total_cents - 2 * base
            yield 2, base
            yield 3, base

    return InstallmentPlan


@register(
    "udtf_installment_plan",
    oracle="""
    SELECT o_orderkey AS order_id, CAST(i AS INT) AS installment_no,
           CASE WHEN i = 1
                THEN cents - 2 * (cents // 3)
                ELSE cents // 3 END AS amount_cents
    FROM (SELECT o_orderkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM orders)
    CROSS JOIN generate_series(1, 3) t(i)
    """,
    doc="X16: Python user-defined TABLE function (Spark 4 `@udtf`, "
    "Arrow-optimized) driven through a LATERAL correlated join — the "
    "row-set-producing member of the UDF surface next to scalar, "
    "grouped-agg, and grouped-map (none of which can emit a variable "
    "number of rows per input). The body is integer-cent installment "
    "expansion, deliberately SQL-expressible so the DuckDB oracle "
    "(CROSS JOIN generate_series) certifies the plumbing: eval-per-row "
    "iteration, Arrow batch transfer, lateral column correlation, and "
    "the cents conversion pinned engine-identically via "
    "floor(x*100 + 0.5) (a bare round() half-up/half-even split and a "
    "bare cast truncate/round split both diverge across engines). At "
    "scale a UDTF is map-side row expansion — no shuffle, parallel by "
    "input partition, the same execution shape as explode() but with "
    "arbitrary Python generating the rows.",
)
def q_udtf_installment_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Repartition to core count BEFORE the lateral: a Python UDTF's
    # throughput is bounded by Python workers, one per input partition —
    # the sf0.1 orders file is a single parquet split, so without this
    # the whole expansion ran in ONE worker (measured 19 s; with 32
    # partitions 1.7 s, 11x). The tiny keys-only shuffle is the standard
    # price for sizing a Python-bound stage by cores rather than input
    # bytes; at cluster scale the scan already arrives in many splits
    # and the same sizing rule applies to executor cores.
    o = load_table(spark, sf_dir, "orders").repartition(
        spark.sparkContext.defaultParallelism
    )
    spark.udtf.register("jaffle_installments", _make_installment_udtf())
    return spark.sql(
        """
        SELECT o.o_orderkey AS order_id, i.installment_no, i.amount_cents
        FROM {o} o,
             LATERAL jaffle_installments(
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) i
        """,
        o=o,
    )


# ---------------------------------------------------------------- as-of join
@register(
    "asof_join_last_signup",
    oracle="""
    SELECT e.event_id, e.user_id, s.signup_ts
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') e
    ASOF LEFT JOIN
         (SELECT user_id, ts AS signup_ts FROM events WHERE event_type = 'signup') s
      ON e.user_id = s.user_id AND e.ts >= s.signup_ts
    """,
    doc="As-of join (Spark has no native one): for each purchase, the "
    "most recent prior signup of the same user. Implemented as "
    "union-by-key + last-non-null window — a single shuffle on "
    "user_id, scales like any window; vs DuckDB's native ASOF JOIN "
    "as oracle. (Alternative at extreme skew: applyInPandas + "
    "pd.merge_asof per key block.)",
)
def q_asof_join_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # NULL user_ids must not match: the window would pool them into one
    # partition and fill signup_ts across NULL-keyed rows, while the
    # oracle's ASOF equi-join never matches NULL keys
    signups = e.filter(
        (F.col("event_type") == "signup") & F.col("user_id").isNotNull()
    ).select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
    )
    # tag and interleave both sides on the shared (user_id, ts) axis;
    # signup rows sort before purchase rows at equal ts so `ts >= signup`
    # inclusivity matches the oracle
    tagged = purchases.withColumn("is_purchase", F.lit(1)).unionByName(
        signups.withColumn("is_purchase", F.lit(0))
    ).withColumn("signup_ts_src", F.when(F.col("is_purchase") == 0, F.col("ts")))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = tagged.withColumn("signup_ts", F.last("signup_ts_src", ignorenulls=True).over(w))
    return filled.filter(F.col("is_purchase") == 1).select("event_id", "user_id", "signup_ts")


# ---------------------------------------------------------------- unpivot
@register(
    "unpivot_amounts",
    oracle="""
    WITH pivoted AS (
      SELECT l_orderkey AS order_id,
             round(sum(CASE WHEN l_returnflag = 'A' THEN l_extendedprice ELSE 0 END), 2) AS a_amount,
             round(sum(CASE WHEN l_returnflag = 'N' THEN l_extendedprice ELSE 0 END), 2) AS n_amount,
             round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END), 2) AS r_amount
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT order_id, flag, amount FROM (
      SELECT order_id, 'A' AS flag, a_amount AS amount FROM pivoted
      UNION ALL SELECT order_id, 'N', n_amount FROM pivoted
      UNION ALL SELECT order_id, 'R', r_amount FROM pivoted
    )
    WHERE amount > 0
    """,
    doc="Unpivot (melt) via stack() — the inverse of the R9 conditional "
    "pivot; executor-side expansion, no driver involvement.",
)
def q_unpivot_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = li.groupBy(F.col("l_orderkey").alias("order_id")).agg(
        *[
            F.round(
                F.sum(F.when(F.col("l_returnflag") == m, F.col("l_extendedprice")).otherwise(0)),
                2,
            ).alias(f"{m.lower()}_amount")
            for m in ("A", "N", "R")
        ]
    )
    return pivoted.select(
        "order_id",
        F.expr(
            "stack(3, 'A', a_amount, 'N', n_amount, 'R', r_amount) AS (flag, amount)"
        ),
    ).filter(F.col("amount") > 0)
