"""Interleaved A/B tournament for recommend_copurchase_topk at sf1.

The round-11 verdict: the operator's 7-variant tournament that declared
the candidate shuffle an irreducible floor was run at sf0.1, but the
measured growth exponent RISES with scale (0.45/decade at sf0.01->0.1,
0.70 at sf0.1->1, 26.3 s at sf1) — so a variant that lost at sf0.1 may
win at sf1 where the shuffle dominates differently. This re-runs the
plausible contenders on the tiled sf1 directory with the BASELINE.md
discipline: one warm session, variants interleaved per round, per-variant
medians (cross-process single shots carry +/-20-25% noise).

Variants:
  base       — the shipped plan (keyed joins, capped pair table)
  bcast_pair — F.broadcast() the top-10-capped partner table into the
               user join (loser at sf0.1: 4.4 vs 3.7 s)
  one_exch   — repartition(custkey) before score-agg so the aggregate,
               anti-join, and window share one exchange (neutral at
               sf0.1)
  basket     — pair generation via per-order collect_set + explode
               instead of the self-join (neutral at sf0.1)

Usage: python tools/ab_copurchase_sf1.py [sf_dir] [rounds]
"""

from __future__ import annotations

import statistics
import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from pyspark.sql import functions as F
from pyspark.sql import Window

from jaffle_shop_classic_spark.session import get_spark
from jaffle_shop_classic_spark.sources.parquet import load_table


def _cp_op(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cp = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    op = li.select("l_orderkey", "l_partkey").distinct()
    return cp, op


def _pair_selfjoin(op):
    a, b = op.alias("a"), op.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_x"),
            F.col("b.l_partkey").alias("part_y"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def _pair_basket(op):
    baskets = op.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    return (
        baskets.select(F.explode("parts").alias("part_x"), "parts")
        .select("part_x", F.explode("parts").alias("part_y"))
        .where(F.col("part_x") != F.col("part_y"))
        .groupBy("part_x", "part_y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def _cap(pair_all):
    wp = Window.partitionBy("part_x").orderBy(F.col("n").desc(), F.col("part_y").asc())
    return (
        pair_all.withColumn("pr", F.row_number().over(wp))
        .where(F.col("pr") <= 10)
        .drop("pr")
    )


def _finish(cp, pair, repartition_custkey=False):
    joined = cp.join(pair, cp.l_partkey == pair.part_x)
    if repartition_custkey:
        joined = joined.repartition("o_custkey")
    cand = (
        joined.groupBy("o_custkey", F.col("part_y").alias("rec_part"))
        .agg(F.sum("n").cast("bigint").alias("score"))
        .join(
            cp.select("o_custkey", F.col("l_partkey").alias("rec_part")),
            ["o_custkey", "rec_part"],
            "left_anti",
        )
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("score").desc(), F.col("rec_part").asc()
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "rec_part", "score", "rnk")
    )


def v_base(spark, sf_dir):
    cp, op = _cp_op(spark, sf_dir)
    return _finish(cp, _cap(_pair_selfjoin(op)))


def v_bcast_pair(spark, sf_dir):
    cp, op = _cp_op(spark, sf_dir)
    return _finish(cp, F.broadcast(_cap(_pair_selfjoin(op))))


def v_one_exch(spark, sf_dir):
    cp, op = _cp_op(spark, sf_dir)
    return _finish(cp, _cap(_pair_selfjoin(op)), repartition_custkey=True)


def v_basket(spark, sf_dir):
    cp, op = _cp_op(spark, sf_dir)
    return _finish(cp, _cap(_pair_basket(op)))


def _pair_half_mirror(li):
    # r16 contender: sorted-basket transform/slice expands only a < b
    # pairs (the r15 copurchase_part_pairs codegen pattern), the
    # aggregate shuffles half the rows, and the symmetric mirror is a
    # post-aggregation union at pair-table cardinality
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    pair_half = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts) - i - 1), "
                    "y -> named_struct('part_x', x, 'part_y', y))))"
                )
            ).alias("p")
        )
        .select("p.part_x", "p.part_y")
        .groupBy("part_x", "part_y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return pair_half.unionByName(
        pair_half.select(
            F.col("part_y").alias("part_x"), F.col("part_x").alias("part_y"), "n"
        )
    )


def v_half_mirror(spark, sf_dir):
    cp, _ = _cp_op(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    return _finish(cp, _cap(_pair_half_mirror(li)))


def v_combo(spark, sf_dir):
    # r16: the two sf1 winners composed — half-mirror pair generation
    # (upstream) + custkey repartition sharing one exchange across
    # score-agg/anti-join/window (downstream)
    cp, _ = _cp_op(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    return _finish(cp, _cap(_pair_half_mirror(li)), repartition_custkey=True)


VARIANTS = {
    "base": v_base,
    "bcast_pair": v_bcast_pair,
    "one_exch": v_one_exch,
    "basket": v_basket,
    "half_mirror": v_half_mirror,
    "combo": v_combo,
}


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else f"{REPO}/scaledata/sf1"
    rounds = int(args.pop(0)) if args else 3
    variants = {n: VARIANTS[n] for n in args} if args else VARIANTS
    spark = get_spark("ab-copurchase", shuffle_partitions=32)

    counts = {}
    for name, fn in variants.items():  # warm + equivalence check
        counts[name] = fn(spark, sf_dir).count()
    assert len(set(counts.values())) == 1, f"variant row counts differ: {counts}"
    print(f"rowcounts equal: {counts}", flush=True)

    times: dict[str, list[float]] = {n: [] for n in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times[name].append(dt)
            print(f"round {r} {name}: {dt:.3f}s", flush=True)
    print("\nmedians:")
    base_med = statistics.median(times["base"])
    for name, runs in times.items():
        med = statistics.median(runs)
        print(f"  {name}: {med:.3f}s  ratio_vs_base={med / base_med:.3f}")


if __name__ == "__main__":
    main()
