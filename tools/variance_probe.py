"""Variance-vs-plan disposition probe (r15 verdict item 6).

entity_resolution_clusters and dedup_semantic_clusters swung 1.6-4.2 s
across past bench singles. This decides variance vs plan: N warm reps
of each query, ALTERNATED (so host drift hits both alike), in ONE
process under a pinned `spark.sql.shuffle.partitions`, recording every
reon and the executed-plan signature per rep. If the signature is
stable and the spread is wide, the swing is host/scheduling noise; if
signatures differ across reps, AQE is re-planning and the disposition
is plan-caused.

Usage: python tools/variance_probe.py <sf_dir> [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["entity_resolution_clusters", "dedup_semantic_clusters"]


def plan_sig(df) -> str:
    # signature of the FINAL adaptive plan: node-type counts only, so
    # reused-exchange ids / stats don't churn the signature
    s = df._jdf.queryExecution().executedPlan().toString()
    keys = [
        "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
        "Exchange", "HashAggregate", "ObjectHashAggregate", "Window",
        "BroadcastNestedLoopJoin", "CartesianProduct",
    ]
    return ",".join(f"{k}:{s.count(k)}" for k in keys)


def main() -> None:
    from jaffle_shop_classic_spark.operators.catalog import load_catalog
    from jaffle_shop_classic_spark.session import get_spark

    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("variance_probe", shuffle_partitions=8)
    cat = load_catalog()

    for name in QUERIES:  # warm both once before any timing
        cat[name].fn(spark, sf_dir).count()

    times: dict[str, list[float]] = {n: [] for n in QUERIES}
    sigs: dict[str, set[str]] = {n: set() for n in QUERIES}
    for r in range(reps):
        for name in QUERIES:
            fn = cat[name].fn
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.count()
            times[name].append(time.perf_counter() - t0)
            sigs[name].add(plan_sig(df))
    for name in QUERIES:
        ts = sorted(times[name])
        med = statistics.median(ts)
        q1, q3 = ts[len(ts) // 4], ts[3 * len(ts) // 4]
        print(
            f"{name}: n={reps} min={ts[0]:.3f} q1={q1:.3f} med={med:.3f} "
            f"q3={q3:.3f} max={ts[-1]:.3f} iqr/med={(q3 - q1) / med:.2f} "
            f"plan_signatures={len(sigs[name])}"
        )
        for s in sigs[name]:
            print(f"  sig: {s}")


if __name__ == "__main__":
    main()
