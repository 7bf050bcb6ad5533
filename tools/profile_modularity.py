"""Stage-wise noop-sink profile of graph_modularity_score (r16 item 3).

Times each stage of the query in isolation on a warm session:
  pairs checkpoint / edges checkpoint / LPA labels / within / deg /
  per rollup / full query — so the optimization targets the stage that
  actually costs, per guide §1.

Usage: python tools/profile_modularity.py <sf_dir> [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from jaffle_shop_classic_spark.operators import dedup
from jaffle_shop_classic_spark.operators.catalog import load_catalog
from jaffle_shop_classic_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(spark, label, fn, reps):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    print(f"{label:28s} {med:7.3f} s  (reps={reps})")
    return med


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("profile_modularity", shuffle_partitions=8)
    cat = load_catalog()

    sc = spark.sparkContext

    def stage_pairs():
        sc.setJobDescription("modularity: pairs checkpoint")
        dedup._lsh_candidate_pairs(spark, sf_dir).localCheckpoint(eager=True)

    def stage_edges():
        sc.setJobDescription("modularity: edges checkpoint")
        pairs = dedup._lsh_candidate_pairs(spark, sf_dir).localCheckpoint(eager=True)
        dedup._symmetric_edges(pairs)

    def stage_labels():
        sc.setJobDescription("modularity: LPA labels")
        pairs = dedup._lsh_candidate_pairs(spark, sf_dir).localCheckpoint(eager=True)
        edges = dedup._symmetric_edges(pairs)
        noop(dedup.propagate_labels(edges))

    def stage_full():
        sc.setJobDescription("modularity: full query")
        noop(cat["graph_modularity_score"].fn(spark, sf_dir))

    timeit(spark, "pairs checkpoint", stage_pairs, reps)
    timeit(spark, "pairs+edges checkpoint", stage_edges, reps)
    timeit(spark, "pairs+edges+LPA labels", stage_labels, reps)
    timeit(spark, "full query (noop)", stage_full, reps)
    sc.setJobDescription(None)


if __name__ == "__main__":
    main()
