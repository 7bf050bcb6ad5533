"""Heavy-tail core-count scaling capture (r15 verdict item 8).

The driver's own scaling block covers only the two gate queries, which
are job-launch-floor-bound at sf0.1 and tell nothing. This tool runs
the named catalog entries warm in THIS process at whatever core count
`$SPARK_GRAFT_CPUS` dictates and prints one JSON line of medians; the
caller runs it once per core count and records the ratio.

Usage: SPARK_GRAFT_CPUS=8 python tools/scaling_tail.py <sf_dir> [reps] [q...]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# default set: the >=1.5 s tail of the r15 quiet-window bench
# (plans/r15/bench_final2_full.json) — the entries whose scaling actually
# carries information, unlike the launch-floor-bound gate pair
DEFAULT_QUERIES = [
    "recommend_copurchase_topk",
    "dedup_minhash_recall_eval",
    "cluster_dbscan_grid",
    "stream_interval_join",
    "stream_left_outer_join",
    "dedup_keep_best_representative",
    "graph_modularity_score",
    "ab_randomization_test",
    "sink_manifest_roundtrip",
    "cf_item_cosine",
]


def main() -> None:
    from jaffle_shop_classic_spark.operators.catalog import load_catalog
    from jaffle_shop_classic_spark.session import get_spark

    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    names = sys.argv[3:] or DEFAULT_QUERIES
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    spark = get_spark("scaling_tail")
    cat = load_catalog()
    out: dict[str, float] = {}
    for name in names:
        fn = cat[name].fn
        fn(spark, sf_dir).count()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            ts.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(ts), 4)
    print("SCALETAIL " + json.dumps({"cpus": int(cpus), "sf_dir": sf_dir,
                                     "reps": reps, "medians": out}))


if __name__ == "__main__":
    main()
