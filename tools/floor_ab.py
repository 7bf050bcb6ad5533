"""A/B the driver-gate fixed-action floor (round-12 verdict item 8).

BASELINE.md documents a 0.08-0.16 s per-action floor (range(1).count())
that dominates 198 small entries' spark/duck ratios at sf0.1. This tool
measures whether session-level knobs shave that floor WITHOUT touching
query semantics:

  base      current session config (session.py)
  shuffle8  spark.sql.shuffle.partitions 32 -> 8
  noaqe     adaptive execution off (AQE re-optimizes per stage — pure
            latency on single-stage small plans)
  locality0 spark.locality.wait=0 (no locality wait in local mode)
  combo     shuffle8 + noaqe + locality0

Each variant gets a FRESH SparkSession (stop + rebuild). Per variant:
warm once, then 9 runs each of the floor probes and three
representative floor-bound catalog entries; medians reported. A variant
only graduates into session.py / bench.py if it wins clearly and every
affected query still parities (the oracle gate, not this tool, decides
semantics).

Usage: python tools/floor_ab.py            # writes floor_ab.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ENTRIES = ["users_anomaly_zscore", "set_except", "test_expression_is_true_pass"]
N = 9

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "shuffle8": {"spark.sql.shuffle.partitions": "8"},
    "noaqe": {"spark.sql.adaptive.enabled": "false"},
    "locality0": {"spark.locality.wait": "0ms"},
    "combo": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.enabled": "false",
        "spark.locality.wait": "0ms",
    },
}


def build_session(overrides: dict[str, str]):
    from pyspark.sql import SparkSession

    from jaffle_shop_classic_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        # a stopped context lingers; getOrCreate on a fresh builder below
        SparkSession.builder._options = {}  # defensive: no stale overrides
    spark = get_spark("floor-ab")
    if overrides:
        # conf set post-create works for runtime SQL confs (shuffle
        # partitions, AQE); spark.locality.wait is a core conf — needs
        # the stop/rebuild path above plus builder config
        spark.stop()
        from jaffle_shop_classic_spark import session as sess_mod

        cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
        builder = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("floor-ab")
            .config("spark.sql.shuffle.partitions", cpus)
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
            .config("spark.ui.enabled", "false")
            .config(
                "spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
            )
        )
        for k, v in overrides.items():
            builder = builder.config(k, v)
        spark = builder.getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        del sess_mod  # session module untouched; cache invalidation below
    # the table cache is keyed by applicationId, so a fresh app re-reads
    return spark


def median_of(fn, n: int = N) -> float:
    fn()  # warm
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 4)


def main() -> None:
    from jaffle_shop_classic_spark.operators.catalog import load_catalog

    cat = load_catalog()
    out: dict[str, dict] = {}
    for name, overrides in VARIANTS.items():
        spark = build_session(overrides)
        probes: dict[str, float] = {}
        probes["range1_count"] = median_of(lambda: spark.range(1).count())
        probes["region_scan_count"] = median_of(
            lambda: spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
        )
        for q in ENTRIES:
            spec = cat[q]
            probes[q] = median_of(lambda s=spec: s.fn(spark, SF_DIR).count())
        out[name] = probes
        print(name, probes, flush=True)
    with open(os.path.join(REPO, "floor_ab.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote floor_ab.json")


if __name__ == "__main__":
    main()
