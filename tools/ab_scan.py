"""Interleaved A/B harness for the single-split-scan question.

The driver's testdata parquet is single-row-group, so a map-heavy stage
sitting directly on a plain ``load_table`` scan runs on ONE core.
``load_table_parallel`` fixes that with a core-count repartition — but
it REGRESSES queries whose first stage is a cheap filter/project feeding
a shuffle (the repartition is then a pure extra exchange). Only an
interleaved same-session median can tell the two apart under this
machine's +/-20-25% cross-process noise (BASELINE.md).

Usage: python tools/ab_scan.py [sf_dir] query [query ...]

For each query, variant B monkeypatches the registering module's
``load_table`` so FACT tables (documents/embeddings/lineitem/orders/
events) get the core-count repartition while dimension scans stay
as-is. A/B runs interleave in one warm session; the report gives
per-variant medians and the B/A ratio (<0.9 = adopt, >1.1 = document
the regression, else neutral).
"""

from __future__ import annotations

import importlib
import statistics
import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from jaffle_shop_classic_spark.operators.catalog import CATALOG, load_catalog  # noqa: E402
from jaffle_shop_classic_spark.session import get_spark  # noqa: E402
from jaffle_shop_classic_spark.sources import parquet as parquet_mod  # noqa: E402

FACT_TABLES = {"documents", "embeddings", "lineitem", "orders", "events"}
REPS = 7


def find_module(name: str):
    """The module whose namespace the query's fn resolves load_table in."""
    fn = CATALOG[name].fn
    return importlib.import_module(fn.__module__)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.1"
    load_catalog()
    spark = get_spark("ab_scan", shuffle_partitions=8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    def parallel_fact(spark_, sf_dir_, table):
        df = parquet_mod.load_table(spark_, sf_dir_, table)
        if table in FACT_TABLES:
            df = df.repartition(spark_.sparkContext.defaultParallelism)
        return df

    for qname in args:
        fn = CATALOG[qname].fn
        mod = find_module(qname)
        orig = mod.load_table

        def run() -> float:
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            return time.perf_counter() - t0

        # warm both variants (JIT + file listing) before any timing
        run()
        mod.load_table = parallel_fact
        run()
        mod.load_table = orig
        a_runs, b_runs = [], []
        for _ in range(REPS):
            mod.load_table = orig
            a_runs.append(run())
            mod.load_table = parallel_fact
            b_runs.append(run())
        mod.load_table = orig
        a, b = statistics.median(a_runs), statistics.median(b_runs)
        verdict = "ADOPT" if b < 0.9 * a else ("REGRESS" if b > 1.1 * a else "NEUTRAL")
        print(
            f"{qname}: plain={a:.3f}s parallel={b:.3f}s "
            f"ratio={b / a:.3f} -> {verdict}",
            flush=True,
        )


if __name__ == "__main__":
    main()
