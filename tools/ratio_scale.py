"""Ratio-vs-scale exhibit for the catalog-wide spark/duck ratios.

BENCH_FULL.json's per-query ratio map (round-11 verdict item 5) shows
most catalog entries >2x their DuckDB twin at sf0.1. bench.py documents
the interpretation — at this SF the numerator sits on Spark's fixed
per-action floor (scheduler + stage launch + codegen, ~0.1-0.3 s) while
the twin finishes in single-digit milliseconds, so the ratio measures
fixed overhead, not throughput. This tool turns that interpretation
into MEASUREMENT:

  1. the floor itself: median latency of two minimal full plans (a
     1-row spark.range count and a smallest-table parquet count) — the
     irreducible per-action cost any sub-second entry is dominated by;
  2. for a representative slice of the worst-ratio entries, the same
     interleaved spark/duck protocol bench.py uses, run at BOTH sf0.1
     and the tiled sf1 (tools/gen_scaled_data.py) — if the >2x ratios
     were throughput, they would hold or grow with 10x data; if they
     are the floor amortizing, they shrink.

Writes ratio_scale.json and prints a markdown table for BASELINE.md.

Usage: python tools/ratio_scale.py [entry ...]   # default: SAMPLE below
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb

from jaffle_shop_classic_spark.operators.catalog import load_catalog
from jaffle_shop_classic_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SFS = [("sf0.1", "/root/testdata/sf0.1", 5), ("sf1", os.path.join(REPO, "scaledata", "sf1"), 3)]

# Representative slice of the >2x band in BENCH_FULL.json (round-12):
# the top of the table (sink/stream/source machinery floors), the
# 30-35x belt (sub-second scalar-heavy entries over tiny inputs), and
# the 10-15x midband — chosen to span entry families, not cherry-pick.
SAMPLE = [
    "sink_manifest_roundtrip",  # 179x at sf0.1 — filesystem round trip
    "stream_running_user_stats",  # 165x — micro-batch machinery
    "source_schema_evolution",  # 59x — three-file scan + union
    "users_anomaly_zscore",  # 35x — tiny users agg
    "test_expression_is_true_pass",  # 34x — trivial check scan
    "eval_mcnemar_test",  # 34x — 1-row chi-square
    "table_stats_profile",  # 33x — ANALYZE-style profile
    "join_full_outer",  # 30x — small-side outer join
    "trend_mann_kendall",  # 15x — midband
    "tpch_q2_style",  # 14x — midband, multi-join
    "set_except",  # 12x — midband set op
    "json_schema_parse",  # 12x — midband JSON path
]

ORACLE_BUDGET_SEC = 30.0


def time_spark(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    return time.perf_counter() - t0


def time_duck(con, sql: str) -> float | None:
    import threading

    # The interrupt is gated on a lock-guarded flag: Timer.cancel() after
    # fetchall() returns cannot un-schedule a callback that already fired,
    # and an unguarded con.interrupt() landing in that window would
    # spuriously kill the NEXT query on the shared connection and
    # misrecord it as over-budget (r12 advice).
    lock = threading.Lock()
    running = True

    def interrupt_if_running():
        with lock:
            if running:
                con.interrupt()

    timer = threading.Timer(ORACLE_BUDGET_SEC, interrupt_if_running)
    t0 = time.perf_counter()
    timer.start()
    try:
        con.execute(sql).fetchall()
        return time.perf_counter() - t0
    except duckdb.InterruptException:
        return None
    finally:
        with lock:
            running = False
        timer.cancel()


def measure_floor(spark, sf_dir: str, n: int = 9) -> dict[str, float]:
    """The fixed per-action cost: a 1-row range count (pure scheduling,
    no I/O) and the smallest-table parquet count (scheduling + one scan
    task). Any entry whose spark median is within a few multiples of
    these is floor-bound, not throughput-bound."""
    range_runs, scan_runs = [], []
    spark.range(1).count()  # warm
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    for _ in range(n):
        t0 = time.perf_counter()
        spark.range(1).count()
        range_runs.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
        scan_runs.append(time.perf_counter() - t0)
    return {
        "range1_count_sec": round(statistics.median(range_runs), 4),
        "region_scan_count_sec": round(statistics.median(scan_runs), 4),
    }


def main(entries: list[str]) -> None:
    catalog = load_catalog()
    spark = get_spark()
    out: dict = {"floor": {}, "entries": {}}
    for sf_name, sf_dir, n in SFS:
        if not os.path.isdir(sf_dir):
            print(f"SKIP {sf_name}: {sf_dir} missing (tools/gen_scaled_data.py)")
            continue
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        out["floor"][sf_name] = measure_floor(spark, sf_dir)
        for name in entries:
            spec = catalog[name]
            # warm both engines once (JIT, buffer cache) — excluded
            time_spark(spec.fn, spark, sf_dir)
            if spec.oracle:
                time_duck(con, spec.oracle)
            s_runs, d_runs = [], []
            d_dead = spec.oracle is None
            for _ in range(n):
                s_runs.append(time_spark(spec.fn, spark, sf_dir))
                if not d_dead:
                    d = time_duck(con, spec.oracle)
                    if d is None:
                        d_dead = True
                    else:
                        d_runs.append(d)
            rec = out["entries"].setdefault(name, {})
            s_med = round(statistics.median(s_runs), 4)
            d_med = round(statistics.median(d_runs), 4) if d_runs else None
            rec[sf_name] = {
                "spark_sec": s_med,
                "duck_sec": d_med,
                "ratio": round(s_med / d_med, 2) if d_med else None,
            }
            print(f"{sf_name} {name}: spark {s_med}s duck {d_med}s "
                  f"ratio {rec[sf_name]['ratio']}")
        con.close()
    with open(os.path.join(REPO, "ratio_scale.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # markdown table for BASELINE.md
    print("\n| entry | ratio sf0.1 | ratio sf1 | spark sf0.1→sf1 | duck sf0.1→sf1 |")
    print("|---|---|---|---|---|")
    for name in entries:
        e = out["entries"].get(name, {})
        a, b = e.get("sf0.1", {}), e.get("sf1", {})
        print(
            f"| {name} | {a.get('ratio')} | {b.get('ratio')} "
            f"| {a.get('spark_sec')}→{b.get('spark_sec')} "
            f"| {a.get('duck_sec')}→{b.get('duck_sec')} |"
        )
    print("\nfloor:", json.dumps(out["floor"]))


if __name__ == "__main__":
    main(sys.argv[1:] or SAMPLE)
