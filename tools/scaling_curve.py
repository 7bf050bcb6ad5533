"""Measure the heavy-tier scaling curve: per-query wall time at
sf0.01 / sf0.1 / sf1 (the tiled 10x directory from
tools/gen_scaled_data.py) and the fitted per-decade growth exponent.

exponent(a->b) = log(t_b / t_a) / log(rows_b / rows_a)

so 1.0 = perfectly linear in data size, <1 sublinear (fixed overhead
still amortizing), ~2 quadratic (a pair explosion — the failure mode
the bucketed designs exist to prevent). The 100 TB claim this backs:
every heavy operator's sf0.1->sf1 exponent stays ~O(n) (<= ~1.2), i.e.
no hidden all-pairs or driver-side bottleneck appears when the data
grows 10x.

Methodology (BASELINE.md noise discipline): one Spark session; per
query the three scale dirs are warmed once, then timed in interleaved
rounds (sf0.01, sf0.1, sf1, sf0.01, ...) and the per-sf MEDIAN is
reported — cross-process single-shot timings carry +/-20-25% noise and
cannot rank anything.

Usage:
  python tools/scaling_curve.py                # full heavy tier
  python tools/scaling_curve.py q1 q2 ...      # subset
Writes scaling_curve.json and prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from jaffle_shop_classic_spark.operators.catalog import load_catalog  # noqa: E402
from jaffle_shop_classic_spark.session import get_spark  # noqa: E402

SFS = [
    ("sf0.01", "/root/testdata/sf0.01", 0.01),
    ("sf0.1", "/root/testdata/sf0.1", 0.1),
    ("sf1", os.path.join(REPO, "scaledata", "sf1"), 1.0),
]

# the BENCH_FULL heavy tier (everything >= ~1.3s at sf0.1) plus the two
# gate marts as the sublinear control group. Streaming entries are
# represented by stream_interval_join: their cost is micro-batch
# machinery, and the curve SHOWS it amortizing (exponent << 1).
DEFAULT_QUERIES = [
    "recommend_copurchase_topk",
    "dedup_keep_best_representative",
    "dedup_cluster_components_star",
    "quality_lr_classifier",
    "cf_item_cosine",
    "copurchase_part_pairs",
    "graph_pagerank",
    "entity_resolution_clusters",
    "sim_sparse_tfidf_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_substring_spans",
    "stream_interval_join",
    "jaffle_customers",
    "jaffle_orders",
    # round-12 newcomers with a data-proportional stage worth curving
    "dedup_winnowing_fingerprints",
    "retrieval_bm25_topk",
    "embedding_pca_power",
    # round 13 (verdict item 7): the r12 drift suspects and a second +
    # third streaming family member — tumbling watermark agg and the
    # Arrow-UDF SimHash ingest gate — plus the trained-BPE encoder
    "stream_tumbling_counts",
    "stream_neardup_dedup",
    "tokenizer_bpe_encode",
    # round-13 batch-2/3 newcomers with data-proportional stages: the
    # Python AC scan, the per-char Gear hash, the bigram model join,
    # the HITS exchanges, and grid DBSCAN (whose pair count grows with
    # density by SEMANTICS at fixed eps — see SCALING.md)
    "text_multipattern_tags",
    "dedup_cdc_chunks",
    "text_kneser_ney_score",
    "graph_hits_scores",
    "cluster_dbscan_grid",
]

ROUNDS = 3


def _run(cat, spark, name, sf_dir) -> float:
    t = time.time()
    df = cat[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t


def main(names: list[str]) -> None:
    spark = get_spark("scaling-curve", shuffle_partitions=32)
    cat = load_catalog()
    missing = [n for n in names if n not in cat]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")
    if not os.path.isdir(SFS[2][1]):
        raise SystemExit("run tools/gen_scaled_data.py first")

    results: dict[str, dict] = {}
    for name in names:
        times: dict[str, list[float]] = {sf: [] for sf, _, _ in SFS}
        for sf, d, _ in SFS:  # warm each scale once (JIT, file listing)
            _run(cat, spark, name, d)
        for _ in range(ROUNDS):
            for sf, d, _ in SFS:
                times[sf].append(_run(cat, spark, name, d))
        med = {sf: round(statistics.median(v), 3) for sf, v in times.items()}
        e_small = math.log(med["sf0.1"] / med["sf0.01"]) / math.log(10)
        e_big = math.log(med["sf1"] / med["sf0.1"]) / math.log(10)
        results[name] = {
            **med,
            "exp_0.01_to_0.1": round(e_small, 2),
            "exp_0.1_to_1": round(e_big, 2),
        }
        print(f"{name}: {results[name]}", flush=True)

    out = os.path.join(REPO, "scaling_curve.json")
    # Merge with any existing file so a subset run updates its queries
    # without clobbering previously measured entries.
    merged: dict[str, dict] = {}
    if os.path.exists(out):
        with open(out) as f:
            merged = json.load(f).get("queries", {})
    merged.update(results)
    with open(out, "w") as f:
        json.dump({"rounds": ROUNDS, "queries": merged}, f, indent=1)
    print(f"\nwrote {out}\n")
    print("| query | sf0.01 s | sf0.1 s | sf1 s | exp 0.01→0.1 | exp 0.1→1 |")
    print("|---|---|---|---|---|---|")
    for n, r in sorted(results.items(), key=lambda kv: -kv[1]["sf1"]):
        print(
            f"| `{n}` | {r['sf0.01']} | {r['sf0.1']} | {r['sf1']} "
            f"| {r['exp_0.01_to_0.1']} | {r['exp_0.1_to_1']} |"
        )


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_QUERIES)
