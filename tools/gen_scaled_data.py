"""Generate an sf1-equivalent (10x sf0.1) parquet directory for the
empirical scaling curve (tools/scaling_curve.py, SCALING.md).

The driver owns /root/testdata (read-only), so the 10x directory is
derived locally by TILING sf0.1: ten key-shifted copies, unioned. The
tiling preserves the statistical shape a true scale-up would have while
keeping every copy distinguishable:

- **facts/dims** (orders, lineitem, customer, part, supplier, events):
  copy i shifts every key column by ``i * (max_key + 1)`` — and the SAME
  stride is used on both sides of each FK (l_orderkey/o_orderkey,
  o_custkey/c_custkey, ...), so join fan-outs, group cardinalities per
  key, and skew are exactly those of sf0.1, at 10x row count. Dates and
  measures are untouched: per-date groups grow 10x, like TPC-H scaling.
- **region/nation** stay fixed (TPC-H semantics: dims of constant size).
- **documents**: copy i applies a per-copy letter SUBSTITUTION CIPHER
  (F.translate over [a-zA-Z]) to the text. Word lengths, token counts
  and whitespace are preserved, so the shingle/minhash structure WITHIN
  a copy is isomorphic to sf0.1's (the same internal near-dup rate), but
  cross-copy Jaccard collapses to ~0 — a 10x corpus rather than a
  corpus where every doc has 9 planted clones (which would quadratically
  inflate LSH candidate pairs and measure a different workload).
- **embeddings**: copy i applies a per-copy signed coordinate
  permutation (norm-preserving isometry): within-copy cosine structure
  is exactly sf0.1's, cross-copy similarities decorrelate.

Each table lands as ONE parquet file (coalesce(1)) to mirror the
driver testdata's single-file layout — the curve then compares like
layouts across scale factors instead of conflating data growth with a
change in split count.

Usage: python tools/gen_scaled_data.py [out_dir] [copies]
       default: /root/repo/scaledata/sf1, 10 copies of sf0.1
"""

from __future__ import annotations

import os
import random
import shutil
import string
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from jaffle_shop_classic_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

# key columns per table; FK pairs share the stride of their dimension
KEYS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
FIXED = ("region", "nation")

LETTERS = string.ascii_lowercase


def _cipher(i: int) -> tuple[str, str]:
    """Deterministic per-copy substitution alphabet (copy 0 = identity)."""
    if i == 0:
        return LETTERS + LETTERS.upper(), LETTERS + LETTERS.upper()
    rng = random.Random(1000 + i)
    perm = list(LETTERS)
    rng.shuffle(perm)
    p = "".join(perm)
    return LETTERS + LETTERS.upper(), p + p.upper()


def _signed_perm(i: int, dim: int) -> list[tuple[int, int]]:
    """Deterministic per-copy signed coordinate permutation (copy 0 = id)."""
    if i == 0:
        return [(j, 1) for j in range(dim)]
    rng = random.Random(2000 + i)
    perm = list(range(dim))
    rng.shuffle(perm)
    return [(j, rng.choice((-1, 1))) for j in perm]


def main(out_dir: str, copies: int) -> None:
    spark = get_spark("gen-scaled-data", shuffle_partitions=32)
    os.makedirs(out_dir, exist_ok=True)

    # strides: one per key FAMILY so FK pairs stay aligned
    strides = {}
    fam_source = {
        "cust": ("customer", "c_custkey"),
        "supp": ("supplier", "s_suppkey"),
        "part": ("part", "p_partkey"),
        "order": ("orders", "o_orderkey"),
        "event": ("events", "event_id"),
        "user": ("events", "user_id"),
        "doc": ("documents", "doc_id"),
        "vec": ("embeddings", "vec_id"),
    }
    for fam, (tbl, col) in fam_source.items():
        strides[fam] = (
            spark.read.parquet(f"{SRC}/{tbl}.parquet").agg(F.max(col)).first()[0] + 1
        )
    emb_dim = len(
        spark.read.parquet(f"{SRC}/embeddings.parquet").first()["embedding"]
    )

    def _write_single(df, name):
        tmp = os.path.join(out_dir, f"_tmp_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(dst):
            os.remove(dst)
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)

    for name in FIXED:
        _write_single(spark.read.parquet(f"{SRC}/{name}.parquet"), name)
        print(f"{name}: fixed dim copied")

    for name, keycols in KEYS.items():
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(copies):
            c = base
            for col, fam in keycols.items():
                c = c.withColumn(
                    col, (F.col(col) + F.lit(i * strides[fam])).cast("bigint")
                )
            if name == "documents" and i > 0:
                src_a, dst_a = _cipher(i)
                c = c.withColumn("text", F.translate(F.col("text"), src_a, dst_a))
            if name == "embeddings" and i > 0:
                sp = _signed_perm(i, emb_dim)
                c = c.withColumn(
                    "embedding",
                    F.array(
                        *[
                            (F.element_at("embedding", j + 1) * F.lit(float(s))).cast(
                                "float"
                            )
                            for j, s in sp
                        ]
                    ),
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        _write_single(out, name)
        n = spark.read.parquet(os.path.join(out_dir, f"{name}.parquet")).count()
        print(f"{name}: {n} rows ({copies} copies)")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "scaledata", "sf1")
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(out, copies)
    print(f"wrote {out}")
