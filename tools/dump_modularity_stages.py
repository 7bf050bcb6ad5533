"""Dump the checkpoint-hidden stage plans of graph_modularity_score.

The full-query .explain() only shows the post-checkpoint tail, so the
LPA stage (behind the labels checkpoint) and the fold tail are dumped
standalone, same convention as plans/r15.

Usage: python tools/dump_modularity_stages.py <repo_root> <out_dir> <suffix>
"""
from __future__ import annotations

import os
import sys


def main() -> None:
    repo, out_dir, suffix = sys.argv[1:]
    sys.path.insert(0, repo)
    from jaffle_shop_classic_spark.operators import dedup
    from jaffle_shop_classic_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_modularity_stages", shuffle_partitions=8)
    os.makedirs(out_dir, exist_ok=True)

    pairs = dedup._lsh_candidate_pairs(spark, sf_dir).localCheckpoint(eager=True)
    edges = dedup._symmetric_edges(pairs)
    labels = dedup.propagate_labels(edges)

    def dump(df, stage):
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"graph_modularity_score_{stage}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(
            f"{stage}: {txt.count('Exchange')} Exchange, "
            f"{txt.count('SortMergeJoin')} SMJ, {txt.count('Window')} Window "
            f"-> {path}"
        )

    dump(labels, "lpa")

    # the tail as one uncut plan: labels checkpointed (the r16 cut under
    # test), but the final per-checkpoint suppressed so the whole
    # ends/stats/members/per/m/q/output subtree shows in one dump —
    # mirrors the tail_before reconstruction (which had no labels cut)
    from pyspark.sql import functions as F

    labels_ckpt = labels.localCheckpoint(eager=False)
    comm = labels_ckpt.select("doc_id", F.col("label").alias("community"))
    ca = comm.select(F.col("doc_id").alias("doc_a"), F.col("community").alias("cca"))
    cb = comm.select(F.col("doc_id").alias("doc_b"), F.col("community").alias("ccb"))
    ends = (
        pairs.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("cca").alias("community"),
                        (F.col("cca") == F.col("ccb")).cast("bigint").alias("w"),
                    ),
                    F.struct(
                        F.col("ccb").alias("community"),
                        F.lit(0).cast("bigint").alias("w"),
                    ),
                )
            ).alias("e")
        )
        .select("e.community", "e.w")
    )
    stats = ends.groupBy("community").agg(
        F.sum("w").cast("bigint").alias("e_within"),
        F.count(F.lit(1)).cast("bigint").alias("d_total"),
    )
    members = comm.groupBy("community").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    per = members.join(stats, "community").select(
        "community", "n_members", "e_within", "d_total"
    )
    m = per.agg(F.expr("sum(d_total) div 2").cast("bigint").alias("m"))
    q = (
        per.crossJoin(F.broadcast(m))
        .agg(
            F.sum(
                F.round(
                    F.col("e_within").cast("double") / F.col("m")
                    - (F.col("d_total").cast("double") / (2.0 * F.col("m")))
                    * (F.col("d_total").cast("double") / (2.0 * F.col("m"))),
                    9,
                ).cast("decimal(38,9)")
            )
            .cast("double")
            .alias("q")
        )
    )
    out = (
        per.crossJoin(F.broadcast(q))
        .select(
            "community",
            "n_members",
            "e_within",
            "d_total",
            F.round("q", 6).alias("modularity"),
        )
        .orderBy("community")
    )
    dump(out, "tail")


if __name__ == "__main__":
    main()
