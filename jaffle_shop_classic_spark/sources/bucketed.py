"""Bucketed tables — shuffle-free co-located joins (SCALING.md).

`bucketBy(n, key)` at write time hash-partitions rows into n buckets per
key and records the layout in the catalog; a later equi-join between two
tables bucketed on the same key with the same n needs NO exchange on
either side — at 100 TB that removes the single most expensive step of
a fact-fact join. The cost is paid once at ingest (one shuffle to
cluster the data) and amortized over every subsequent join/aggregation
on that key.

Local note: bucketed writes go through `saveAsTable` (the bucket layout
lives in the session catalog); plain `.parquet()` writes cannot record
bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    num_buckets: int,
    sort_within: bool = True,
    path: str | None = None,
) -> None:
    """Materialize df as a bucketed (and optionally sorted) table.

    Sorting within buckets additionally enables merge-join without a
    per-task sort. `path` makes it an external table (the warehouse dir
    is a static conf and can't be changed on a live session).
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_key)
    if sort_within:
        writer = writer.sortBy(bucket_key)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — planner elides
    both exchanges (verify: no Exchange above either scan in .explain)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
