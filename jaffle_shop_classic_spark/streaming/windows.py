"""Structured Streaming operators X15 (SURVEY §2.4) over the events table.

Batch-first design (SURVEY §2.4 X14 note): every windowed aggregation in
operators/extensions.py has identical semantics here — `F.window` /
`F.session_window` produce the same buckets in batch and streaming, so
the batch queries are the oracle-checked surface and these streaming
twins add watermarking/late-data handling on top.

The file source streams the same parquet the batch path reads (one file
= one micro-batch in tests). In production the source is Kafka etc.;
only `stream_events` changes. Watermarks bound state: a 1-hour watermark
means window state older than (max event time - 1h) is evicted, so state
size is O(active windows), not O(stream length) — the property that
makes these plans run indefinitely at cluster scale.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jaffle_shop_classic_spark.operators.catalog import register

# events.parquet physical schema: ts is TIMESTAMP(NANOS), surfaced as
# long under spark.sql.legacy.parquet.nanosAsLong (see sources/parquet.py)
_EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream twin of sources.parquet.load_table(..., 'events')."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file source requires a *directory*; select just events.parquet
    # out of the shared sf_dir via a glob filter
    raw = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of operators.extensions.q_tumbling_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def session_window_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming sessionization via the native session_window operator —
    merging-window state per user, bounded by the watermark."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state: duplicates
    arriving within the watermark horizon are dropped; older state is
    evicted (the streaming analog of X4)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_stream_to_batch(
    streaming_df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming query over the available data to completion via
    the memory sink; returns the result as a batch DataFrame. Test/demo
    harness — production uses a real sink + trigger."""
    spark = streaming_df.sparkSession
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout=120)
    finally:
        if q.isActive:  # pragma: no cover — safety net
            q.stop()
    return spark.table(name)


# ------------------------------------------------------- custom stateful op
RUNNING_STATS_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
_STATE_SCHEMA = "n long, total double, mx double"


def _running_stats_fn(key, pdf_iter, state):
    """applyInPandasWithState kernel: per-user running event stats.

    State = (count, sum, max) per user — O(1) per key, updated across
    micro-batches; the GroupState survives between triggers, which is
    what distinguishes this from a per-batch groupBy.
    """
    import pandas as pd

    (n, total, mx) = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_value": [round(mx, 2)],
        }
    )


def running_user_stats_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator (X15): arbitrary per-key state via
    applyInPandasWithState — the escape hatch when built-in windowed
    aggregations can't express the state machine. Emits the updated
    per-user totals every micro-batch."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_stats_fn,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


# ------------------------------------------------- catalog registrations
# Streaming has no DuckDB oracle (X15 — the driver records a rows-only
# check); semantic verification is tests/test_streaming.py, which diffs
# each twin against its oracle-green batch equivalent on the same data.
_SINK_SEQ = itertools.count()


def _drain(df: DataFrame, base: str, output_mode: str = "append") -> DataFrame:
    """Unique memory-sink name per call so re-runs don't collide."""
    return run_stream_to_batch(df, f"{base}_{next(_SINK_SEQ)}", output_mode)


@register(
    "stream_tumbling_counts",
    oracle=None,
    doc="X15: streaming twin of tumbling_window — readStream parquet "
    "source, 1h watermark, 10-min tumbling count/sum, memory sink "
    "drained with availableNow. Append mode emits watermark-closed "
    "windows; state is O(open windows) regardless of stream length.",
)
def q_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain(tumbling_counts_stream(stream_events(spark, sf_dir)), "stream_tumbling")


@register(
    "stream_session_windows",
    oracle=None,
    doc="X15: streaming sessionization via F.session_window with merging "
    "window state per user, bounded by a 1h watermark — the streaming "
    "twin of session_window_batch (which is the oracle-checked surface).",
)
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain(session_window_stream(stream_events(spark, sf_dir)), "stream_sessions")


@register(
    "stream_dedup_watermark",
    oracle=None,
    doc="X15: dropDuplicatesWithinWatermark on event_id — streaming exact "
    "dedup with bounded state (duplicates must arrive within the 1h "
    "watermark horizon; older keys are evicted).",
)
def q_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain(dedup_within_watermark(stream_events(spark, sf_dir)), "stream_dedup")


@register(
    "stream_running_user_stats",
    oracle=None,
    doc="X15: custom stateful operator via applyInPandasWithState — "
    "per-user running (count, sum, max) state surviving across "
    "micro-batches; the escape hatch beyond built-in windowed aggs.",
)
def q_stream_running_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _drain(
        running_user_stats_stream(stream_events(spark, sf_dir)),
        "stream_running_stats",
        output_mode="update",
    )


def enrich_with_static_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the event
    stream equi-joins a *batch* dimension table (here: customer market
    segment keyed by user_id). Spark re-plans the static side per
    micro-batch, so a small dimension rides a broadcast hash join with
    no streaming state at all — the standard shape for attaching
    slowly-changing reference data to a 100 TB/day event firehose.
    """
    return events.join(
        F.broadcast(dim), events.user_id == dim.c_custkey, "left"
    ).select("event_id", "ts", "user_id", "event_type", "value", "c_mktsegment")


def merge_stream_into_state(events: DataFrame, state_dir: str):
    """Streaming CDC merge via foreachBatch — the streaming twin of the
    batch `upsert_latest_state` compaction: every micro-batch unions the
    change set with the current state table and window-compacts to the
    latest row per key, writing a new state VERSION (readers take the
    highest version; a production deployment replaces the versioned
    parquet directories with Delta/Iceberg `MERGE INTO`, which makes the
    same read-modify-write transactional — the plan inside the batch is
    identical). foreachBatch is the escape hatch for sinks Structured
    Streaming doesn't natively support; the batch_id makes retries
    idempotent (a re-run of batch N overwrites v{N}, never duplicates).

    Returns a DataStreamWriter — caller starts/awaits it.
    """
    import os

    from pyspark.sql import Window

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        versions = (
            sorted(
                int(p[1:])
                for p in os.listdir(state_dir)
                if p.startswith("v") and p[1:].isdigit()
            )
            if os.path.isdir(state_dir)
            else []
        )
        cur = batch_df.select("user_id", "event_id", "ts", "event_type")
        if versions:
            prev = spark.read.parquet(f"{state_dir}/v{versions[-1]}")
            cur = prev.unionByName(cur)
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        (
            cur.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
            .write.mode("overwrite")
            .parquet(f"{state_dir}/v{batch_id}")
        )

    return events.writeStream.foreachBatch(_merge).trigger(availableNow=True)
