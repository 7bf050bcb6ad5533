"""Streaming twins must agree with their oracle-checked batch
equivalents on the same data (batch-first design, SURVEY §2.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jaffle_shop_classic_spark.operators.catalog import load_catalog
from jaffle_shop_classic_spark.sources.parquet import load_table
from jaffle_shop_classic_spark.streaming import (
    dedup_within_watermark,
    run_stream_to_batch,
    session_window_stream,
    stream_events,
    tumbling_counts_stream,
)


def test_stream_schema_matches_batch(spark, sf_dir):
    batch = load_table(spark, sf_dir, "events")
    stream = stream_events(spark, sf_dir)
    assert stream.isStreaming
    assert stream.schema == batch.schema


def test_tumbling_stream_equals_batch(spark, sf_dir):
    stream = tumbling_counts_stream(stream_events(spark, sf_dir))
    got = run_stream_to_batch(stream, "tumbling_out")
    want = load_catalog()["tumbling_window"].fn(spark, sf_dir)
    g = {(r["window_start"], r["event_type"]): (r["n_events"], r["total_value"]) for r in got.collect()}
    w = {(r["window_start"], r["event_type"]): (r["n_events"], r["total_value"]) for r in want.collect()}
    # append mode emits only watermark-closed windows: every emitted
    # window must match batch exactly...
    assert g and all(w.get(k) == v for k, v in g.items())
    # ...and anything missing must be within the trailing watermark
    # horizon (1h) of the max event time, still held in state at EOS
    max_ts = max(k[0] for k in w)
    from datetime import timedelta
    missing = [k for k in w if k not in g]
    assert all(k[0] >= max_ts - timedelta(hours=1, minutes=10) for k in missing)


def test_session_window_stream_covers_closed_sessions(spark, sf_dir):
    got = run_stream_to_batch(
        session_window_stream(stream_events(spark, sf_dir)), "sessions_out"
    )
    # emitted (watermark-closed) sessions cover most of the stream; the
    # final open sessions per user stay in state at end-of-stream
    n_events = got.agg(F.sum("n_events")).collect()[0][0]
    total = load_table(spark, sf_dir, "events").count()
    assert 0 < n_events <= total
    assert n_events >= total * 0.9
    # session windows never overlap per user
    rows = sorted(
        ((r["user_id"], r["session_start"], r["session_end"]) for r in got.collect())
    )
    for (u1, s1, e1), (u2, s2, e2) in zip(rows, rows[1:]):
        if u1 == u2:
            assert e1 <= s2


def test_dedup_within_watermark_passthrough_on_unique_ids(spark, sf_dir):
    got = run_stream_to_batch(
        dedup_within_watermark(stream_events(spark, sf_dir)), "dedup_out"
    )
    n = load_table(spark, sf_dir, "events").count()
    assert got.count() == n
    assert got.select("event_id").distinct().count() == n


def test_custom_stateful_running_stats(spark, sf_dir):
    from jaffle_shop_classic_spark.streaming.windows import running_user_stats_stream

    got = run_stream_to_batch(
        running_user_stats_stream(stream_events(spark, sf_dir)),
        "stateful_out",
        output_mode="update",
    )
    # with one input file (one micro-batch) the final state equals the
    # batch aggregate per user
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
    )
    g = {r["user_id"]: (r["n_events"], r["total_value"], r["max_value"]) for r in got.collect()}
    w = {r["user_id"]: (r["n_events"], r["total_value"], r["max_value"]) for r in want.collect()}
    assert g == w


def test_stream_static_enrichment_equals_batch(spark, sf_dir):
    from jaffle_shop_classic_spark.sources.parquet import load_table
    from jaffle_shop_classic_spark.streaming.windows import (
        enrich_with_static_dim,
        run_stream_to_batch,
        stream_events,
    )

    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    streamed = run_stream_to_batch(
        enrich_with_static_dim(stream_events(spark, sf_dir), dim),
        "stream_static_enrich",
    )
    batch = enrich_with_static_dim(load_table(spark, sf_dir, "events"), dim)
    assert streamed.count() == batch.count()
    assert sorted(streamed.columns) == sorted(batch.columns)
    # value-level check on a deterministic slice
    s = {tuple(r) for r in streamed.filter("event_id < 100").collect()}
    b = {tuple(r) for r in batch.filter("event_id < 100").collect()}
    assert s == b
