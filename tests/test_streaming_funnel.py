"""Streaming funnel (applyInPandasWithState) — cross-micro-batch
parity with the batch funnel, in plain and conversion-window modes."""

import shutil

from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.events import funnel_steps_per_user
from dataflow_python_etl_spark.sources.catalog import read_table
from dataflow_python_etl_spark.streaming.stateful import streaming_funnel

SF_DIR = "/root/testdata/sf0.001"
STEPS = ("signup", "click", "purchase")


def _drive(spark, tmp_path, name, window=None):
    ev = read_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    drop = str(tmp_path / f"drop_{name}")
    cutoff = "2024-01-15"
    # batch 0 must exist before readStream sees the dir; batch 1 lands
    # mid-stream — event-time order across batches is preserved by the
    # ts split, which is the operator's documented parity contract
    ev.where(F.col("ts") < cutoff).coalesce(1).write.parquet(drop)
    stream = spark.readStream.schema(ev.schema).parquet(drop)
    q = (
        streaming_funnel(stream, STEPS, conversion_window_days=window)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        ev.where(F.col("ts") >= cutoff).coalesce(1).write.mode("append").parquet(drop)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {}
    # update-mode memory sink appends every emission; steps_completed
    # is monotone per user, so the max IS the final state
    for r in spark.table(name).collect():
        got[r.user_id] = max(got.get(r.user_id, 0), r.steps_completed)
    want = {
        r.user: r.steps_completed
        for r in funnel_steps_per_user(
            ev, STEPS, conversion_window_days=window
        ).collect()
    }
    shutil.rmtree(drop, ignore_errors=True)
    return got, want


def test_streaming_funnel_matches_batch(spark, tmp_path):
    got, want = _drive(spark, tmp_path, "sfunnel_plain")
    assert got == want
    assert max(want.values()) == 3  # the corpus completes full funnels


def test_streaming_funnel_conversion_window_matches_batch(spark, tmp_path):
    got, want = _drive(spark, tmp_path, "sfunnel_win", window=2)
    assert got == want
    got_plain, want_plain = _drive(spark, tmp_path, "sfunnel_plain2")
    assert want != want_plain, "the 2-day window must bite on this corpus"


def test_streaming_retention_matches_batch(spark, tmp_path):
    """streaming_retention emissions, aggregated per (cohort, offset),
    equal retention_matrix over the same events — across a mid-stream
    micro-batch boundary."""
    from dataflow_python_etl_spark.operators.events import retention_matrix
    from dataflow_python_etl_spark.streaming.stateful import streaming_retention

    ev = read_table(spark, SF_DIR, "events").select("user_id", "ts")
    drop = str(tmp_path / "drop_ret")
    cutoff = "2024-01-15"
    ev.where(F.col("ts") < cutoff).coalesce(1).write.parquet(drop)
    stream = spark.readStream.schema(ev.schema).parquet(drop)
    q = (
        streaming_retention(stream)
        .writeStream.format("memory")
        .queryName("sret")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        ev.where(F.col("ts") >= cutoff).coalesce(1).write.mode("append").parquet(drop)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.cohort, r.period_offset): r.users
        for r in spark.table("sret")
        .groupBy("cohort", "period_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
        .collect()
    }
    want = {
        (r.cohort, r.period_offset): r.users
        for r in retention_matrix(ev).collect()
    }
    shutil.rmtree(drop, ignore_errors=True)
    assert got == want and len(want) > 1
    assert sum(u for (c, o), u in want.items() if o == 0) > 0  # cohort sizes present


def test_streaming_debounce_matches_batch_strict(spark, tmp_path):
    from dataflow_python_etl_spark.operators.events import debounce_events
    from dataflow_python_etl_spark.streaming.stateful import streaming_debounce

    ev = read_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    drop = str(tmp_path / "drop_db")
    cutoff = "2024-01-15"
    ev.where(F.col("ts") < cutoff).coalesce(1).write.parquet(drop)
    stream = spark.readStream.schema(ev.schema).parquet(drop)
    q = (
        streaming_debounce(stream, gap_seconds=3600)
        .writeStream.format("memory")
        .queryName("sdeb")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        ev.where(F.col("ts") >= cutoff).coalesce(1).write.mode("append").parquet(drop)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.event_id: r.kept for r in spark.table("sdeb").collect()}
    want = {
        r.event_id: r.kept
        for r in debounce_events(ev, 3600, mode="strict").collect()
    }
    shutil.rmtree(drop, ignore_errors=True)
    assert got == want
    assert 0 < sum(got.values()) < len(got)  # both keeps and drops occur


def test_streaming_conversion_lag_matches_batch(spark, tmp_path):
    """Latest non-NULL lag_bucket per user, histogrammed, equals the
    batch conversion_lag — across a mid-stream micro-batch boundary.
    lag_bucket is write-once per user (state freezes at conversion),
    so 'any non-NULL emission' is the final value."""
    from collections import Counter

    from dataflow_python_etl_spark.operators.events import conversion_lag
    from dataflow_python_etl_spark.streaming.stateful import (
        streaming_conversion_lag,
    )

    ev = read_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    drop = str(tmp_path / "drop_clag")
    cutoff = "2024-01-15"
    ev.where(F.col("ts") < cutoff).coalesce(1).write.parquet(drop)
    stream = spark.readStream.schema(ev.schema).parquet(drop)
    q = (
        streaming_conversion_lag(stream, "signup", "purchase")
        .writeStream.format("memory")
        .queryName("sconvlag")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        ev.where(F.col("ts") >= cutoff).coalesce(1).write.mode("append").parquet(drop)
        q.processAllAvailable()
    finally:
        q.stop()
    per_user = {}
    for r in spark.table("sconvlag").collect():
        if r.lag_bucket is not None:
            prev = per_user.setdefault(r.user_id, r.lag_bucket)
            assert prev == r.lag_bucket  # write-once contract
    got = Counter(per_user.values())
    want = {
        r.lag_bucket: r.n_users
        for r in conversion_lag(ev, "signup", "purchase").collect()
    }
    assert dict(got) == want and sum(want.values()) > 0
