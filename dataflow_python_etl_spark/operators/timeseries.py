"""Time-series rollups over event streams: dense bucketed aggregation
with gap filling and last-observation-carried-forward — the
hypertable-rollup surface (TimescaleDB's ``time_bucket_gapfill`` /
``locf`` semantics, re-expressed as one declarative DataFrame plan).

A plain groupBy rollup silently DROPS empty buckets; every consumer
that charts, joins on time, or feeds a forecaster needs the dense
spine back. Spark has no gapfill built-in — this composes one from
sequence + explode + left join + an ignorenulls window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_bucket_gapfill(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Dense per-group time buckets over the table's global [min, max]
    span: event counts, bucket mean value, LOCF-filled value, and a
    gap marker.

    Returns ``(group, bucket_ts, n_events, avg_value, value_locf,
    gap_filled)`` where empty buckets have ``n_events = 0``,
    ``avg_value = NULL``, ``value_locf`` = the latest earlier bucket's
    (rounded) mean within the group (NULL before a group's first
    observation — LOCF has nothing to carry), and ``gap_filled`` marks
    them. ``bucket`` is a ``date_trunc`` unit.

    Scale shape: the rollup is one map-side-combined aggregation on
    (group, bucket) — the only corpus-sized shuffle. The spine is
    |groups| × |buckets| rows built from a 1-row broadcast of the
    global bounds exploded per distinct group, so its cost is the
    OUTPUT size, not the event count. The LOCF window partitions by
    group: one partition per series, which assumes series count ≥
    parallelism (true for any real multi-tenant rollup; a single
    giant series would need range-chunked LOCF instead). The carried
    value is the ROUNDED bucket mean, so cross-engine replay is
    ULP-stable.
    """
    b = events.select(
        F.col(group_col).alias("grp"),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        F.col(value_col).alias("v"),
    )
    agg = b.groupBy("grp", "bucket_ts").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("v"), 6).alias("avg_value"),
    )
    bounds = b.agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    spine = (
        b.select("grp")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "grp",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr(f"interval 1 {bucket}"))
            ).alias("bucket_ts"),
        )
    )
    j = spine.join(agg, ["grp", "bucket_ts"], "left").select(
        "grp",
        "bucket_ts",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        "avg_value",
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        F.col("grp").alias(group_col),
        "bucket_ts",
        "n_events",
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(w).alias("value_locf"),
        F.col("avg_value").isNull().alias("gap_filled"),
    )
