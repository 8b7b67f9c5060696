"""Table profiling: per-column statistics in ONE aggregation pass —
the ANALYZE/data-quality step a pipeline runs before trusting a new
drop of data (null explosions, cardinality collapse, range drift).

All columns' aggregates evaluate in a single groupBy-less ``agg`` (one
job, map-side partial aggregation, no shuffle beyond the final
single-row combine), then unpivot driver-side — the profile itself is
O(#columns), never O(rows). Distinct counts are HyperLogLog
(``approx_count_distinct``): exact distinct per column would be one
shuffle EACH at 100 TB; HLL folds into the same single pass at ~2%
relative error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def profile_agg(df: DataFrame, rsd: float = 0.02) -> DataFrame:
    """The single wide aggregate behind :func:`profile_table`, exposed
    so its plan (one scan, no extra exchanges) can be pinned in tests
    before the driver-side collect happens."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c, dtype in df.dtypes:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        # Spark cannot hash MapType (anywhere in the type tree), so the
        # HLL aggregate would throw AnalysisException — count-only there
        if "map<" not in dtype:
            aggs.append(F.approx_count_distinct(c, rsd=rsd).alias(f"{c}__dist"))
        # min/max are meaningless for complex types; count-only there
        if not dtype.startswith(("array", "map", "struct", "binary")):
            aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
    return df.agg(*aggs)


def profile_table(df: DataFrame, rsd: float = 0.02) -> DataFrame:
    """One row per column: (column, dtype, n_rows, n_nulls,
    null_frac, n_distinct_approx, min, max).

    min/max are cast to string so heterogeneous column types fit one
    output schema (the consumer is a human or a data-quality rule,
    not arithmetic). Returns a small local DataFrame built from the
    single collected aggregate row.
    """
    spark = df.sparkSession
    row = profile_agg(df, rsd).first()
    n = row["__n"]
    out = []
    for c, dtype in df.dtypes:
        nulls = row[f"{c}__nulls"] or 0
        out.append(
            Row(
                column=c,
                dtype=dtype,
                n_rows=n,
                n_nulls=nulls,
                null_frac=round(nulls / n, 6) if n else 0.0,
                n_distinct_approx=row.asDict().get(f"{c}__dist"),
                min=row.asDict().get(f"{c}__min"),
                max=row.asDict().get(f"{c}__max"),
            )
        )
    return spark.createDataFrame(
        out,
        "column: string, dtype: string, n_rows: long, n_nulls: long, "
        "null_frac: double, n_distinct_approx: long, min: string, max: string",
    )
