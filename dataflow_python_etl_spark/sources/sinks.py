"""Sinks beyond plain overwrite: partitioned and bucketed tables.

At 100 TB the physical layout IS the optimization:

- ``write_partitioned``: hive-style directory partitioning on a
  low-cardinality column (date, region). Queries filtering on the
  partition column prune whole directories before any I/O
  (PartitionFilters in the scan, distinct from row-group pushdown).
- ``write_bucketed``: pre-shuffle the table ONCE into N buckets by the
  join/agg key. Two tables bucketed the same way join with ZERO
  exchanges — the shuffle is amortized into the write. This is the
  Spark-native answer to the reference's "all results from a given
  account number on one worker" comment
  (reference ``src/datalake_to_mart.py:157-160``).

Bucketed tables must go through ``saveAsTable`` (the bucket metadata
lives in the catalog, not the parquet files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str | list[str],
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed catalog table; multi-column bucket keys co-locate a
    composite join key (e.g. the LSH (band, sig) probe). ``path`` makes
    it an EXTERNAL table so the files live at a caller-chosen location
    while the bucket spec lives in the catalog."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = df.write.mode(mode).bucketBy(n_buckets, cols[0], *cols[1:])
    if sort_col:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables — shuffle-free by layout."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)
