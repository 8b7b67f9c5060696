"""Keyed upsert (MERGE) over parquet tables — the general form of the
reference's per-row UPDATE (operator O23, ``datalake_compensation.py:
132-139``; SURVEY.md §7.3.4).

Vanilla Spark has no mutable storage, so an upsert is a recompute:
``existing ANTI-JOIN keys(updates) UNION updates`` → write to a temp
path → swap. One shuffle (the anti join on the key; broadcast when
the update batch is small, which is the common CDC case), atomic-ish
swap at the end. On a transactional table format (Delta/Iceberg) this
becomes a real MERGE INTO; the operator's contract stays the same.
"""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def swap_table_dir(table_path: str, new_path: str) -> None:
    """Replace ``table_path`` with ``new_path`` without a window where
    the table is gone: the old directory is renamed aside first, the
    new one moved in, and only then is the backup deleted. If the move
    fails mid-way the backup is restored, so a crash never leaves
    readers with a missing table. (Local-FS implementation; on HDFS/S3
    this maps to rename / committed overwrite.)
    """
    bak = f"{table_path}.__bak_{uuid.uuid4().hex[:8]}"
    shutil.move(table_path, bak)
    try:
        shutil.move(new_path, table_path)
    except BaseException:
        shutil.move(bak, table_path)  # restore; table never lost
        raise
    shutil.rmtree(bak)


def upsert_df(existing: DataFrame, updates: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rows of ``updates`` replace same-keyed rows of ``existing``;
    unmatched update rows are inserts. Column sets must match.

    The key set is NOT broadcast-hinted: via ``stream_upsert_to_table``
    with a file source and no trigger cap, batch 0 is the entire
    backlog — a hard hint there exceeds the driver/broadcast limits.
    AQE converts the anti join to broadcast at runtime whenever the
    batch is actually small (the common CDC case), so small batches
    keep the broadcast plan without the unbounded-hint failure mode.
    """
    assert set(existing.columns) == set(updates.columns), "schema mismatch"
    keys = updates.select(*key_cols).distinct()
    kept = existing.join(keys, on=key_cols, how="left_anti")
    return kept.unionByName(updates)


def upsert_table(
    spark: SparkSession, table_path: str, updates: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Upsert into a parquet table path with write-to-temp-and-swap
    (Spark cannot overwrite a path it is lazily reading)."""
    existing = spark.read.parquet(table_path)
    merged = upsert_df(existing, updates, key_cols)
    tmp = f"{table_path}.__tmp_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    swap_table_dir(table_path, tmp)
    return spark.read.parquet(table_path)
