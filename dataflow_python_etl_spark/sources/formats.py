"""Non-parquet table formats: JSON-lines and ORC read/write, plus an
import-gated Avro adapter.

The reference's I/O surface is pipe-CSV in and BigQuery tables out
(``src/data_ingest.py:35-96``); parquet is this engine's canonical
lake format (``sources/catalog.py``). Real pipelines also exchange
JSONL (crawl dumps, API exports) and ORC (Hive-era lakes), so those
are first-class here: both are built-in Spark datasources — the JVM
scans them with pushdown/pruning exactly like parquet, no Python in
the data path.

Write paths delegate to :func:`operators.upsert.write_and_swap`
(``fmt=``) — ONE implementation of the ``.__tmp_``/``.__bak_``
temp-and-swap contract, so a crash mid-write never leaves a
half-written table and vacuum/recover see the same naming everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from dataflow_python_etl_spark.operators.upsert import write_and_swap as _swap_write


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """JSON-lines table. An explicit ``schema`` skips Spark's
    inference pass — at 100 TB, inference is a FULL extra scan of the
    data; always pass the schema in production (same rule as the
    reference's explicit BigQuery JSON schemas, operator O3)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSONL sink with temp-and-swap. Nested structs/arrays/maps
    serialize naturally; binary columns are base64-encoded by Spark's
    JSON writer."""
    _swap_write(df, path, "json")


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC table — columnar like parquet: predicate pushdown, column
    pruning, and partition pruning all apply."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    _swap_write(df, path, "orc")


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro table. The ``spark-avro`` module is an external package
    (not bundled in this environment); gate, don't stub silently."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:  # AnalysisException: Failed to find data source
        raise NotImplementedError(
            "Avro requires the spark-avro package (org.apache.spark:spark-avro); "
            "add it to spark.jars.packages"
        ) from e
