"""Typed JSON-lines ingest — the second source format beside
pipe-CSV. Same permissive philosophy as csv_ingest: explicit schema
(no sampling-based inference pass over 100 TB), malformed lines land
in a corrupt-record column instead of failing the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_typed_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSON-lines with an explicit schema.

    ``keep_corrupt=True`` appends a ``_corrupt_record`` string column
    holding the raw line for rows that failed to parse (PERMISSIVE
    mode); otherwise corrupt rows surface as all-NULL rows the caller
    can filter. Explicit schema means ONE pass over the data — never
    let Spark infer a schema by pre-scanning a 100 TB directory.
    """
    full = schema
    if keep_corrupt and CORRUPT_COL not in schema.fieldNames():
        full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    return spark.read.schema(full).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    ).json(path)
