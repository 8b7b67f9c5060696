"""Typed pipe-delimited CSV ingest (operators O1–O6, SURVEY.md §2.1).

The reference reads lines with ``ReadFromText``, splits on ``|`` after
a quote-aware CSV pass, positionally zips values to the BigQuery
schema fields, and string-rewrites DATE/TIMESTAMP values (reference
``src/data_ingest.py:35-76,109-183``). Our engine expresses the same
ingest as ONE declarative scan: ``spark.read.csv`` with an all-string
schema (so dirty values never abort the scan), followed by typed
normalization per column. Catalyst fuses the normalization into the
scan stage — there is no row-at-a-time Python.

Dirty-data policy (SURVEY.md §7.3.5): the reference defers coercion to
BigQuery (where e.g. ``telefono='+56943657435'`` under INTEGER would
fail the load job); we use permissive ``try_cast`` semantics — values
that don't parse become NULL instead of failing the pipeline, after
stripping a leading ``+`` for integer-typed columns (phone numbers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataflow_python_etl_spark.functions.core import normalize_date, normalize_timestamp
from dataflow_python_etl_spark.schema import raw_string_schema

# Raw lexical formats in the reference's data files
# (``data_files/*.csv``): dates as YYYY/MM/DD, timestamps as
# "YYYYMMDD HH:mm:ss".
DATE_RAW_FMT = "yyyy/MM/dd"
TS_RAW_FMT = "yyyyMMdd HH:mm:ss"


def _typed_column(field: T.StructField) -> F.Column:
    """Normalization expression for one target column, from its raw string."""
    c = F.col(field.name)
    dt = field.dataType
    if isinstance(dt, T.DateType):
        # Accept both the raw slash format and already-ISO values.
        return F.coalesce(
            normalize_date(c, DATE_RAW_FMT), c.try_cast("date")
        ).alias(field.name)
    if isinstance(dt, T.TimestampType):
        return F.coalesce(
            normalize_timestamp(c, TS_RAW_FMT), c.try_cast("timestamp")
        ).alias(field.name)
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)):
        # Strip a leading '+' (e.g. phone numbers) then try_cast.
        return F.regexp_replace(c, r"^\+", "").try_cast(dt.simpleString()).alias(field.name)
    if isinstance(dt, T.StringType):
        return c.alias(field.name)
    return c.try_cast(dt.simpleString()).alias(field.name)


def read_typed_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = "|",
    header: bool = False,
) -> DataFrame:
    """Read a delimited file and produce typed columns per ``schema``.

    Column pruning and (for the string pass-throughs) filter pushdown
    reach the scan because the plan is a plain Project over a
    FileScan. No header by default: the reference passes no
    ``skip_header_lines`` and its CSVs have none (SURVEY.md §2.2.8).
    """
    raw = spark.read.csv(
        path,
        schema=raw_string_schema(schema),
        sep=sep,
        header=header,
        quote='"',
        mode="PERMISSIVE",
    )
    return raw.select(*[_typed_column(f) for f in schema.fields])


def ingest_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    out_path: str,
    sep: str = "|",
) -> DataFrame:
    """Ingest one CSV to a parquet table: CREATE_IF_NEEDED +
    WRITE_TRUNCATE ≡ ``mode('overwrite')`` (reference
    ``src/data_ingest.py:121-132``, operator O6)."""
    from dataflow_python_etl_spark.operators.upsert import write_and_swap

    df = read_typed_csv(spark, path, schema, sep=sep)
    write_and_swap(df, out_path)  # truncate semantics, crash-safe swap
    return spark.read.parquet(out_path)
