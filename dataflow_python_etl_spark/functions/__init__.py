"""Scalar/column function library (SURVEY.md §2 operators O4/O5/O14/O15/O19/O20/O22)."""

from dataflow_python_etl_spark.functions.core import (
    abs_amount,
    age_years,
    normalize_date,
    normalize_timestamp,
    obfuscate_name,
    obfuscate_name_py,
    quota_expr,
)

__all__ = [
    "abs_amount",
    "age_years",
    "normalize_date",
    "normalize_timestamp",
    "obfuscate_name",
    "obfuscate_name_py",
    "quota_expr",
]
