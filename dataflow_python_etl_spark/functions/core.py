"""Core scalar column functions re-expressing the reference's per-row
Python transforms as JVM-side Spark expressions.

Every function here returns a ``Column`` built from
``pyspark.sql.functions`` only — no Python/pandas UDFs — so the whole
hot path stays inside whole-stage codegen. The one reference transform
with fiddly char-level semantics (name obfuscation) is expressed with
``transform`` over a char array, which Catalyst evaluates JVM-side.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_date(col: Column | str, fmt: str = "yyyy/MM/dd") -> Column:
    """``YYYY/MM/DD`` string → typed DateType.

    The reference rewrites the string ``value.replace("/", "-")`` and
    lets BigQuery parse it (reference ``src/data_ingest.py:64-67``);
    we parse to a real DateType at ingest. ``try_to_date``: malformed
    values become NULL instead of failing the job under ANSI mode —
    one dirty row must never kill a 100 TB ingest.
    """
    return F.try_to_date(F.col(col) if isinstance(col, str) else col, fmt)


def normalize_timestamp(col: Column | str, fmt: str = "yyyyMMdd HH:mm:ss") -> Column:
    """``YYYYMMDD hh:mm:ss`` compact string → typed TimestampType.

    The reference slices the string into ``YYYY-MM-DD hh:mm:ss``
    (reference ``src/data_ingest.py:68-71``); we parse it typed.
    ``try_to_timestamp``: malformed values → NULL, never a job abort.
    """
    return F.try_to_timestamp(F.col(col) if isinstance(col, str) else col, F.lit(fmt))


def abs_amount(col: Column | str) -> Column:
    """Absolute value of a signed amount (reference
    ``src/datalake_to_mart.py:128-131``, operator O14)."""
    return F.abs(F.col(col) if isinstance(col, str) else col)


def obfuscate_name(col: Column | str) -> Column:
    """Mask a full name, char-for-char faithful to the reference
    (``src/datalake_to_mart.py:133-144``, operator O15).

    Semantics: split on single spaces; keep the first token verbatim;
    join the remaining tokens with spaces ("the last name"); in the
    last name, keep every space and every char equal to the last
    name's FIRST char, replace everything else with ``*``; result is
    ``first + " " + masked_last``. Edge cases preserved exactly:
    a single-token name yields ``name + " "`` (trailing space); every
    occurrence of the first char is kept, not just the first.

    Implemented as pure Catalyst expressions (split/slice/transform),
    so it vectorizes JVM-side — the reference does this row-at-a-time
    in Python.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, " ")
    first = F.element_at(toks, 1)
    rest = F.array_join(F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))), " ")
    head_char = F.substring(rest, 1, 1)
    chars = F.split(rest, "")
    masked = F.array_join(
        F.transform(
            chars,
            lambda x: F.when((x == head_char) | (x == F.lit(" ")), x).otherwise("*"),
        ),
        "",
    )
    return F.concat(first, F.lit(" "), masked)


def obfuscate_name_py(name: str) -> str:
    """Pure-Python reference model of :func:`obfuscate_name`, used as
    the property-test golden (SURVEY.md §5) and to build DuckDB-side
    oracle values. Reimplements the semantics of reference
    ``src/datalake_to_mart.py:133-144`` from the spec above.
    """
    toks = name.split(" ")
    first = toks[0]
    last = " ".join(toks[1:])
    masked = "".join(
        ch if (last and (ch == last[0] or ch == " ")) else "*" for ch in last
    )
    return first + " " + masked


def age_years(birth: Column | str, today: _dt.date | None = None) -> Column:
    """Age as bare year subtraction — NOT floor age.

    The reference computes ``dt.today().year - t.year`` (reference
    ``src/datalake_compensation.py:92-93``, operator O20): no
    month/day adjustment. ``today`` may be pinned for deterministic
    tests; defaults to the session's current_date.
    """
    b = F.col(birth) if isinstance(birth, str) else birth
    this_year = F.year(F.lit(today)) if today is not None else F.year(F.current_date())
    return this_year - F.year(b)


def quota_expr(count_col: Column) -> Column:
    """Preferential-ticket quota: ``cast(count/20 as int64) * 3``.

    BigQuery ``CAST(float AS INT64)`` rounds half away from zero,
    while Spark's ``cast('long')`` truncates — so the rounding must be
    explicit (reference ``src/datalake_compensation.py:100``, operator
    O19; SURVEY.md §2.2.7). Counts are non-negative, so HALF_UP ==
    half-away-from-zero here.
    """
    return (F.round(count_col / 20.0, 0) * 3).cast("long")
