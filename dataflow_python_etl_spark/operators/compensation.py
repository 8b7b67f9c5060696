"""Compensation assignment — deterministic windowed recompute.

The reference's ``datalake_compensation.py`` is a per-row
read-modify-write loop: for EVERY mart row it opens a BigQuery client
on the worker, runs two aggregation queries, and conditionally issues
an UPDATE (reference ``src/datalake_compensation.py:88-142``) — three
network round-trips per row, with results that depend on
nondeterministic worker order because each row's quota check reads
state its predecessors mutated (SURVEY.md §2.2.6). That design is
O(rows) RPCs and cannot scale.

Our engine computes the identical business rule as ONE deterministic
Catalyst plan (SURVEY.md §7.3.1) — zero per-row I/O:

- per-flight quota ``a = cast(round(count(*)/20) as int64)*3``
  (reference ``:98-103``, operators O18/O19, BQ rounding semantics);
- ``b`` = compensations already granted (reference ``:105-111``,
  operators O16/O17) — window count over the current column;
- age = bare year subtraction (reference ``:92-93``, O20);
- eligibility: age<14 → ASISTENCIA_PREFERENCIAL, age>60 →
  ASIENTO_PREFERENCIAL (reference ``:127-130``, O22);
- rows with NULL/empty birthdate are never updated (reference
  ``:90-91,140-141``, O21);
- the quota gate ``a - b > 0`` (reference ``:126``) becomes a
  deterministic rank: eligible rows ordered by ``(fecha_compra, dni)``
  win the remaining slots; when quota remains, non-eligible rows are
  stamped ``NO APLICA`` (reference default at ``:120`` + update at
  ``:132-139``); rows beyond quota / when quota is 0 keep their prior
  value, because the reference then never issues an UPDATE.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataflow_python_etl_spark.functions.core import age_years, quota_expr

ASISTENCIA = "ASISTENCIA_PREFERENCIAL"
ASIENTO = "ASIENTO_PREFERENCIAL"
NO_APLICA = "NO APLICA"
_GRANTED = (ASISTENCIA, ASIENTO)


def with_compensation(
    mart: DataFrame,
    today: _dt.date | None = None,
    flight_col: str = "cod_vuelo",
    birth_col: str = "fecha_de_nacimiento",
    order_cols: tuple[str, ...] = ("fecha_compra", "dni"),
) -> DataFrame:
    """Return ``mart`` with its ``compensacion`` column recomputed.

    One pass, two window specs over the same partitioning key — Spark
    executes them with a single shuffle on ``flight_col`` (AQE handles
    skewed flights). ``today`` pins the age computation for
    deterministic tests.
    """
    flight = Window.partitionBy(flight_col)
    age = age_years(F.col(birth_col), today=today)
    eligible = F.col(birth_col).isNotNull() & ((age < 14) | (age > 60))

    # Remaining quota a - b, from the CURRENT table state (b counts
    # compensations granted by a previous run, reference :105-111).
    a = quota_expr(F.count(F.lit(1)).over(flight))
    b = F.count(F.when(F.col("compensacion").isin(*_GRANTED), 1)).over(flight)
    remaining = a - b

    # Deterministic stand-in for the reference's racy first-come
    # ordering: eligible rows sort first, then by (fecha_compra, dni).
    rank_w = flight.orderBy(
        eligible.cast("int").desc(), *[F.col(c).asc() for c in order_cols]
    )
    rk = F.row_number().over(rank_w)

    new_comp = (
        F.when(F.col(birth_col).isNull(), F.col("compensacion"))
        .when(remaining <= 0, F.col("compensacion"))
        .when(eligible & (rk <= remaining), F.when(age < 14, ASISTENCIA).otherwise(ASIENTO))
        .when(eligible, F.col("compensacion"))  # beyond quota: no UPDATE fires
        .otherwise(F.lit(NO_APLICA))
    )
    return mart.withColumn("compensacion", new_comp)


def apply_compensation(
    spark, table_path: str, today: _dt.date | None = None
) -> DataFrame:
    """UPDATE-in-place equivalent for a parquet-backed table
    (operator O23, SURVEY.md §7.3.4).

    Spark can't overwrite a path it is lazily reading, so this
    materializes to a sibling temp path and swaps directories with a
    backup-then-replace (see ``operators.upsert.swap_table_dir``) so a
    mid-swap failure never loses the table.
    """
    from dataflow_python_etl_spark.operators.upsert import write_and_swap

    df = spark.read.parquet(table_path)
    write_and_swap(with_compensation(df, today=today), table_path)
    return spark.read.parquet(table_path)
