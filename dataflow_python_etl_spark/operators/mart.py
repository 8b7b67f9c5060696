"""Mart build: dedup → two broadcast left joins → scalar transforms.

Re-expresses the reference's ``datalake_to_mart.py`` pipeline
(reference ``src/datalake_to_mart.py:146-218``) as ONE Catalyst plan:

- window dedup of the flight dim (``row_number() over (partition by
  cod_vuelo order by cod_tripulacion) ... rn = 1`` — reference
  ``:170-179``, operator O10),
- fact ⋈ passenger on ``dni`` and ⋈ flight on ``cod_avion`` as
  broadcast LEFT joins (the reference ships each dim whole to every
  worker as an ``AsDict`` side input, ``:198-201`` — a broadcast hash
  join by construction; operators O11–O13),
- ``abs(monto)`` (``:128-131``, O14) and name obfuscation
  (``:133-144``, O15).

Left-join misses keep the fact row with NULL dim columns, matching
the reference's KeyError-swallowing lookup (``:83-86,99-102``,
SURVEY.md §2.2.1). At scale the dims must stay under the broadcast
threshold; if they outgrow it, drop the hint and Catalyst falls back
to a shuffle join — semantics identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataflow_python_etl_spark.functions.core import abs_amount, obfuscate_name

# The 9-column fact projection the reference pushes into its source
# query (reference ``src/datalake_to_mart.py:56-69``, operator O8).
VENTA_COLUMNS = (
    "codigo_aerolinea",
    "cod_avion",
    "asiento",
    "dni",
    "monto",
    "estado",
    "fecha_reserva",
    "fecha_compra",
    "categoria",
)


def dedup_top1(
    df: DataFrame, partition_by: str | list[str], order_by: str | list[str]
) -> DataFrame:
    """Keep the first row per group under a total order (operator O10).

    Generic form of the reference's flight dedup; the explicit
    ORDER BY makes the survivor deterministic, unlike ``AsDict``'s
    last-writer-wins.
    """
    pb = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    ob = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(*pb).orderBy(*[F.col(c).asc() for c in ob])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def build_mart(
    venta: DataFrame, pasajero: DataFrame, vuelo: DataFrame
) -> DataFrame:
    """The full mart plan; returns the denormalized ``schema_prod``
    DataFrame (21 cols + NULL ``compensacion``, per
    ``resources/schema_prod.json`` / SURVEY.md FIXTURES)."""
    vuelo_dedup = dedup_top1(vuelo, "cod_vuelo", "cod_tripulacion")
    fact = venta.select(*VENTA_COLUMNS)
    out = (
        fact.join(F.broadcast(pasajero), on="dni", how="left")
        .join(F.broadcast(vuelo_dedup), on="cod_avion", how="left")
        .withColumn("monto", abs_amount("monto"))
        .withColumn("nombre_completo", obfuscate_name("nombre_completo"))
        # compensacion exists in the output schema but is never
        # populated by the mart build (the reference's 'Set
        # compensation' stage is commented out,
        # ``src/datalake_to_mart.py:202``; SURVEY.md §2.2.6).
        .withColumn("compensacion", F.lit(None).cast("string"))
    )
    return out
