"""Mergeable frequency sketches: Count-Min (Cormode & Muthukrishnan,
2005) over a token stream, built with the repo's PORTABLE hash family
(md5-derived, engine-reproducible) so sketch contents — not just
estimates — are bit-identical across engines and runs.

Why a sketch when exact counts are one groupBy away: the sketch is
d×w integers REGARDLESS of vocabulary size, mergeable by cell-wise
addition — the shape that survives streaming checkpoints, cross-
shard unions, and driver collection at 100 TB, where the exact
vocabulary table does not. Estimates overcount only (never under),
with error ≤ 2N/w at probability 1 − (1/2)^d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflow_python_etl_spark.functions.text import md5_hash60


def _cell(col, row: int, width: int):
    """Deterministic column index of ``col`` in sketch row ``row``."""
    return F.pmod(
        md5_hash60(F.concat(F.lit(f"cms-r{row}:"), col)), F.lit(width)
    ).cast("int")


def count_min_sketch(
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: ``(row, col, cnt)`` with exactly the cells
    that are non-zero (a dense d×w materialization is pointless in a
    DataFrame). ONE explode of depth d per item row plus a map-side-
    combined sum — shuffle volume is bounded by d×w per partition,
    never the item count. Merging two sketches is
    ``union().groupBy(row, col).sum(cnt)``."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    wcol = F.col(weight_col) if weight_col else F.lit(1)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    _cell(F.col(item_col), r, width).alias("col"),
                )
                for r in range(depth)
            ]
        )
    ).alias("rc")
    return (
        items.select(rows, wcol.alias("w"))
        .groupBy("rc.row", "rc.col")
        .agg(F.sum("w").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(item, est): Count-Min point estimates — min over rows of the
    probed cells. The probe set explodes to |probes|×d lookups joined
    against the sketch (broadcastable: the sketch is ≤ d×w rows by
    construction — THE point of sketching); absent cells read 0."""
    lookups = probes.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cell(F.col(item_col), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("item", "rc.row", "rc.col")
    return (
        lookups.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
