"""Z-order (Morton) clustering for multi-column data skipping — the
``OPTIMIZE ... ZORDER BY`` of Delta/Iceberg lakes, over plain parquet.

A table range-sorted on one column prunes scans filtering on THAT
column only; filters on a second column read everything. Interleaving
the bits of per-column quantile ranks produces a single sort key whose
contiguous ranges are small HYPER-RECTANGLES in the multi-column
space, so parquet min/max stats (per row group / per file) become
tight for EVERY z-ordered column at once and Spark's scan-level stats
pruning skips most of the table for selective filters on any of them.

Construction (public technique — Morton codes + quantile binning, the
same recipe Delta's OPTIMIZE uses):

1. per column, map values to a ``2^bits``-bucket QUANTILE rank
   (``ml.feature.Bucketizer`` over driver-side ``approxQuantile``
   splits — quantiles, not min/max scaling, so skew cannot collapse
   the key space; the boundary list is tiny and rides the plan as
   literals);
2. interleave the rank bits into one long (pure shift/or expression
   tree, JVM-codegen'd);
3. ``repartitionByRange(z).sortWithinPartitions(z)`` and rewrite via
   the canonical temp-and-swap.

One shuffle total (the range partition); the quantile sketch is the
only driver traffic. Deterministic given the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, str]:
    """Attach the interleaved z-value column; returns (df, colname).

    ``bits`` quantile bits per column (default 256 buckets); total key
    width = ``bits × len(cols)`` ≤ 63.
    """
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit a signed long (≤ 63)")
    if len(cols) < 2:
        raise ValueError("z-ordering needs ≥ 2 columns (use a plain sort for 1)")
    from pyspark.ml.feature import Bucketizer

    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # ONE multi-column approxQuantile = ONE job building every
    # column's sketch in a single (column-pruned) pass over the table
    # — k separate calls would cost k full scans at 100 TB for
    # sketches one pass can build together.
    cast_cols = [F.col(c).cast("double").alias(c) for c in cols]
    all_splits = df.select(*cast_cols).approxQuantile(list(cols), probs, 0.001)
    out = df
    rank_cols = []
    for c, splits in zip(cols, all_splits):
        # strictly increasing splits only (duplicate quantiles on
        # low-cardinality columns collapse buckets, which is fine)
        uniq = sorted(set(splits))
        edges = [float("-inf"), *uniq, float("inf")]
        rc = f"__zr_{c}"
        bucketizer = Bucketizer(
            splits=edges, inputCol=f"__zd_{c}", outputCol=rc, handleInvalid="keep"
        )
        out = bucketizer.transform(out.withColumn(f"__zd_{c}", F.col(c).cast("double")))
        rank_cols.append(rc)
    # interleave: bit b of rank_i lands at position b*len(cols)+i
    z = F.lit(0).cast("long")
    for i, rc in enumerate(rank_cols):
        # handleInvalid='keep' parks NaN/null rows in bucket index
        # n_valid_buckets — one PAST the last quantile bucket, which
        # can need bits+1 bits when no splits collapsed. Clamp into
        # the representable range so such rows cluster with the TOP
        # bucket (they'd otherwise alias to rank 0 through the
        # interleave mask and drag the lowest hyper-rectangle's
        # min/max envelope across every NaN row's file).
        r = F.least(F.col(rc).cast("long"), F.lit(n_buckets - 1))
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(r.bitwiseAND(F.lit(1 << b)), b * (len(cols) - 1) + i)
            )
    out = out.withColumn("__zval", z)
    for c in cols:
        out = out.drop(f"__zd_{c}", f"__zr_{c}")
    return out, "__zval"


def zorder_table(
    spark: SparkSession,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
) -> None:
    """Rewrite the parquet table at ``path`` clustered by the z-order
    of ``cols`` (temp-and-swap; readers never see a missing table).

    After the rewrite, every file's min/max envelope is tight in all
    ``cols``, so selective filters on any of them skip most files —
    measured in ``tests/test_zorder.py`` against a single-column sort.
    """
    from dataflow_python_etl_spark.operators.upsert import write_and_swap

    df = spark.read.parquet(path)
    keyed, zcol = zorder_key(df, cols, bits)
    parts = [num_files] if num_files else []
    clustered = (
        keyed.repartitionByRange(*parts, F.col(zcol))
        .sortWithinPartitions(zcol)
        .drop(zcol)
    )
    write_and_swap(clustered, path)
