"""Z-order clustering: data preserved, and file-level min/max
envelopes actually enable multi-column skipping (measured against a
single-column sort, the thing z-order must beat)."""

import glob
import random

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.zorder import zorder_key, zorder_table

N_FILES = 16


def _file_envelopes(path, cols):
    """[{col: (min, max)}] per parquet data file."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.read_metadata(f)
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                    maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def _intersecting(envs, col, lo, hi):
    return sum(1 for e in envs if not (e[col][1] < lo or e[col][0] > hi))


@pytest.fixture(scope="module")
def xy_table(spark, tmp_path_factory):
    rng = random.Random(7)
    rows = [(i, rng.randrange(1000), rng.randrange(1000)) for i in range(60_000)]
    df = spark.createDataFrame(rows, "id: long, x: long, y: long")
    base = tmp_path_factory.mktemp("zorder")
    xsorted = str(base / "xsorted")
    zordered = str(base / "zordered")
    df.repartitionByRange(N_FILES, "x").sortWithinPartitions("x").write.parquet(xsorted)
    df.write.parquet(zordered)
    zorder_table(spark, zordered, ["x", "y"], bits=8, num_files=N_FILES)
    return xsorted, zordered, rows


def test_zorder_preserves_data(spark, xy_table):
    _, zordered, rows = xy_table
    got = spark.read.parquet(zordered)
    assert got.count() == len(rows)
    assert sorted(map(tuple, got.collect())) == sorted(rows)
    # no swap leftovers
    assert not glob.glob(f"{zordered}.__*")


def test_zorder_skips_on_both_dimensions(spark, xy_table):
    """The measurable claim: a y-only filter prunes files on the
    z-ordered table but reads EVERY file of the x-sorted one; an
    x-only filter still prunes on both."""
    xsorted, zordered, _ = xy_table
    ex = _file_envelopes(xsorted, ["x", "y"])
    ez = _file_envelopes(zordered, ["x", "y"])
    assert len(ex) == len(ez) == N_FILES

    # y-filter: x-sorted is blind (all files intersect), z-order skips
    y_files_xsorted = _intersecting(ex, "y", 100, 199)
    y_files_zorder = _intersecting(ez, "y", 100, 199)
    assert y_files_xsorted == N_FILES
    assert y_files_zorder <= N_FILES // 2, (y_files_xsorted, y_files_zorder)

    # x-filter: z-order localizes x too (coarser than a pure x-sort,
    # but far from a full scan)
    x_files_zorder = _intersecting(ez, "x", 100, 199)
    assert x_files_zorder <= N_FILES // 2
    assert _intersecting(ex, "x", 100, 199) <= x_files_zorder

    # and Spark's scan applies it: row counts agree on the filtered box
    q = lambda p: (  # noqa: E731
        spark.read.parquet(p)
        .where((F.col("x").between(100, 199)) & (F.col("y").between(100, 199)))
        .count()
    )
    assert q(xsorted) == q(zordered)


def test_zorder_key_validation(spark):
    df = spark.createDataFrame([(1, 2)], "a: long, b: long")
    with pytest.raises(ValueError, match="fit a signed long"):
        zorder_key(df, ["a", "b"], bits=32)
    with pytest.raises(ValueError, match="2 columns"):
        zorder_key(df, ["a"], bits=8)


def test_zorder_cli_subcommand(spark, tmp_path, capsys):
    import os

    from dataflow_python_etl_spark import cli

    rng = random.Random(3)
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    spark.createDataFrame(
        [(i, rng.randrange(100), rng.randrange(100)) for i in range(5000)],
        "id: long, x: long, y: long",
    ).write.parquet(os.path.join(wh, "t"))
    cli.main(["zorder", "--warehouse", wh, "--table", "t", "--by", "x,y"])
    assert "z-ordered" in capsys.readouterr().out
    assert spark.read.parquet(os.path.join(wh, "t")).count() == 5000


def test_zorder_sketch_is_single_pass(spark, monkeypatch):
    """All per-column quantile sketches must come from ONE
    approxQuantile call (one job / one scan), however many z-order
    columns there are — k calls would be k full table passes at
    100 TB."""
    df = spark.createDataFrame(
        [(i, i % 17, (i * 7) % 23, i % 5) for i in range(2000)],
        "id: long, x: long, y: long, w: long",
    )
    cls = type(df)  # the concrete (classic) DataFrame class
    calls = []
    orig = cls.approxQuantile

    def counting(self, col, probs, eps):
        calls.append(col)
        return orig(self, col, probs, eps)

    monkeypatch.setattr(cls, "approxQuantile", counting)
    zorder_key(df, ["x", "y", "w"], bits=4)
    assert len(calls) == 1, calls
    assert calls[0] == ["x", "y", "w"]


def test_zorder_nan_rows_get_representable_rank(spark):
    """NaN/null rows (Bucketizer handleInvalid='keep' parks them one
    bucket PAST the quantile range) must clamp into the top bucket —
    not alias to rank 0 through the interleave mask and poison the
    lowest hyper-rectangle's envelope."""
    rows = [(float(i % 100), float((i * 13) % 100)) for i in range(4000)]
    rows += [(float("nan"), 50.0), (None, 50.0)]
    df = spark.createDataFrame(rows, "x: double, y: double")
    keyed, zcol = zorder_key(df, ["x", "y"], bits=4)
    out = keyed.collect()
    assert len(out) == len(rows)
    # x contributes bits at even positions; extract each row's x-rank
    def x_rank(z):
        return sum(((z >> (2 * b)) & 1) << b for b in range(4))

    ranks = {}
    for r in out:
        key = "nan" if r["x"] is None or r["x"] != r["x"] else "num"
        ranks.setdefault(key, set()).add(x_rank(r[zcol]))
    assert ranks["nan"] == {15}  # top bucket, NOT 0
    assert 0 in ranks["num"]  # real low values still rank low
