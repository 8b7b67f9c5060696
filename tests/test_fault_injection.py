"""Exhaustive crash-point fault injection for the three storage
protocols (VERDICT r10 #5): ``write_and_swap``,
``staged_partition_append`` and ``compact_table`` each promise a
recover-or-intact contract under process death. The existing replay
tests drive *known* crash windows; this sweep derives the windows
instead of enumerating them — every Python-side filesystem mutation
the protocol performs is a potential death point, and the test
crashes at EACH op index in turn.

Crash model (the part that makes this faithful): the injector wraps
the fs primitives (os.rename / os.remove / os.makedirs / shutil.move
/ shutil.rmtree / shutil.copyfile / open-for-write) with a
path-scope filter, and at the chosen op index the op raises
``InjectedCrash`` WITHOUT executing — after which every LATER
in-scope op refuses too. A plain raised exception would let
``except``-block rollback code run (swap_table_dir restores its
backup on failure), which a SIGKILL never does; suppressing all
subsequent fs ops freezes the state at the crash point exactly like
a kill would. ``InjectedCrash`` subclasses BaseException so no
production ``except Exception`` can swallow it (swap_table_dir's
``except BaseException`` restore path is itself made of fs ops, so
it re-raises through the injector).

Verification reads go through DuckDB, not Spark — an INDEPENDENT
reader checking "readers never see a torn or missing table" is a
stronger witness than the engine that wrote the files.
"""

from __future__ import annotations

import builtins
import glob
import os
import shutil

import duckdb
import pytest

from dataflow_python_etl_spark.operators.upsert import (
    recover_table_dir,
    staged_partition_append,
    write_and_swap,
)


class InjectedCrash(BaseException):
    pass


class Injector:
    """Counts / kills in-scope filesystem mutations. ``crash_at=None``
    is the census pass (runs clean, records the op trace)."""

    PATCHES = [
        (os, "rename"),
        (os, "remove"),
        (os, "makedirs"),
        (shutil, "move"),
        (shutil, "rmtree"),
        (shutil, "copyfile"),
    ]

    def __init__(self, scope_prefix: str, crash_at: int | None = None):
        self.scope = os.path.abspath(scope_prefix)
        self.crash_at = crash_at
        self.n = 0
        self.dead = False
        self.trace: list[tuple[str, tuple]] = []
        self._saved: list[tuple] = []

    def _in_scope(self, args) -> bool:
        for a in args:
            if isinstance(a, (str, os.PathLike)) and os.path.abspath(
                os.fspath(a)
            ).startswith(self.scope):
                return True
        return False

    def _gate(self, name: str, args) -> None:
        if not self._in_scope(args):
            return
        if self.dead:
            raise InjectedCrash(f"post-crash fs op suppressed: {name}{args!r}")
        if self.crash_at is not None and self.n == self.crash_at:
            self.dead = True
            raise InjectedCrash(f"crash at op {self.n}: {name}{args!r}")
        self.n += 1
        self.trace.append(
            (
                name,
                tuple(
                    os.fspath(a)
                    for a in args
                    if isinstance(a, (str, os.PathLike))
                ),
            )
        )

    def __enter__(self) -> "Injector":
        inj = self
        for mod, name in self.PATCHES:
            real = getattr(mod, name)
            self._saved.append((mod, name, real))

            def make(real, name):
                def wrapped(*a, **kw):
                    inj._gate(name, a)
                    return real(*a, **kw)

                return wrapped

            setattr(mod, name, make(real, name))
        real_open = builtins.open
        self._saved.append((builtins, "open", real_open))

        def wrapped_open(file, mode="r", *a, **kw):
            if any(c in str(mode) for c in "wxa"):
                inj._gate("open", (file,))
            return real_open(file, mode, *a, **kw)

        builtins.open = wrapped_open
        return self

    def __exit__(self, *exc):
        for mod, name, real in self._saved:
            setattr(mod, name, real)
        return False


def _rows(path: str, hive: bool = False) -> list[tuple]:
    """Independent read of a parquet table dir via DuckDB (raises on a
    torn/unreadable file — that raise IS the assertion). The glob is
    explicit about depth: `**` would descend into the hidden
    `.__append_tmp_*` stage dir and count STAGED rows as visible,
    which is exactly the reader-visibility question under test."""
    con = duckdb.connect()
    if hive:
        pat, opts = f"{path}/*=*/*.parquet", ", hive_partitioning=1"
    else:
        pat, opts = f"{path}/*.parquet", ""
    try:
        return sorted(
            con.execute(
                f"SELECT * FROM read_parquet('{pat}'{opts})"
            ).fetchall()
        )
    finally:
        con.close()


def _vacuum_leftovers(table: str) -> None:
    for p in glob.glob(f"{glob.escape(table)}.__tmp_*") + glob.glob(
        f"{glob.escape(table)}.__bak_*"
    ):
        shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)


# ---------------------------------------------------------------------------
# write_and_swap: old table (+ its sidecar) must stay readable until
# the instant the new table (+ ITS sidecar) replaces it — at every
# crash point the independent reader sees exactly old-with-old-ledger
# or new-with-new-ledger, never a mix, never a torn dir; a missing
# table is restored by recover_table_dir.
# ---------------------------------------------------------------------------


def test_write_and_swap_every_crash_point(spark, tmp_path):
    old_df = spark.range(0, 5).selectExpr("id", "id * 10 AS v")
    new_df = spark.range(100, 108).selectExpr("id", "id * 10 AS v")
    old_rows = sorted((i, i * 10) for i in range(5))
    new_rows = sorted((i, i * 10) for i in range(100, 108))

    def build(base: str) -> str:
        table = os.path.join(base, "t")
        write_and_swap(old_df, table, extra_files={"_ledger.json": "old"})
        return table

    def run(table: str) -> None:
        write_and_swap(new_df, table, extra_files={"_ledger.json": "new"})

    # census pass: count the protocol's in-scope mutations
    base0 = str(tmp_path / "census")
    os.makedirs(base0)
    table = build(base0)
    with Injector(base0) as inj:
        run(table)
    n_ops = inj.n
    assert n_ops >= 4, inj.trace  # ledger write + move/move/delete swap
    assert _rows(table) == new_rows

    for k in range(n_ops):
        base = str(tmp_path / f"k{k}")
        os.makedirs(base)
        table = build(base)
        with Injector(base, crash_at=k):
            with pytest.raises(InjectedCrash):
                run(table)
        if not os.path.exists(table):
            assert recover_table_dir(table), f"k={k}: table lost for good"
        rows = _rows(table)
        with open(os.path.join(table, "_ledger.json")) as f:
            ledger = f.read()
        assert (rows, ledger) in [
            (old_rows, "old"),
            (new_rows, "new"),
        ], f"k={k}: torn state rows={rows[:3]} ledger={ledger}"
        # not wedged: vacuum leftovers, retry, converge to new
        _vacuum_leftovers(table)
        run(table)
        assert _rows(table) == new_rows
        with open(os.path.join(table, "_ledger.json")) as f:
            assert f.read() == "new"


# ---------------------------------------------------------------------------
# staged_partition_append: at every crash point the visible table is
# a complete-file state holding old rows plus a SUBSET of the new
# files (never a dup, never a loss); the next append refuses while
# stage leftovers exist; the documented recovery (finish the move)
# converges to exactly old ∪ new.
# ---------------------------------------------------------------------------


def _finish_stage_recovery(table: str, partition_col: str) -> None:
    """The recovery the staged-append refusal message prescribes:
    move any staged partition files into the table, drop the stage."""
    prefix = f"{partition_col}="
    for stage in glob.glob(os.path.join(glob.escape(table), ".__append_tmp_*")):
        for part in sorted(os.listdir(stage)):
            src_dir = os.path.join(stage, part)
            if not (part.startswith(prefix) and os.path.isdir(src_dir)):
                continue
            dst_dir = os.path.join(table, part)
            os.makedirs(dst_dir, exist_ok=True)
            for fname in sorted(os.listdir(src_dir)):
                if fname.startswith((".", "_")):
                    continue
                dst = os.path.join(dst_dir, fname)
                if not os.path.exists(dst):
                    os.rename(os.path.join(src_dir, fname), dst)
        shutil.rmtree(stage)


def test_staged_partition_append_every_crash_point(spark, tmp_path):
    old_df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2)], "id long, p long"
    ).coalesce(1)
    new_df = spark.createDataFrame(
        [(10, 2), (11, 3)], "id long, p long"
    ).coalesce(1)
    old_rows = sorted([(1, 1), (2, 1), (3, 2)])
    new_rows = sorted([(10, 2), (11, 3)])
    want = sorted(old_rows + new_rows)

    def build(base: str) -> str:
        table = os.path.join(base, "t")
        old_df.write.partitionBy("p").parquet(table)
        return table

    def run(table: str) -> None:
        staged_partition_append(new_df, table, "p", "fault-sweep")

    base0 = str(tmp_path / "census")
    os.makedirs(base0)
    table = build(base0)
    with Injector(base0) as inj:
        run(table)
    n_ops = inj.n
    # >= makedirs+rename per new partition (2 partitions) + stage rmtree
    assert n_ops >= 5, inj.trace
    assert _rows(table, hive=True) == want

    for k in range(n_ops):
        base = str(tmp_path / f"k{k}")
        os.makedirs(base)
        table = build(base)
        with Injector(base, crash_at=k):
            with pytest.raises(InjectedCrash):
                run(table)
        visible = _rows(table, hive=True)  # raises on any torn file
        assert set(old_rows) <= set(visible) <= set(want), f"k={k}"
        assert len(visible) == len(set(visible)), f"k={k}: duplicated rows"
        leftovers = [
            d for d in os.listdir(table) if d.startswith(".__append_tmp_")
        ]
        if leftovers:
            # the protocol must REFUSE a blind re-append (it would dup
            # the already-moved rows) and the prescribed recovery must
            # converge to exactly old ∪ new
            with pytest.raises(ValueError, match="leftover append stage"):
                run(table)
            _finish_stage_recovery(table, "p")
        else:
            # crash consumed the stage without moving everything is
            # impossible: no leftovers ⇒ every file landed
            pass
        assert _rows(table, hive=True) == want, f"k={k}"
        # and the table accepts future appends again
        staged_partition_append(
            spark.createDataFrame([(99, 9)], "id long, p long").coalesce(1),
            table,
            "p",
            "fault-sweep",
        )
        assert _rows(table, hive=True) == sorted(want + [(99, 9)])


# ---------------------------------------------------------------------------
# compact_table: a pure physical rewrite — at every crash point the
# independent reader sees the exact original multiset (or the
# compacted one), the '_'-sidecar is never separated from its data,
# and after recovery a re-run compacts cleanly.
# ---------------------------------------------------------------------------


def test_compact_table_every_crash_point(spark, tmp_path):
    from dataflow_python_etl_spark.operators.upsert import compact_table

    df = spark.range(0, 40).selectExpr("id", "id % 7 AS v").repartition(4)
    want = sorted((i, i % 7) for i in range(40))

    def build(base: str) -> str:
        table = os.path.join(base, "t")
        df.write.parquet(table)
        with open(os.path.join(table, "_applied_batch.json"), "w") as f:
            f.write('{"batch": 7}')
        return table

    def run(table: str) -> None:
        compact_table(spark, table)

    base0 = str(tmp_path / "census")
    os.makedirs(base0)
    table = build(base0)
    with Injector(base0) as inj:
        run(table)
    n_ops = inj.n
    # sidecar carry (makedirs+copyfile) + move/move/delete swap
    assert n_ops >= 5, inj.trace
    assert _rows(table) == want
    assert os.path.exists(os.path.join(table, "_applied_batch.json"))

    for k in range(n_ops):
        base = str(tmp_path / f"k{k}")
        os.makedirs(base)
        table = build(base)
        with Injector(base, crash_at=k):
            with pytest.raises(InjectedCrash):
                run(table)
        if not os.path.exists(table):
            assert recover_table_dir(table), f"k={k}: table lost for good"
        assert _rows(table) == want, f"k={k}"
        with open(os.path.join(table, "_applied_batch.json")) as f:
            assert f.read() == '{"batch": 7}', f"k={k}: sidecar separated"
        _vacuum_leftovers(table)
        stats = compact_table(spark, table)
        assert stats["n_rows"] == 40
        assert _rows(table) == want
        with open(os.path.join(table, "_applied_batch.json")) as f:
            assert f.read() == '{"batch": 7}'


# ---------------------------------------------------------------------------
# BandIndexStore.forget: the erasure rewrite composes swap_table_dir
# with CATALOG operations (tmp-table create, drops, refresh) — the
# crash windows between the file swap and the catalog cleanup are
# exactly what the generic write_and_swap sweep cannot reach. At
# every fs crash point: the index FILES are old or new (never torn,
# recover_table_dir if missing), a re-run of forget converges to the
# erased state, the stale tmp catalog entry is cleaned up, and the
# catalog probe still reads the (bucketed) index.
# ---------------------------------------------------------------------------


def test_band_index_forget_every_crash_point(spark, tmp_path):
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.dedup import (
        BandIndexStore,
        minhash_band_index,
        unpersist_all,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta echo foxtrot"),
            (2, "bravo charlie delta echo golf hotel"),
            (3, "zanzibar unique nowhere else zanzibar appears"),
            (4, "charlie delta echo india juliet kilo"),
        ],
        "doc_id: long, text: string",
    )
    keys = spark.createDataFrame([(3,)], "doc: long")

    def build(base: str) -> "BandIndexStore":
        store = BandIndexStore(
            spark, "t_fi_bix", path=os.path.join(base, "bix"), n_buckets=2
        )
        store.append(minhash_band_index(docs))
        unpersist_all()
        return store

    def docs_in_index(store) -> set:
        return {
            r["doc"]
            for r in store.read().select("doc").distinct().collect()
        }

    # census
    base0 = str(tmp_path / "census")
    os.makedirs(base0)
    store = build(base0)
    with Injector(base0) as inj:
        store.forget(keys)
    n_ops = inj.n
    assert n_ops >= 3, inj.trace  # swap_table_dir: move, move, delete
    assert docs_in_index(store) == {1, 2, 4}
    store.drop()

    for k in range(n_ops):
        base = str(tmp_path / f"k{k}")
        os.makedirs(base)
        store = build(base)
        loc = os.path.join(base, "bix")
        with Injector(base, crash_at=k):
            with pytest.raises(InjectedCrash):
                store.forget(keys)
        unpersist_all()
        if not os.path.exists(loc):
            assert recover_table_dir(loc), f"k={k}: index files lost"
        visible = set(
            r[0]
            for r in spark.read.parquet(loc).select("doc").distinct().collect()
        )
        assert visible in ({1, 2, 3, 4}, {1, 2, 4}), f"k={k}: torn {visible}"
        # recovery: vacuum fs leftovers, re-run forget — converges,
        # stale tmp catalog entry from the crashed run is dropped
        _vacuum_leftovers(loc)
        spark.catalog.refreshTable("t_fi_bix")
        before, removed = store.forget(keys)
        unpersist_all()
        assert docs_in_index(store) == {1, 2, 4}, f"k={k}"
        # idempotent re-run: 8 band rows (32 perms / 4 per band) if the
        # crash left the OLD files, 0 if the swap had already landed
        assert removed in (0, 8), f"k={k}: removed={removed}"
        assert before in (24, 32), f"k={k}: before={before}"
        assert not spark.catalog.tableExists("t_fi_bix__fk_tmp"), f"k={k}"
        store.drop()
