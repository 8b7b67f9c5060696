"""Local replica of the driver's correctness gate: run every declared
query on Spark and its oracle on DuckDB, compare row count, column
names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [--changed-since REV] [sf_dir] [query ...]

``--changed-since REV`` scopes the run to the registry-diff subset
(tools/changed.py): queries whose queries.py block changed since REV
plus queries referencing any transitively-changed package module.
Infra changes (session/sources/schema/plans) force the full set. The
FULL run (no flag) remains mandatory at round end — the subset exists
for mid-round commit cadence only.
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from dataflow_python_etl_spark.queries import QUERIES
from dataflow_python_etl_spark.session import get_spark
from dataflow_python_etl_spark.sources.catalog import TESTDATA_TABLES


def _norm_cell(v) -> str:
    import datetime as dt
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    argv = sys.argv[1:]
    since: str | None = None
    if argv and argv[0] == "--changed-since":
        if len(argv) < 2 or argv[1].startswith("-"):
            print("usage: check_oracle.py [--changed-since REV] [sf_dir] [query ...]")
            return 2
        since = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    if since is not None:
        from changed import queries_affected_since

        scoped = queries_affected_since(since)
        if scoped is None:
            print(f"# --changed-since {since}: infra changed -> FULL run")
        else:
            only = (only & scoped) if only else scoped
            print(f"# --changed-since {since}: {len(only)} queries in scope")
            if not only:
                print("0 failures")
                return 0
    spark = get_spark(app_name="oracle-check", extra_conf={"spark.ui.enabled": "false"})

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    unknown = only - set(QUERIES)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        return 2

    failures = []
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(spec.oracle)
            d_cols = [d[0].lower() for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={s_cols} duck={d_cols}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            sh = value_hash(s_rows, s_cols)
            dh = value_hash(d_rows, d_cols)
            if sh != dh:
                problems.append(f"hash spark={sh} duck={dh}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
