"""Third-scale-point probe for the heaviest document-table queries.

``bench.py`` measures each query at sf0.01 and sf0.1 and flags
super-linear scaling from that single decade. The driver ships no
larger scale factor, so this probe builds one: it replicates the
sf0.1 ``documents`` table R ∈ {1, 2, 4}× into a temp dir and times
the target queries at each size, then fits the log-log scaling
exponent by least squares over the three points — two decades of
evidence instead of one for the queries whose exponents are the
set's highest (q54/q58/q59 per BENCH_r04).

Replication is NOT naive duplication: each replica maps the text
through a per-replica alphabet rotation (a deterministic bijection on
[a-z]/[A-Z]/[0-9]). A bijection applied uniformly preserves shingle
equality WITHIN a replica, so every replica carries exactly the
original's near-dup pair structure, while cross-replica copies of the
same document share (almost) no shingles and produce no pairs — the
pair workload therefore grows linearly in R by construction, and a
measured super-linear exponent indicts the PLAN, not the data. This
is a bench-only synthetic (documented as such in docs/SCALE.md);
oracle correctness always runs on the driver's parquet unmodified.

Usage: python tools/scale_probe.py [--replicas 1,2,4[,8]] [query ...]
(default replicas 1,2,4; default queries q54 q58 q59). Pass
``--replicas 1,2,4,8`` for a fourth point (three decades) on the
heaviest shuffles — the graph family's round-7 evidence ask.
Prints one JSON line: {"points": {"1": {...}}, "exponent": {...},
"superlinear": [...]}.
"""

from __future__ import annotations

import json
import os
import shutil
import string
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_QUERIES = ["q54_incremental_minhash_pairs", "q58_lm_perplexity", "q59_simhash_pairs"]
REPLICAS = [1, 2, 4]
SUPERLINEAR_EXPONENT = 1.15  # same gate as bench.py, now over 3 points
ID_STRIDE = 10_000_000  # replica r: doc_id + r * ID_STRIDE


def _rotation(r: int) -> dict[int, int] | None:
    """Per-replica bijection: rotate each of [a-z], [A-Z], [0-9] by r."""
    if r == 0:
        return None
    table: dict[int, int] = {}
    for alphabet in (string.ascii_lowercase, string.ascii_uppercase, string.digits):
        n = len(alphabet)
        for i, c in enumerate(alphabet):
            table[ord(c)] = ord(alphabet[(i + r) % n])
    return table


def build_replicated(src_dir: str, out_dir: str, replicas: int) -> int:
    """Write ``documents/events/orders/lineitem.parquet`` with
    ``replicas``× the source rows (pandas/pyarrow only — no second
    Spark JVM during generation). Documents replicate under the
    alphabet bijection (pair structure preserved per replica); events
    replicate under a user_id/event_id offset, so user-keyed
    analytics (funnel/retention/transitions/SCD2) gain R× independent
    users while time-bucket rollups gain R× events per bucket — both
    linear workloads by construction."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    src = pq.read_table(f"{src_dir}/documents.parquet").to_pandas()
    parts = []
    for r in range(replicas):
        part = src.copy()
        part["doc_id"] = part["doc_id"] + r * ID_STRIDE
        rot = _rotation(r)
        if rot is not None:
            part["text"] = part["text"].map(lambda t: t.translate(rot))
        parts.append(part)
    out = pd.concat(parts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                   f"{out_dir}/documents.parquet")

    ev = pq.read_table(f"{src_dir}/events.parquet").to_pandas()
    eparts = []
    for r in range(replicas):
        part = ev.copy()
        part["event_id"] = part["event_id"] + r * ID_STRIDE
        part["user_id"] = part["user_id"] + r * ID_STRIDE
        eparts.append(part)
    eout = pd.concat(eparts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(eout, preserve_index=False),
                   f"{out_dir}/events.parquet")

    # orders replicates with the order AND customer keys strided:
    # keyed snapshot / reconciliation workloads (q118's full-outer
    # diff) gain R× independent keys, and the customer—supplier
    # co-transaction graph (q100's BFS) gains R independent
    # components — linear by construction, like the rest.
    od = pq.read_table(f"{src_dir}/orders.parquet").to_pandas()
    oparts = []
    for r in range(replicas):
        part = od.copy()
        part["o_orderkey"] = part["o_orderkey"] + r * ID_STRIDE
        part["o_custkey"] = part["o_custkey"] + r * ID_STRIDE
        oparts.append(part)
    oout = pd.concat(oparts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(oout, preserve_index=False),
                   f"{out_dir}/orders.parquet")

    # lineitem replicates with the basket, item, AND supplier keys
    # strided, so each replica is an independent copy of the
    # co-purchase and co-transaction graphs — basket sizes, item
    # frequencies, pair/triangle/BFS structure all preserved per
    # replica; cross-replica edges impossible. Basket analytics
    # (q131) and graph metrics (q87/q138/q100) are therefore
    # linear-in-R by construction.
    li = pq.read_table(f"{src_dir}/lineitem.parquet").to_pandas()
    lparts = []
    for r in range(replicas):
        part = li.copy()
        part["l_orderkey"] = part["l_orderkey"] + r * ID_STRIDE
        part["l_partkey"] = part["l_partkey"] + r * ID_STRIDE
        part["l_suppkey"] = part["l_suppkey"] + r * ID_STRIDE
        lparts.append(part)
    lout = pd.concat(lparts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(lout, preserve_index=False),
                   f"{out_dir}/lineitem.parquet")

    # customer and supplier replicate under the same key stride as
    # the fact columns that reference them (o_custkey, l_suppkey) —
    # copying either unstrided would leave replicas r>=1 with
    # dangling FKs, and any probed query joining through them would
    # measure a SHRINKING join, not the plan (review-caught). The
    # keyless small dims copy through unchanged.
    for tbl, keys in (("customer", ["c_custkey"]), ("supplier", ["s_suppkey"])):
        src = f"{src_dir}/{tbl}.parquet"
        if not os.path.exists(src):
            continue
        base = pq.read_table(src).to_pandas()
        tparts = []
        for r in range(replicas):
            part = base.copy()
            for k in keys:
                part[k] = part[k] + r * ID_STRIDE
            tparts.append(part)
        tout = pd.concat(tparts, ignore_index=True)
        pq.write_table(pa.Table.from_pandas(tout, preserve_index=False),
                       f"{out_dir}/{tbl}.parquet")
    # part replicates under the SAME key stride as l_partkey — copying
    # it unstrided leaves replicas r>=1 with dangling part FKs, so any
    # part-joining probe (q160's brand blocks) would measure a
    # SHRINKING join (the customer/supplier rationale above). Brand/
    # attribute columns copy through, so each replica carries the
    # original's full brand structure.
    pt_src = f"{src_dir}/part.parquet"
    if os.path.exists(pt_src):
        base = pq.read_table(pt_src).to_pandas()
        pparts = []
        for r in range(replicas):
            part = base.copy()
            part["p_partkey"] = part["p_partkey"] + r * ID_STRIDE
            pparts.append(part)
        pq.write_table(
            pa.Table.from_pandas(pd.concat(pparts, ignore_index=True),
                                 preserve_index=False),
            f"{out_dir}/part.parquet",
        )

    # embeddings replicate under the vec_id stride (matching doc_id,
    # so semantic tiers joining documents x embeddings stay aligned
    # per replica) with each replica's vectors DIMENSION-ROLLED by r:
    # a coordinate permutation preserves norms and within-replica
    # inner products exactly — every replica carries the original's
    # neighbor structure — while the serving-shaped probes (fixed
    # query batch from replica 0, corpus growing R x) scan a linear-
    # by-construction candidate volume.
    em_src = f"{src_dir}/embeddings.parquet"
    if os.path.exists(em_src):
        import numpy as np

        base = pq.read_table(em_src).to_pandas()
        eparts2 = []
        for r in range(replicas):
            part = base.copy()
            part["vec_id"] = part["vec_id"] + r * ID_STRIDE
            if r:
                part["embedding"] = part["embedding"].map(
                    lambda v, _r=r: np.roll(np.asarray(v), _r).tolist()
                )
            eparts2.append(part)
        pq.write_table(
            pa.Table.from_pandas(pd.concat(eparts2, ignore_index=True),
                                 preserve_index=False),
            f"{out_dir}/embeddings.parquet",
        )

    for small in ("region", "nation"):
        src = f"{src_dir}/{small}.parquet"
        if os.path.exists(src):
            shutil.copyfile(src, f"{out_dir}/{small}.parquet")
    return len(out)


def _fit_exponent(ns: list[int], ts: list[float]) -> float:
    """Least-squares slope of log t against log n."""
    import math

    xs = [math.log(n) for n in ns]
    ys = [math.log(t) for t in ts]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return round(num / den, 3)


def main() -> int:
    argv = sys.argv[1:]
    replicas = list(REPLICAS)
    if argv and argv[0] == "--replicas":
        replicas = sorted({int(x) for x in argv[1].split(",")})
        argv = argv[2:]
        if len(replicas) < 3:
            print("--replicas needs >= 3 points for a slope", file=sys.stderr)
            return 2
    queries = argv or DEFAULT_QUERIES
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dataflow_python_etl_spark.operators.dedup import unpersist_all
    from dataflow_python_etl_spark.queries import QUERIES
    from dataflow_python_etl_spark.session import get_spark

    unknown = [q for q in queries if q not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="scale-probe", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        dirs: dict[int, str] = {}
        rows: dict[int, int] = {}
        for r in replicas:
            d = f"{root}/x{r}"
            rows[r] = build_replicated(src_dir, d, r)
            dirs[r] = d

        points: dict[str, dict[str, float]] = {str(r): {} for r in replicas}
        for name in queries:
            fn = QUERIES[name].fn
            for r in replicas:
                times = []
                for i in range(3):  # run 0 = codegen warm-up, then 2 timed
                    t0 = time.perf_counter()
                    fn(spark, dirs[r]).count()
                    if i > 0:
                        times.append(time.perf_counter() - t0)
                    unpersist_all()
                points[str(r)][name] = round(min(times), 3)

        exponent = {
            name: _fit_exponent(
                [rows[r] for r in replicas],
                [points[str(r)][name] for r in replicas],
            )
            for name in queries
        }
        report = {
            "probe": "replicated-tables",
            "src": src_dir,
            "rows": {str(r): rows[r] for r in replicas},
            "points": points,
            "exponent": exponent,
            "superlinear": sorted(
                n for n, e in exponent.items() if e > SUPERLINEAR_EXPONENT
            ),
        }
        print(json.dumps(report))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
