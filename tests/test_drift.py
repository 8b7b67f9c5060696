"""Corpus drift monitor (q171): exact-integer total-variation
distance over the shared hashed-gram histogram, batch
(``lm.corpus_drift``) and streaming (``stream_drift_monitor``).
Cross-engine arithmetic is q171's oracle hash; these pins cover the
statistic against an independent brute-force reference, the
degenerate edges, the int64 guard, the JVM-only plan, and the
streaming twin's parity + replay idempotence."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.dedup import unpersist_all
from dataflow_python_etl_spark.operators.lm import (
    build_drift_reference,
    corpus_drift,
    drift_report,
    gram_histogram,
)

DDL = "doc_id long, text string"


def _py_hist(texts, buckets, prefix="drift-v1:"):
    """Independent reference: whitespace unigrams + adjacent bigrams,
    md5-hashed (first 15 hex digits base-16) into buckets."""
    hist: dict[int, int] = {}
    for t in texts:
        toks = [x for x in re.split(r"\s+", t) if x]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        for g in grams:
            b = (
                int(hashlib.md5((prefix + g).encode()).hexdigest()[:15], 16)
                % buckets
            )
            hist[b] = hist.get(b, 0) + 1
    return hist


def _py_drift(ref_texts, cur_texts, buckets):
    r, c = _py_hist(ref_texts, buckets), _py_hist(cur_texts, buckets)
    R, C = sum(r.values()), sum(c.values())
    rows = {
        b: (r.get(b, 0), c.get(b, 0), abs(r.get(b, 0) * C - c.get(b, 0) * R))
        for b in set(r) | set(c)
    }
    tvd = (
        1_000_000 * sum(v[2] for v in rows.values()) // (2 * R * C)
        if R and C
        else None
    )
    return rows, R, C, tvd


REF = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "how vexingly quick daft zebras jump",
]
CUR = [
    "the quick brown fox naps under the warm sun",
    "pack my crate with nine frozen pizza slices",
    "sphinx of black quartz judge my vow",
]


def test_corpus_drift_matches_bruteforce(spark):
    ref = spark.createDataFrame(list(enumerate(REF)), DDL)
    cur = spark.createDataFrame(list(enumerate(CUR, 100)), DDL)
    got = corpus_drift(ref, cur, buckets=64, top_k=1000).collect()
    unpersist_all()
    rows, R, C, tvd = _py_drift(REF, CUR, 64)
    assert {r["bucket"]: (r["ref_count"], r["cur_count"], r["contrib"]) for r in got} == rows
    assert all(r["n_ref"] == R and r["n_cur"] == C for r in got)
    assert got[0]["tvd_ppm"] == tvd
    # ranking: exact integer contrib desc, bucket tie-break
    ranked = sorted(got, key=lambda r: r["rank"])
    assert [r["bucket"] for r in ranked] == [
        b for b, _ in sorted(rows.items(), key=lambda kv: (-kv[1][2], kv[0]))
    ]


def test_identical_snapshots_zero_drift(spark):
    df = spark.createDataFrame(list(enumerate(REF)), DDL)
    got = corpus_drift(df, df, buckets=64).collect()
    unpersist_all()
    assert got and all(r["contrib"] == 0 for r in got)
    assert got[0]["tvd_ppm"] == 0


def test_disjoint_vocab_is_full_drift(spark):
    ref = spark.createDataFrame([(1, "aaa bbb ccc")], DDL)
    cur = spark.createDataFrame([(2, "xxx yyy zzz")], DDL)
    got = corpus_drift(ref, cur, buckets=4096).collect()
    unpersist_all()
    # no shared buckets at this width (verified by the reference impl)
    assert not set(_py_hist(["aaa bbb ccc"], 4096)) & set(
        _py_hist(["xxx yyy zzz"], 4096)
    )
    assert got[0]["tvd_ppm"] == 1_000_000


def test_empty_snapshot_reports_null_tvd(spark):
    ref = spark.createDataFrame(list(enumerate(REF)), DDL)
    cur = spark.createDataFrame([(1, "")], DDL)  # zero grams
    got = corpus_drift(ref, cur, buckets=64).collect()
    unpersist_all()
    assert got and got[0]["n_cur"] == 0
    assert all(r["tvd_ppm"] is None and r["contrib"] == 0 for r in got)


def test_overflow_guard_raises(spark):
    # the guard fires while the guarded totals frame is MATERIALIZED
    # FOR BROADCAST, where Spark surfaces the task failure as a raw
    # Py4JJavaError instead of the usual captured SparkRuntimeException
    # (same USER_RAISED_EXCEPTION underneath) — match the message, not
    # one wrapper type
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    ref = spark.createDataFrame(list(enumerate(REF)), DDL)
    cur = spark.createDataFrame(list(enumerate(CUR, 100)), DDL)
    with pytest.raises(
        (SparkRuntimeException, Py4JJavaError), match="64-bit bound"
    ):
        corpus_drift(ref, cur, buckets=64, _bound=1_000_000).collect()
    unpersist_all()


def test_plan_is_jvm_only(spark):
    ref = spark.createDataFrame(list(enumerate(REF)), DDL)
    cur = spark.createDataFrame(list(enumerate(CUR, 100)), DDL)
    plan = (
        corpus_drift(ref, cur, buckets=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    unpersist_all()
    assert "EvalPython" not in plan


def test_build_drift_reference_refuses_empty(spark, tmp_path):
    empty = spark.createDataFrame([(1, ""), (2, "   ")], DDL)
    with pytest.raises(ValueError, match="empty histogram"):
        build_drift_reference(empty, str(tmp_path / "ref"))


def test_stream_drift_monitor_parity_and_replay(spark, tmp_path):
    """Two micro-batches through the streaming monitor: each batch's
    recorded row equals the batch-side drift_report scalar against
    the same frozen reference (batch==stream parity), and re-applying
    a batch (at-least-once replay) rewrites its own partition — same
    single row, no duplicates."""
    from dataflow_python_etl_spark.streaming.pipeline import (
        apply_drift_monitor_batch,
        stream_drift_monitor,
    )

    ref_path = str(tmp_path / "ref_hist")
    out = str(tmp_path / "drift_rows")
    src = str(tmp_path / "in")
    ref_docs = spark.createDataFrame(list(enumerate(REF)), DDL)
    build_drift_reference(ref_docs, ref_path, buckets=64)

    b0 = spark.createDataFrame(list(enumerate(REF, 100)), DDL)  # ~ref
    b1 = spark.createDataFrame([(200, "xxx yyy zzz qqq www")], DDL)
    b0.coalesce(1).write.parquet(src)
    q = stream_drift_monitor(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        ref_path,
        out,
        str(tmp_path / "ckpt"),
        buckets=64,
    )
    q.processAllAvailable()
    b1.coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    rows = {r["batch"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {0, 1}
    assert rows[0]["tvd_ppm"] == 0  # batch 0 IS the reference corpus
    # batch 1's vocabulary is disjoint, but at 64 buckets its grams
    # COLLIDE with reference buckets (9 grams vs ~half the buckets
    # occupied) — the exact expectation comes from the independent
    # reference implementation, not a naive 1.0
    _, _, _, want_tvd = _py_drift(REF, ["xxx yyy zzz qqq www"], 64)
    assert rows[1]["tvd_ppm"] == want_tvd and want_tvd > 700_000

    # batch-side parity: the same comparison through drift_report
    ref_hist = spark.read.parquet(ref_path)
    for bid, batch in [(0, b0), (1, b1)]:
        want = drift_report(
            ref_hist,
            gram_histogram(batch, buckets=64, count_col="cur_count"),
            top_k=1,
        ).collect()[0]
        unpersist_all()
        got = rows[bid]
        assert (got["n_ref"], got["n_cur"], got["tvd_ppm"]) == (
            want["n_ref"], want["n_cur"], want["tvd_ppm"],
        )
        assert (got["top_bucket"], got["top_contrib"]) == (
            want["bucket"], want["contrib"],
        )

    # at-least-once replay: re-apply batch 1 directly — its partition
    # is rewritten, not appended
    apply_drift_monitor_batch(b1, 1, ref_path, out, buckets=64)
    again = {r["batch"]: r for r in spark.read.parquet(out).collect()}
    assert set(again) == {0, 1}
    assert again[1].asDict() == rows[1].asDict()


def test_drift_monitor_refuses_missing_reference(spark, tmp_path):
    from dataflow_python_etl_spark.streaming.pipeline import (
        apply_drift_monitor_batch,
    )

    df = spark.createDataFrame(list(enumerate(REF)), DDL)
    with pytest.raises(RuntimeError, match="reference histogram missing"):
        apply_drift_monitor_batch(
            df, 0, str(tmp_path / "nope"), str(tmp_path / "out")
        )


# ---------------------------------------------------------------------------
# corpus_drift_by_group (q172)
# ---------------------------------------------------------------------------

GDDL = "doc_id long, source string, text string"


def test_grouped_drift_matches_bruteforce_per_group(spark):
    from dataflow_python_etl_spark.operators.lm import corpus_drift_by_group

    ref = spark.createDataFrame(
        [(1, "a", REF[0]), (2, "a", REF[1]), (3, "b", REF[2])], GDDL
    )
    cur = spark.createDataFrame(
        [(11, "a", CUR[0]), (12, "b", CUR[2].replace("my", "quantum")),
         (13, "c", "only in current")],
        GDDL,
    )
    got = {r["source"]: r for r in corpus_drift_by_group(ref, cur, buckets=64).collect()}
    unpersist_all()
    assert set(got) == {"a", "b", "c"}
    for grp, rt, ct in [
        ("a", REF[:2], [CUR[0]]),
        ("b", [REF[2]], [CUR[2].replace("my", "quantum")]),
    ]:
        rows, R, C, tvd = _py_drift(rt, ct, 64)
        r = got[grp]
        assert (r["n_ref"], r["n_cur"], r["tvd_ppm"]) == (R, C, tvd), grp
        top = sorted(rows.items(), key=lambda kv: (-kv[1][2], kv[0]))[0]
        assert (r["top_bucket"], r["top_contrib"]) == (top[0], top[1][2]), grp
    # a group with no reference side reports counts + NULL tvd
    assert got["c"]["n_ref"] == 0 and got["c"]["tvd_ppm"] is None


def test_grouped_drift_guard_is_per_group(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from dataflow_python_etl_spark.operators.lm import corpus_drift_by_group

    ref = spark.createDataFrame([(1, "a", REF[0])], GDDL)
    cur = spark.createDataFrame([(2, "a", CUR[0])], GDDL)
    with pytest.raises(SparkRuntimeException, match="64-bit bound"):
        corpus_drift_by_group(ref, cur, buckets=64, _bound=10).collect()
    unpersist_all()


def test_grouped_drift_windows_are_partitioned(spark):
    """No global ordering wall: every Window in the grouped plan is
    partitioned by the group column (the q165 lesson — a global
    orderBy would funnel the summary through one task AND warn)."""
    from dataflow_python_etl_spark.operators.lm import corpus_drift_by_group

    ref = spark.createDataFrame(
        [(i, f"s{i % 3}", REF[i % len(REF)]) for i in range(9)], GDDL
    )
    cur = spark.createDataFrame(
        [(100 + i, f"s{i % 3}", CUR[i % len(CUR)]) for i in range(9)], GDDL
    )
    plan = (
        corpus_drift_by_group(ref, cur, buckets=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    unpersist_all()
    assert "EvalPython" not in plan
    import re as _re

    specs = _re.findall(r"windowspecdefinition\((\w+)", plan)
    assert specs, "expected a window in the grouped drift plan"
    # every window spec's FIRST argument is the partition key — it
    # must be the group column, never a bare ordering (global window)
    assert all(s.startswith("source") for s in specs), specs
