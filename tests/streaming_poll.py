"""Shared instrumented sink-poll for streaming tests (VERDICT r8 #2).

The streaming-ingest flake class (rounds 6 + 8: a sink poll expires
under a long sequential certify, then passes 3/3 targeted) had two
candidate holes neither the old per-file pollers could distinguish:

1. a file-listing visibility race — ``processAllAvailable()`` returns
   after processing what the source had DISCOVERED, and a just-written
   file can miss that listing; with the default continuous trigger the
   next micro-batch picks it up, but any scheduling stall under a
   loaded 500-test JVM pushes that past a wall-clock deadline;
2. a silently dead query — ``q.exception()`` never surfaces through a
   bare parquet-read poll, so a killed stream reads as "data never
   arrived".

``await_sink`` closes both: it RE-TRIGGERS ``processAllAvailable()``
inside the loop (forcing a fresh source listing each iteration and
re-raising any terminal stream error immediately), and on timeout it
RAISES with the query's status + last progress entries serialized —
so the next certify-context occurrence produces a root-cause record
instead of a bare list-mismatch assert (the instrument-don't-rerun
directive)."""

from __future__ import annotations

import json
import time


def await_sink(spark, q, path, col, want, timeout=120.0):
    deadline = time.time() + timeout
    got = None
    while time.time() < deadline:
        if q is not None:
            q.processAllAvailable()  # re-list; raises if the stream died
        try:
            got = sorted(r[col] for r in spark.read.parquet(path).collect())
        except Exception:
            got = None  # sink mid-swap or not yet created
        if got == want:
            return got
        time.sleep(0.5)
    diag = {
        "want": want,
        "got": got,
        "status": None if q is None else q.status,
        "recentProgress": [] if q is None else list(q.recentProgress)[-5:],
    }
    raise AssertionError(
        "streaming sink never reached the expected state — DIAGNOSTIC "
        "(VERDICT r8 #2, record this in SCALE.md before re-running): "
        + json.dumps(diag, default=str)[:4000]
    )
