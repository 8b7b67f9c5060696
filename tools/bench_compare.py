"""Round-over-round bench regression gate.

Compares two ``bench.py`` reports per query and FAILS (exit 1) on any
real regression, so a de-optimized plan fails a check instead of
waiting for a judge's eyeball:

    python tools/bench_compare.py BENCH_r03.json BENCH_r04.json
    python bench.py 2>/dev/null | python tools/bench_compare.py BENCH_r03.json -

A query regresses when BOTH hold:

- ratio:    new > --threshold × old   (default 1.30 — outside the
            measured ±15% local-mode variance band with margin)
- absolute: new − old > --abs-floor   (default 0.15 s — sub-second
            queries sit on a scheduling floor where ratios are noise;
            a "2×" on 0.2 s is 0.2 s of jitter, not a plan change)

Queries present in only one report are listed informationally (new or
retired bench entries), never failed on. The total is compared with
the same ratio; improvements are reported so wins are visible too.

The stdout bench line carries the extended set as a {total, n}
SUMMARY (driver tail-capture budget); per-query extended detail
lives in BENCH_FULL.json. This tool resolves a summary-form
"extended" back to the sidecar when it belongs to the same run
(matching headline total), and otherwise compares headline queries
only, with a note — baseline against the committed BENCH_FULL.json
when you want the extended set gated cross-round.
"""

from __future__ import annotations

import argparse
import json
import sys

# Text-family queries whose absolute seconds have twice moved with
# machine state / testdata regeneration while every plan pin stayed
# green (r8→r9 raw 1.5x, re-measured clean at the old ratio in r10).
# These are adjudicated by their WITHIN-RUN ratio to a JVM-only anchor
# instead: the ratio cancels machine drift exactly (same run, same
# JVM, same data), so a moved ratio means the QUERY's plan changed,
# and a moved raw-seconds with a stable ratio means the MACHINE moved
# — downgrade to a note, not a regression.
RATIO_ANCHOR = "q01_pricing_summary"
RATIO_ANCHORED = {
    "q58_lm_perplexity",
    "q59_simhash_pairs",
    "q62_semantic_dedup",
}


def load(path: str) -> dict:
    if path == "-":
        # tolerate Spark log lines around the single JSON line
        for line in sys.stdin:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        raise SystemExit("bench_compare: no JSON line on stdin")
    with open(path) as f:
        d = json.load(f)
    # the driver's BENCH_r{N}.json wraps the bench line under "parsed"
    return d.get("parsed") or d


def _ext(report: dict, notes: list[str], side: str) -> dict:
    """Per-query extended timings: pass through the full form, and
    resolve the {total, n} stdout summary via BENCH_FULL.json when it
    is the same run (identical headline total) — never treat the
    summary's own keys as query timings."""
    import os

    e = report.get("extended", {})
    if not e or set(e) - {"total", "n"}:
        return e
    full_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_FULL.json",
    )
    if os.path.exists(full_path):
        with open(full_path) as f:
            full = json.load(f)
        if full.get("value") == report.get("value"):
            return full.get("extended", {})
    notes.append(
        f"{side} report has summary-form extended (per-query detail in its "
        "round's BENCH_FULL.json) — extended set not gated this compare"
    )
    return {}


def compare(
    old: dict, new: dict, threshold: float, abs_floor: float
) -> tuple[list[str], list[str]]:
    """(regressions, notes) — regressions non-empty means FAIL."""
    regressions, notes = [], []
    # machine-speed normalization: when BOTH reports carry the fixed
    # calibration probe (bench.py "calib"), compare in calib units —
    # absolute times moved ~1.25x uniformly across a session restart
    # with every plan pin green; raw-seconds gates would flag machine
    # drift as plan regressions
    oc, nc = old.get("calib"), new.get("calib")
    norm = 1.0
    unit = "s"
    if oc and nc:
        norm = float(oc) / float(nc)
        # normalized values get a distinct unit so a triager never
        # greps BENCH json for a number that exists in neither report
        unit = "s*"
        notes.append(
            f"calib {float(oc):.3f}s -> {float(nc):.3f}s: comparing in "
            f"machine-normalized units (s* = new_time x {norm:.2f})"
        )
    # extended (non-headline) queries are compared the same way but
    # never contribute to the total
    oe, ne = _ext(old, notes, "old"), _ext(new, notes, "new")
    # only the INTERSECTION-capable union: if either side lost its
    # extended detail, the other side's entries would all read as
    # new/retired noise — drop extended from both in that case
    if not oe or not ne:
        oe, ne = {}, {}
    oq = {**old.get("queries", {}), **oe}
    nq = {**new.get("queries", {}), **ne}
    # within-run anchor ratios for the ratio-anchored family (raw
    # seconds on purpose: the ratio is same-run so any machine factor
    # cancels exactly — better than calib, which under-captures drift)
    oa = float(oq.get(RATIO_ANCHOR) or 0)
    na = float(nq.get(RATIO_ANCHOR) or 0)
    for name in sorted(set(oq) | set(nq)):
        if name not in oq:
            notes.append(f"new query {name}: {nq[name]:.3f}s (no baseline)")
            continue
        if name not in nq:
            notes.append(f"retired query {name} (was {oq[name]:.3f}s)")
            continue
        o, n = float(oq[name]), float(nq[name]) * norm
        anchored = name in RATIO_ANCHORED and oa > 0 and na > 0
        if anchored:
            ro, rn = float(oq[name]) / oa, float(nq[name]) / na
            if rn > threshold * ro:
                regressions.append(
                    f"{name}: anchor-ratio {ro:.1f}x -> {rn:.1f}x vs "
                    f"{RATIO_ANCHOR} ({rn / ro:.2f}x — plan-level, not "
                    "machine drift)"
                )
                continue
            if n > threshold * o and n - o > abs_floor:
                notes.append(
                    f"{name} raw moved {o:.3f}s -> {n:.3f}{unit} but "
                    f"anchor-ratio is stable ({ro:.1f}x -> {rn:.1f}x): "
                    "uniform machine/data drift, not a regression"
                )
                continue
            # fall through so anchored queries surface improvements too
            # (ADVICE r10 low: the unconditional `continue` hid every
            # speedup); the raw-regression branch below is unreachable
            # here — its exact condition just `continue`d above.
        if n > threshold * o and n - o > abs_floor:
            regressions.append(
                f"{name}: {o:.3f}s -> {n:.3f}{unit} ({n / o:.2f}x, +{n - o:.3f}{unit})"
            )
        elif o > threshold * n and o - n > abs_floor:
            notes.append(f"{name} improved: {o:.3f}s -> {n:.3f}{unit} ({n / o:.2f}x)")
    ot, nt = float(old.get("value", 0)), float(new.get("value", 0)) * norm
    if ot and nt and nt > threshold * ot and nt - ot > abs_floor:
        regressions.append(f"TOTAL: {ot:.3f}s -> {nt:.3f}{unit} ({nt / ot:.2f}x)")
    elif ot and nt:
        notes.append(f"total: {ot:.3f}s -> {nt:.3f}{unit} ({nt / ot:.2f}x)")
    for name in new.get("superlinear", []):
        regressions.append(
            f"{name}: superlinear scaling exponent "
            f"{new.get('scaling_exponent', {}).get(name)}"
        )
    return regressions, notes


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old", help="baseline bench JSON (e.g. BENCH_r03.json)")
    ap.add_argument("new", help="candidate bench JSON, or - for stdin")
    ap.add_argument("--threshold", type=float, default=1.30)
    ap.add_argument("--abs-floor", type=float, default=0.15)
    args = ap.parse_args(argv)
    regressions, notes = compare(
        load(args.old), load(args.new), args.threshold, args.abs_floor
    )
    for n in notes:
        print(f"note  {n}")
    for r in regressions:
        print(f"REGRESSION  {r}")
    print(f"{len(regressions)} regressions")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
