"""The bench regression gate itself (pure python — no Spark)."""

from tools.bench_compare import compare


def _r(queries, total=None, **extra):
    return {"queries": queries, "value": total or sum(queries.values()), **extra}


def test_no_regression_within_band():
    old = _r({"q1": 1.0, "q2": 0.2})
    new = _r({"q1": 1.2, "q2": 0.26})  # 1.2x / 1.3x but tiny absolute
    regs, _ = compare(old, new, 1.30, 0.15)
    assert regs == []


def test_real_regression_fails():
    old = _r({"q1": 1.0, "q2": 0.2})
    new = _r({"q1": 1.6, "q2": 0.2})
    regs, _ = compare(old, new, 1.30, 0.15)
    assert len(regs) >= 1 and "q1" in regs[0]


def test_subsecond_jitter_not_flagged():
    # "2x" on a 0.1s query is scheduler noise, not a plan change
    regs, _ = compare(_r({"q": 0.1}), _r({"q": 0.2}), 1.30, 0.15)
    assert regs == []


def test_new_and_retired_queries_are_notes_not_failures():
    regs, notes = compare(_r({"a": 1.0}), _r({"b": 1.0}), 1.30, 0.15)
    assert regs == [] or all("TOTAL" not in r and "a" not in r.split(":")[0] for r in regs)
    assert any("new query b" in n for n in notes)
    assert any("retired query a" in n for n in notes)


def test_superlinear_flag_fails():
    old = _r({"q": 1.0})
    new = _r({"q": 1.0}, superlinear=["q"], scaling_exponent={"q": 1.4})
    regs, _ = compare(old, new, 1.30, 0.15)
    assert any("superlinear" in r for r in regs)


def test_improvements_are_notes():
    _, notes = compare(_r({"q": 2.0}), _r({"q": 1.0}), 1.30, 0.15)
    assert any("improved" in n for n in notes)


def test_anchored_queries_surface_improvements():
    # ADVICE r10 low: the anchored branch used to `continue`
    # unconditionally, so anchored speedups never appeared.
    from tools.bench_compare import RATIO_ANCHOR, RATIO_ANCHORED

    name = sorted(RATIO_ANCHORED)[0]
    old = _r({RATIO_ANCHOR: 1.0, name: 4.0})
    new = _r({RATIO_ANCHOR: 1.0, name: 2.0})
    regs, notes = compare(old, new, 1.30, 0.15)
    assert regs == []
    assert any(name in n and "improved" in n for n in notes)
    # and the drift-note / regression paths are untouched
    regs, notes = compare(
        _r({RATIO_ANCHOR: 1.0, name: 2.0}),
        _r({RATIO_ANCHOR: 2.0, name: 4.0}),  # raw 2x, ratio stable
        1.30,
        0.15,
    )
    # (the anchor itself moved 2x raw and is legitimately flagged;
    # only the ANCHORED query's adjudication is under test here)
    assert not any(r.startswith(name) for r in regs)
    assert any("anchor-ratio is stable" in n for n in notes)
    regs, _ = compare(
        _r({RATIO_ANCHOR: 1.0, name: 2.0}),
        _r({RATIO_ANCHOR: 1.0, name: 4.0}),  # ratio itself 2x
        1.30,
        0.15,
    )
    assert any(name in r and "anchor-ratio" in r for r in regs)


def test_calib_normalization_absorbs_machine_drift():
    from tools.bench_compare import compare

    old = {"value": 1.0, "calib": 0.1, "queries": {"q": 1.0}}
    # machine uniformly 2x slower (calib doubled): raw 2x is NOT a regression
    new = {"value": 2.0, "calib": 0.2, "queries": {"q": 2.0}}
    regs, notes = compare(old, new, 1.30, 0.15)
    assert regs == []
    assert any("machine-normalized" in n for n in notes)
    # a REAL 2x regression on the slow machine (raw 4x) still flags
    new_bad = {"value": 4.0, "calib": 0.2, "queries": {"q": 4.0}}
    regs, _ = compare(old, new_bad, 1.30, 0.15)
    assert len(regs) == 2  # the query and the total


def test_calib_missing_on_either_side_compares_raw():
    from tools.bench_compare import compare

    old = {"value": 1.0, "queries": {"q": 1.0}}
    new = {"value": 2.0, "calib": 0.2, "queries": {"q": 2.0}}
    regs, _ = compare(old, new, 1.30, 0.15)
    assert len(regs) == 2  # no baseline calib -> raw comparison
