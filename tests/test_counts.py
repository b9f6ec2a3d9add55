"""Registry-count drift guard as part of the default test run — README and
SURVEY must state the real registry totals (they drifted twice in round 5)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_doc_counts_match_registry():
    import check_counts

    errors = check_counts.check()
    assert not errors, "\n".join(errors)


def test_scaling_guard_fails_on_super_linear_regression():
    """The sf1 scaling gate must actually gate: a synthetic super-linear
    ratio (x12 on 10x data) and a vs-baseline regression both fail, a clean
    run passes, and a measurement silently dropped from the run fails."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "scaling_guard",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools", "scaling_guard.py"),
    )
    sg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sg)

    baseline = {
        "op_a": {"sf0.1": 1.0, "sf1": 2.0, "ratio": 2.0},
        "op_b": {"sf0.1": 1.0, "sf1": 4.0, "ratio": 4.0},
    }
    clean = {
        "op_a": {"sf0.1": 1.0, "sf1": 2.2, "ratio": 2.2},
        "op_b": {"sf0.1": 1.0, "sf1": 3.5, "ratio": 3.5},
    }
    fails, notes = sg.check(baseline, clean)
    assert fails == [] and notes == []

    super_linear = dict(clean, op_b={"sf0.1": 1.0, "sf1": 12.0, "ratio": 12.0})
    fails, _ = sg.check(baseline, super_linear)
    assert len(fails) == 1 and "super-linear" in fails[0]

    regressed = dict(clean, op_a={"sf0.1": 1.0, "sf1": 9.0, "ratio": 9.0})
    fails, _ = sg.check(baseline, regressed)
    assert len(fails) == 1 and "regressed" in fails[0]

    dropped = {"op_a": clean["op_a"]}
    fails, _ = sg.check(baseline, dropped)
    assert len(fails) == 1 and "missing" in fails[0]

    new_op = dict(clean, op_c={"sf0.1": 1.0, "sf1": 3.0, "ratio": 3.0})
    fails, notes = sg.check(baseline, new_op)
    assert fails == [] and len(notes) == 1 and "no pinned baseline" in notes[0]


def test_plan_window_mechanics():
    """--plan assembles the rotation window from the census: the whole
    oldest cohort leads, reps follow, pre-drain fills alphabetically, and
    overflow / unknown names / over-asked cohorts fail loudly (hand-listing
    50 names per round was the error-prone step; VERDICT r15 #1)."""
    import pytest

    import check_counts

    latest = check_counts.staleness_census()
    by_round = {}
    for name, rnd in latest.items():
        if rnd is not None:  # a renamed op maps to None; plan_window leads with those
            by_round.setdefault(rnd, []).append(name)
    oldest = min(by_round)
    lead = sorted(by_round[oldest])

    n_never = sum(1 for r in latest.values() if r is None)
    window, notes = check_counts.plan_window([], {})
    # never-checked (renamed) ops lead, then the entire oldest cohort in order
    assert window[n_never : n_never + len(lead)] == lead
    assert len(window) == len(set(window))  # no duplicates
    assert any(f"lead cohort r{oldest}" in n for n in notes)

    # a rep from the lead cohort is not double-counted
    rep = lead[0]
    window, _ = check_counts.plan_window([rep], {})
    assert window.count(rep) == 1 and len(window) == n_never + len(lead)

    with pytest.raises(ValueError, match="not in the registry"):
        check_counts.plan_window(["op_no_such_op"], {})

    # asking a cohort for more ops than it has fails loudly
    some_round = next(r for r in sorted(by_round) if r != oldest)
    with pytest.raises(ValueError, match="unwindowed ops remain"):
        check_counts.plan_window([], {some_round: 10_000})


def test_plan_window_tool_hardening(monkeypatch, capsys):
    """ADVICE r16 fixes, red-verified against the old behaviours:
    (a) print_plan must NOT silently drop a misspelled rep token (the old
    op_-prefix filter made 'opstream_pipeline' vanish from the generated
    window with no error) — every non-cohort token now reaches
    plan_window's registry validation and raises;
    (b) an empty census (fresh clone, no CORRECTNESS_r*.json) yields the
    never-checked-ops window with an explanatory note instead of the old
    'min() arg is an empty sequence' crash — and --predrain against no
    census is a loud error."""
    import pytest

    import check_counts

    with pytest.raises(ValueError, match="opstream_typo"):
        check_counts.print_plan(["--reps", "opstream_typo"])

    fresh = {n: None for n in ("op_x", "op_y", "op_z")}
    monkeypatch.setattr(check_counts, "staleness_census", lambda: fresh)
    window, notes = check_counts.plan_window([], {})
    assert window == ["op_x", "op_y", "op_z"]
    assert any("no census data" in n for n in notes)
    with pytest.raises(ValueError, match="no driver census data"):
        check_counts.plan_window([], {12: 3})
