"""Verification-window rotation invariants of the driver-facing shim
(__spark_entry__._order_names): a fixed-size check window must re-check
every registered query within a bounded number of rounds (no
starvation), and a red row must lead the very next window.
"""

from __future__ import annotations

import importlib
import math
import sys

sys.path.insert(0, "/root/repo")
entry_mod = importlib.import_module("__spark_entry__")

WINDOW = 50  # the driver's observed check-window size


def _simulate(names, rounds, window=WINDOW, recheck=None, failed=None):
    """Run the rotation for `rounds` rounds; every checked query passes.
    Returns {name: [rounds in which it was checked]}."""
    last: dict[str, int] = {}
    fail = set(failed or ())
    checked: dict[str, list[int]] = {n: [] for n in names}
    for rnd in range(rounds):
        ordered = entry_mod._order_names(names, last, fail, recheck or {})
        for n in ordered[:window]:
            checked[n].append(rnd)
            last[n] = rnd
            fail.discard(n)
    return checked


def test_max_staleness_bound():
    """With pure rotation (no pins, no failures) every query is checked
    at least once every ⌈N/W⌉ rounds, from any starting state."""
    n_queries = len(entry_mod.queries())
    names = [f"q{i:03d}" for i in range(n_queries)]
    bound = math.ceil(n_queries / WINDOW)
    rounds = 4 * bound
    checked = _simulate(names, rounds)
    for n, rs in checked.items():
        assert rs, f"{n} never checked"
        assert rs[0] < bound, f"{n} first checked at round {rs[0]} >= {bound}"
        gaps = [b - a for a, b in zip(rs, rs[1:])]
        assert max(gaps, default=0) <= bound, f"{n} starved: gaps {gaps}"


def test_failures_always_first():
    """A query whose last check failed leads the next window regardless
    of how recently it was checked."""
    names = [f"q{i:03d}" for i in range(100)]
    last = {n: 5 for n in names}
    last["q099"] = 9  # most recently checked of all
    ordered = entry_mod._order_names(names, last, {"q099"}, {})
    assert ordered[0] == "q099"


def test_recheck_pins_follow_failures():
    """Changed-module pins come right after failures (and the overdue
    tier, empty here), in pin order."""
    names = [f"q{i:03d}" for i in range(20)]
    ordered = entry_mod._order_names(
        names, {n: 1 for n in names}, {"q007"}, {"q010": 0, "q003": 1}
    )
    assert ordered[:3] == ["q007", "q010", "q003"]


def test_overdue_outranks_recheck_pins():
    """r10 verdict item 1: a stale cohort must land in the window even
    when a long pin list is present — the overdue tier ranks ABOVE
    changed-module rechecks, so pins can never push an overdue query
    past the window edge."""
    overdue = [f"old{i:03d}" for i in range(45)]
    fresh = [f"fresh{i:03d}" for i in range(60)]
    last = {n: 2 for n in overdue}
    last.update({n: 9 for n in fresh})
    pins = {f"fresh{i:03d}": i for i in range(10)}
    ordered = entry_mod._order_names(overdue + fresh, last, set(), pins)
    # the full overdue cohort precedes every pin
    assert set(ordered[: len(overdue)]) == set(overdue)
    assert ordered[len(overdue) : len(overdue) + 10] == sorted(
        pins, key=pins.get
    )


def test_overdue_outranks_never_checked():
    """A query stale by more than _MAX_STALENESS rounds outranks a burst
    of never-checked newcomers — query-adding rounds must not re-starve
    the stale tail (r7 verdict item #1)."""
    old = [f"old{i:03d}" for i in range(10)]
    new = [f"new{i:03d}" for i in range(60)]
    # old queries last checked at round 2; one fresh check at round 7
    # anchors "now" = 8, making the old cohort 6 rounds stale.
    last = {n: 2 for n in old}
    last["old000"] = 7
    ordered = entry_mod._order_names(old + new, last, set(), {})
    head = ordered[: len(old) - 1]
    assert set(head) == set(old) - {"old000"}, head
    # never-checked newcomers follow the overdue tier
    assert ordered[len(old) - 1 : len(old) - 1 + len(new)] == new


def test_overdue_tier_preserves_staleness_bound():
    """The overdue tier must not break the ⌈N/W⌉ rotation bound when
    newcomers arrive mid-rotation."""
    names = [f"q{i:03d}" for i in range(120)]
    last: dict[str, int] = {}
    window = 50
    for rnd in range(3):
        for n in entry_mod._order_names(names, last, set(), {})[:window]:
            last[n] = rnd
    # 60 new queries register at round 3
    names += [f"late{i:03d}" for i in range(60)]
    for rnd in range(3, 12):
        for n in entry_mod._order_names(names, last, set(), {})[:window]:
            last[n] = rnd
    now = 12
    worst = max(now - last.get(n, -1) for n in names)
    bound = math.ceil(len(names) / window) + entry_mod._MAX_STALENESS
    assert worst <= bound, f"worst staleness {worst} > {bound}"


def test_r9_window_drains_r5_cohort():
    """Against the repo's real CORRECTNESS history (r8 verdict item #6,
    re-armed per round): the stalest cohort crosses the overdue line
    together, and every one of them must land in the 50-slot window —
    pins rank BELOW the overdue tier (r10 verdict item 1), so the only
    way the cohort can spill is by itself outgrowing the window."""
    last, failed = entry_mod._last_check("/root/repo")
    if not last or max(last.values()) < 8:
        return  # history not present (fresh checkout)
    names = list(entry_mod.queries())
    recheck = {n: i for i, n in enumerate(entry_mod._RECHECK_FIRST)}
    window = entry_mod._order_names(names, last, failed, recheck)[:WINDOW]
    oldest = min(last.values())
    cohort = {n for n in names if last.get(n) == oldest}
    spilled = cohort - set(window)
    assert len(cohort) <= WINDOW, (
        f"stalest cohort ({len(cohort)}) outgrew the window itself"
    )
    assert not spilled, f"stalest cohort spilled out of the window: {spilled}"
    # pins that aren't already stale must still fit AFTER the cohort
    assert len(cohort) + len(set(recheck) - cohort) <= WINDOW, (
        "pin list pushes past the window edge — draw pins from the "
        "stale cohort instead (see _RECHECK_FIRST policy note)"
    )


def test_registry_names_resolve():
    """Every _RECHECK_FIRST pin names a registered query (typos warn at
    runtime; this keeps them from lingering)."""
    qs = entry_mod.queries()
    missing = [n for n in entry_mod._RECHECK_FIRST if n not in qs]
    assert not missing, f"_RECHECK_FIRST names not registered: {missing}"
