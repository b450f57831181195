"""Correctness-window rotation: the registry orders queries so the driver's
bounded check window always lands on the least-recently-verified rows."""

from __future__ import annotations

import glob
import json
import os

from postgres_cdc_reconciliation_spark.plans.registry import (
    _CHECK_PRIORITY,
    _last_checked,
    all_queries,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_manual_window_is_exactly_driver_sized():
    """The hand-curated tier must never exceed the driver's 50-query
    correctness window — entries beyond it silently lose their slot."""
    assert len(_CHECK_PRIORITY) <= 50
    qs = all_queries()
    missing = [n for n in _CHECK_PRIORITY if n not in qs]
    assert not missing, f"priority names not registered: {missing}"


def test_tail_orders_by_staleness():
    """Beyond the manual tier, queries sort by newest recorded CORRECTNESS
    round ascending (never-checked first) so rotation continues without
    curation."""
    if not glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        return  # fresh clone without driver artifacts: nothing to order by
    seen = _last_checked()
    names = list(all_queries())
    tail = names[len(_CHECK_PRIORITY):]
    rounds = [seen.get(n, -1) for n in tail]
    assert rounds == sorted(rounds), "tail not ordered stalest-first"


def test_window_covers_all_stale_evidence():
    """The staleness invariant, restated feasibly (VERDICT r9 #1): with N
    registered queries and a 50-query/round driver sample, full rotation
    takes ceil(N/50) rounds, so a fixed 2-round bound became impossible the
    moment N crossed 150. The actionable invariant has two parts:

    1. the 50-query window the driver will run this round is exactly the
       50 STALEST queries (no stale query buried behind a fresher one) —
       manual pins excepted, since they exist to force re-verification of
       changed implementations regardless of row age;
    2. no query's evidence is older than the feasible bound: the smallest
       b >= ceil(N/50) such that the number of driver rounds in
       [this_round - b, this_round) that produced no CORRECTNESS file is
       <= b - ceil(N/50). (A skipped driver round — round 8 left no file —
       delays rotation by exactly one round, and the effect decays once
       the window catches back up; the fixed point accounts for both.)
    """
    files = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    if not files:
        return
    rounds_present = {
        int(os.path.basename(p)[len("CORRECTNESS_r"):-len(".json")]) for p in files
    }
    this_round = 1 + max(rounds_present)
    seen = _last_checked()
    names = list(all_queries())
    window, outside = names[:50], names[50:]

    # (1) window is the stalest 50: every non-pinned window entry is at
    # least as stale as every entry outside the window.
    NEVER = -(10**9)
    non_pinned = [n for n in window if n not in _CHECK_PRIORITY]
    if non_pinned and outside:
        assert max(seen.get(n, NEVER) for n in non_pinned) <= min(
            seen.get(n, NEVER) for n in outside
        ), "a staler query is buried outside the 50-window"

    # (2) fixed-point feasible staleness bound.
    import math

    base = math.ceil(len(names) / 50)
    b = base
    while True:
        missed = sum(
            1 for r in range(this_round - b, this_round) if r >= 1 and r not in rounds_present
        )
        if missed <= b - base:
            break
        b += 1
    over = [n for n in names if n in seen and seen[n] < this_round - b]
    assert not over, (
        f"{len(over)} queries have evidence older than the feasible "
        f"{b}-round bound (N={len(names)}): {over[:5]}"
    )
    # never-checked queries must sit inside the window so they get their
    # first row this round
    never = [n for n in names if n not in seen]
    buried_never = [n for n in never if n not in window]
    assert not buried_never, f"never-checked queries outside window: {buried_never[:5]}"


def test_failed_rows_are_not_verification_evidence():
    """A CORRECTNESS row with err set or rows_match false must not stamp the
    query as checked (ADVICE r4): it has to sort as never-checked so it
    re-enters the window first. Recomputes the green-only map independently
    and requires _last_checked to equal it exactly."""
    expected: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("err") is None and row.get("rows_match") is True:
                expected[name] = max(expected.get(name, 0), rnd)
    assert _last_checked() == expected


def test_every_registered_query_has_appeared_or_is_fronted():
    """A query absent from every CORRECTNESS file must sit in the manual
    tier or ahead of all already-verified rows — never buried behind
    verified ones where the window can't reach it."""
    seen = _last_checked()
    names = list(all_queries())
    never = [n for n in names if n not in seen]
    for n in never:
        idx = names.index(n)
        behind = [m for m in names[:idx] if m in seen and m not in _CHECK_PRIORITY]
        assert not behind, f"never-checked {n} buried behind verified {behind[:3]}"


def test_r5_staged_trio_is_registered():
    """The r5 staging area (plans/staged_r6.py, since deleted) promoted
    its three pre-verified queries into the registry in round 6 — they
    must stay registered and fronted so the driver finally witnesses
    them (VERDICT r5 #1/#2)."""
    qs = all_queries()
    trio = ["q_interval_overlap", "q_profile_diff", "q_series_similarity"]
    missing = [n for n in trio if n not in qs]
    assert not missing, f"promoted queries unregistered: {missing}"
    names = list(qs)
    seen = _last_checked()
    for n in trio:
        # fronted only until the driver witnesses them: once a green row
        # exists the pin retires (see test_pins_self_retire) and the query
        # rotates like any other
        if n not in seen:
            assert names.index(n) < 50, f"{n} outside the driver window"


def test_pins_self_retire():
    """A _CHECK_PRIORITY pin whose query already has a green driver row
    from the pin's target round (or later) must NOT occupy a manual front
    slot — it rotates by staleness like everyone else, freeing its slot
    for genuinely stale rows. This is what prevents the recurring
    round-start failure where last round's priority list buries this
    round's stale tier (VERDICT r5 #1)."""
    from postgres_cdc_reconciliation_spark.plans.registry import (
        _CHECK_PRIORITY_ROUND,
    )

    seen = _last_checked()
    names = list(all_queries())
    n_active = sum(
        1
        for n in _CHECK_PRIORITY
        if seen.get(n, -1) < _CHECK_PRIORITY_ROUND
    )
    front = names[:n_active]
    for n in _CHECK_PRIORITY:
        if seen.get(n, -1) >= _CHECK_PRIORITY_ROUND:
            assert n not in front, f"pin {n} should have retired"
        else:
            assert n in front, f"active pin {n} lost its front slot"


def test_queries_md_matches_registry():
    """QUERIES.md is generated from the registry (scripts/gen_query_map.py)
    but committed — VERDICT r9 #3: the map silently said 150 while the
    registry held 151. Pin the committed headline count and per-query
    presence to the live registry so the map can't drift again."""
    import re

    path = os.path.join(REPO, "QUERIES.md")
    if not os.path.exists(path):
        return  # installed package without repo docs
    with open(path) as f:
        text = f.read()
    m = re.search(r"\*\*(\d+) registered queries\*\*", text)
    assert m, "QUERIES.md headline count line missing"
    qs = all_queries()
    assert int(m.group(1)) == len(qs), (
        f"QUERIES.md says {m.group(1)} queries, registry has {len(qs)} — "
        "re-run scripts/gen_query_map.py"
    )
    missing = [n for n in qs if f"`{n}`" not in text]
    assert not missing, f"queries absent from QUERIES.md: {missing[:5]}"
