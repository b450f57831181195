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
    """The staleness invariant (VERDICT r4 #8): after applying the priority
    list to a 50-query window, no registered query's latest VERIFIED
    evidence may be more than 2 rounds old — every never-checked or
    >2-rounds-stale query must land inside the window the driver will
    actually run this round."""
    files = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    if not files:
        return
    this_round = 1 + max(
        int(os.path.basename(p)[len("CORRECTNESS_r"):-len(".json")]) for p in files
    )
    seen = _last_checked()
    window = set(list(all_queries())[:50])
    stale = [
        n for n in all_queries() if seen.get(n, -(10**9)) < this_round - 2
    ]
    buried = [n for n in stale if n not in window]
    assert not buried, (
        f"{len(buried)} stale/never-checked queries outside the 50-window: "
        f"{buried[:5]}"
    )


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
