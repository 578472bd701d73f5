"""Rotation-schedule invariants (README "Cadence plan", r9 verdict).

The driver verifies only the first 50 registry entries per round, so
the ORDER list IS the verification schedule. These tests make the
schedule's promises machine-checked instead of prose: reconstruct the
ledger from the committed driver CORRECTNESS artifacts (the same code
path that emits ROTATION.json) and assert the invariants the README
commits to. They run without Spark — pure JSON + registry import.
"""

from __future__ import annotations

import json
import os
import re
import glob

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: The round this schedule was authored FOR: the max committed driver
#: round + 1 (CORRECTNESS_r{N}.json is written by the driver at the
#: END of round N, so the checked-in ORDER is the N+1 window).
def _current_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def _ledger():
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_rotation import build_ledger

    return build_ledger(REPO)


def test_order_is_a_permutation_of_the_registry():
    from scraping_etl_spark.plans.registry import ORDER, _BY_NAME

    assert sorted(ORDER) == sorted(_BY_NAME)
    assert len(ORDER) >= 50, "registry must fill the driver window"


def test_every_never_driver_checked_entry_holds_a_window_seat():
    """No entry may wait in the tail without ever having had a driver
    CORRECTNESS row — new gates queue at most one round (the README
    cap), then MUST seat."""
    ledger = _ledger()
    stuck = [
        n for n, e in ledger.items()
        if e["first_seated"] is None and e["status"] != "window"
    ]
    assert not stuck, f"never-driver-checked entries left in the tail: {stuck}"


def test_trailing_three_round_invariant():
    """Every entry is either in the upcoming window or has a driver-
    green row within the trailing three rounds (README cadence plan
    item 1)."""
    rnd = _current_round()
    ledger = _ledger()
    stale = [
        n for n, e in ledger.items()
        if e["status"] != "window"
        and (e["last_driver_green"] is None or rnd - e["last_driver_green"] > 3)
    ]
    assert not stale, f"tail entries older than trailing-3 at r{rnd}: {stale}"


def test_forward_trailing_three_invariant():
    """The checked-in window must PRE-seat every entry that would
    otherwise exceed trailing-3 at the NEXT round (r11 verdict item
    2): an entry whose last driver-green row is <= rnd-3 is stale at
    rnd+1 unless it sits in the rnd window — so a stale schedule
    fails at authoring time, not one round after the fact."""
    rnd = _current_round()
    ledger = _ledger()
    owed = [
        n for n, e in ledger.items()
        if e["status"] != "window"
        and (e["last_driver_green"] is None
             or e["last_driver_green"] <= rnd - 3)
    ]
    assert not owed, (
        f"entries owed an r{rnd} seat (stale at r{rnd + 1} otherwise) "
        f"left in the tail: {owed}"
    )


def test_rotation_artifact_matches_the_registry_if_committed():
    """A committed ROTATION.json must be the generated one: same seat
    assignment as the current ORDER (it is emitted, never edited),
    and its per-entry ledger fields must reproduce from the driver
    CORRECTNESS artifacts available when it was authored (rounds <
    its recorded round) — a stale hand-carried ledger fails here."""
    path = os.path.join(REPO, "ROTATION.json")
    if not os.path.exists(path):
        return
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_rotation import build_ledger

    from scraping_etl_spark.plans.registry import ORDER

    with open(path) as f:
        artifact = json.load(f)
    assert artifact["window"] == ORDER[:50]
    seats = {n: e["seat"] for n, e in artifact["entries"].items()}
    assert seats == {n: i + 1 for i, n in enumerate(ORDER)}
    rebuilt = build_ledger(REPO, max_round=artifact["round"] - 1)
    for name, entry in artifact["entries"].items():
        assert entry["first_seated"] == rebuilt[name]["first_seated"], name
        assert (
            entry["last_driver_green"] == rebuilt[name]["last_driver_green"]
        ), name
