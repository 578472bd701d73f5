#!/usr/bin/env python
"""Machine-readable rotation ledger (r9 verdict item 6).

Reconstructs every registry entry's driver-verification history from
the committed ``CORRECTNESS_r*.json`` artifacts plus the registry's
current ``ORDER`` — generated, never hand-maintained — and writes
``ROTATION.json`` at the repo root:

    {"round": N,
     "window": [...first 50 ORDER names...],
     "entries": {name: {"first_seated": r | null,
                        "last_driver_green": r | null,
                        "seat": 1-based ORDER position,
                        "status": "window" | "tail"}}}

``first_seated`` is the first round whose driver CORRECTNESS file
contains the entry; ``last_driver_green`` the latest round where its
row was fully green (rows+schema+hash true, err null; rows-only
entries count hash_match=null rows as green when rows_match holds and
no oracle is registered). Usage: ``python tools/make_rotation.py
[round]`` — when omitted, the round defaults to the one the schedule
is being authored FOR: max committed ``CORRECTNESS_r*.json`` round +
1 (the same derivation as ``tests/test_rotation_schedule.py``), so
the staleness report is never vacuously computed against round 0.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

WINDOW = 50


def _green(row: dict, has_oracle: bool) -> bool:
    if row.get("err"):
        return False
    if not row.get("rows_match"):
        return False
    if has_oracle:
        return bool(row.get("schema_match")) and bool(row.get("hash_match"))
    return True


def build_ledger(repo: str, max_round: int | None = None) -> dict[str, dict]:
    """Per-entry ``{first_seated, last_driver_green, seat, status}``
    from the committed driver CORRECTNESS files + the registry ORDER.
    Importable so tests can assert the rotation invariants directly.
    ``max_round`` restricts the history to rounds <= it — what the
    ledger looked like when a given round's schedule was authored."""
    sys.path.insert(0, repo)
    from scraping_etl_spark.plans.registry import ORDER, QUERIES

    oracled = {q.name for q in QUERIES if q.oracle is not None}

    history: dict[str, dict[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:  # skip CORRECTNESS_LOCAL_r*.json — driver rows only
            continue
        r = int(m.group(1))
        if max_round is not None and r > max_round:
            continue
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue  # summary fields (n_ok, sf_dir, ...)
            history.setdefault(name, {})[r] = _green(row, name in oracled)

    entries: dict[str, dict] = {}
    for i, name in enumerate(ORDER):
        seen = history.get(name, {})
        greens = [r for r, ok in seen.items() if ok]
        entries[name] = {
            "first_seated": min(seen) if seen else None,
            "last_driver_green": max(greens) if greens else None,
            "seat": i + 1,
            "status": "window" if i < WINDOW else "tail",
        }
    return entries


def current_round(repo: str) -> int:
    """The round the checked-in ORDER is the schedule FOR: the driver
    writes CORRECTNESS_r{N}.json at the END of round N, so the next
    window to author is N+1. Shared derivation with
    tests/test_rotation_schedule.py."""
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def author_order(entries: dict[str, dict], rnd: int) -> list[str]:
    """Compute the round-``rnd`` verification schedule from the ledger
    (r11 verdict item 3 — the reseat is derived, not hand-edited).

    Seats, in order: every entry OWED a seat (never driver-green, or
    last green <= rnd-3 so it would violate trailing-3 at rnd+1 if
    left in the tail), stalest first; then the most senior
    still-green entries fill the window to 50. The tail is sorted by
    the same staleness key so next round's owed group is contiguous
    at its head. Ties break on the previous seat, so the schedule is
    deterministic and stable under regeneration."""

    def staleness(name: str) -> tuple[int, int]:
        e = entries[name]
        green = e["last_driver_green"]
        return (green if green is not None else -1, e["seat"])

    owed = sorted(
        (
            n for n, e in entries.items()
            if e["last_driver_green"] is None
            or e["last_driver_green"] <= rnd - 3
        ),
        key=staleness,
    )
    if len(owed) > WINDOW:
        raise SystemExit(
            f"cannot author r{rnd}: {len(owed)} entries owed a seat "
            f"but the window holds {WINDOW} — the trailing-3 cadence "
            "needs a wider window or an extra round"
        )
    rest = sorted((n for n in entries if n not in set(owed)), key=staleness)
    fill = rest[: WINDOW - len(owed)]
    return owed + fill + rest[WINDOW - len(owed):]


_GENERATED_HEADER = '''"""GENERATED by ``tools/make_rotation.py --write`` — do not hand-edit.

Round-{rnd} verification schedule (the driver checks seats 1-{window}).
Derived from the committed ``CORRECTNESS_r*.json`` ledger: seats
1-{n_owed} are the {n_owed} entries owed a seat at r{rnd} (last
driver-green <= r{prev3} or never seated), stalest first{reseat}; the
tail is staleness-ordered so the r{next_rnd} owed group is contiguous
at its head. Regenerate with ``python tools/make_rotation.py --write``
after each round's driver artifacts land.
"""

ORDER: list[str] = [
'''


def write_order(repo: str, rnd: int, entries: dict[str, dict]) -> list[str]:
    order = author_order(entries, rnd)
    n_owed = sum(
        1 for n, e in entries.items()
        if e["last_driver_green"] is None or e["last_driver_green"] <= rnd - 3
    )
    dest = os.path.join(
        repo, "scraping_etl_spark", "plans", "rotation_order.py"
    )
    reseat = (
        "" if n_owed >= WINDOW else
        f"; seats\n{n_owed + 1}-{WINDOW} re-seat the most senior "
        "still-green entries"
    )
    with open(dest, "w") as f:
        f.write(_GENERATED_HEADER.format(
            rnd=rnd, window=WINDOW, n_owed=n_owed, prev3=rnd - 3,
            reseat=reseat, next_rnd=rnd + 1,
        ))
        for name in order:
            f.write(f'    "{name}",\n')
        f.write("]\n")
    return order


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = [a for a in sys.argv[1:] if a != "--write"]
    write = "--write" in sys.argv[1:]
    rnd = int(args[0]) if args else current_round(repo)

    entries = build_ledger(repo)

    if write:
        new_order = write_order(repo, rnd, entries)
        # Re-derive seats/status against the freshly written ORDER so
        # ROTATION.json and rotation_order.py are emitted in lockstep.
        entries = {
            name: {**entries[name],
                   "seat": i + 1,
                   "status": "window" if i < WINDOW else "tail"}
            for i, name in enumerate(new_order)
        }
        print(f"rotation_order.py: authored r{rnd} schedule")

    from scraping_etl_spark.plans.registry import ORDER

    order = new_order if write else ORDER
    out = {"round": rnd, "window": order[:WINDOW], "entries": entries}
    dest = os.path.join(repo, "ROTATION.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")

    never = [n for n, e in entries.items() if e["first_seated"] is None]
    stale = [
        n for n, e in entries.items()
        if e["last_driver_green"] is not None
        and rnd - e["last_driver_green"] > 3
    ]
    print(
        f"ROTATION.json: {len(entries)} entries, "
        f"{len(never)} never seated, {len(stale)} older than trailing-3"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
