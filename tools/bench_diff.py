#!/usr/bin/env python
"""Diff two bench artifacts and print the movers.

Accepts either artifact shape: the full payload
(``{"value": total, "queries": {name: sec}}``, e.g. BENCH_LOCAL.json /
BENCH_SF1_LOCAL.json) or the compact twin (summary keys + flat
``{name: sec}``, e.g. BENCH_LOCAL_r10.json). Prints total movement,
regressions and improvements past a ratio threshold (sub-second
queries are reported only past 2x — single-pass noise on a shared
host), and entries present in only one side.

Usage: ``python tools/bench_diff.py OLD.json NEW.json [min_ratio]``
(default min_ratio 1.3). Exit code 1 if any regression passes the
threshold — usable as a regression gate against the committed floor.
"""

from __future__ import annotations

import json
import sys

_SUMMARY_KEYS = {"total_s", "n_queries", "n_errors", "sf"}


def load(path: str) -> tuple[float, dict[str, float]]:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d and isinstance(d["queries"], dict):
        qs = {k: v for k, v in d["queries"].items() if v is not None}
        total = float(d.get("value") or sum(qs.values()))
    else:  # compact twin
        qs = {
            k: v for k, v in d.items()
            if k not in _SUMMARY_KEYS and isinstance(v, (int, float))
        }
        total = float(d.get("total_s") or sum(qs.values()))
    return total, qs


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old_total, old = load(sys.argv[1])
    new_total, new = load(sys.argv[2])
    min_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3

    print(
        f"total: {old_total:.1f} s -> {new_total:.1f} s "
        f"({new_total / old_total:.2f}x), "
        f"{len(old)} -> {len(new)} queries"
    )
    # r14 on, bench payloads book one-time model training as explicit
    # train:* rows — report that block separately so a sheet WITH the
    # split diffs honestly against one without it (where the same cost
    # hid inside whichever scoring gate ran first)
    t_old = sum(v for k, v in old.items() if k.startswith("train:"))
    t_new = sum(v for k, v in new.items() if k.startswith("train:"))
    if t_old or t_new:
        print(
            f"train rows: {t_old:.1f} s -> {t_new:.1f} s; "
            f"query-only total: {old_total - t_old:.1f} s -> "
            f"{new_total - t_new:.1f} s"
        )
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print("only in OLD:", only_old)
    if only_new:
        print("only in NEW:", {k: round(new[k], 2) for k in only_new})

    regressions = []
    improvements = []
    for k in sorted(set(old) & set(new)):
        if not old[k] or not new[k]:
            continue
        r = new[k] / old[k]
        # sub-second queries swing on shared-host noise; require 2x
        gate = max(min_ratio, 2.0) if max(old[k], new[k]) < 1.0 else min_ratio
        if r >= gate:
            regressions.append((r, k))
        elif r <= 1.0 / gate:
            improvements.append((r, k))
    for r, k in sorted(regressions, reverse=True):
        print(f"  REG {k}: {old[k]:.2f} -> {new[k]:.2f} ({r:.2f}x)")
    for r, k in sorted(improvements):
        print(f"  IMP {k}: {old[k]:.2f} -> {new[k]:.2f} ({r:.2f}x)")
    if not regressions and not improvements:
        print("  no movers past threshold")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
