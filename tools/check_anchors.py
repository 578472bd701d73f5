#!/usr/bin/env python
"""COVERAGE.md anchor audit (r10 verdict hygiene item 1).

Every ``file.py:NN`` (or ``:NN-MM``) anchor in COVERAGE.md must
resolve: the file exists, the cited lines exist, and — when the cell
names the symbol right after the anchor (`` `path:NN` `symbol` ``) —
the symbol's text appears near the cited lines (±3 lines of slack for
decorators/reformatting). ``SE/`` is the ``scraping_etl_spark/``
shorthand; bare basenames resolve by unique match under the package.

Run directly (prints failures, exit 1 on any) or via
``tests/test_coverage_anchors.py``.
"""

from __future__ import annotations

import os
import re
import sys

ANCHOR = re.compile(
    r"`(?P<path>[\w./-]+\.py):(?P<start>\d+)(?:-(?P<end>\d+))?`"
    r"(?:\s+`(?P<symbol>[A-Za-z_]\w*)`)?"
)
SLACK = 3


def _resolve(repo: str, path: str) -> str | None:
    if path.startswith("SE/"):
        path = "scraping_etl_spark/" + path[3:]
    cand = os.path.join(repo, path)
    if os.path.exists(cand):
        return cand
    cand = os.path.join(repo, "scraping_etl_spark", path)
    if os.path.exists(cand):  # package-relative shorthand
        return cand
    if "/" not in path:  # bare basename: unique match under the package
        hits = []
        for root, _dirs, files in os.walk(os.path.join(repo, "scraping_etl_spark")):
            if path in files:
                hits.append(os.path.join(root, path))
        if len(hits) == 1:
            return hits[0]
    return None


def audit(repo: str, doc: str = "COVERAGE.md") -> list[str]:
    """Returns a list of human-readable failures (empty = clean)."""
    failures: list[str] = []
    with open(os.path.join(repo, doc)) as f:
        text = f.read()
    for m in ANCHOR.finditer(text):
        path, start = m.group("path"), int(m.group("start"))
        end = int(m.group("end") or start)
        where = f"{doc}: `{m.group(0)}`"
        resolved = _resolve(repo, path)
        if resolved is None:
            failures.append(f"{where}: file not found")
            continue
        with open(resolved) as f:
            lines = f.read().splitlines()
        if end > len(lines) or start < 1 or end < start:
            failures.append(
                f"{where}: lines out of range (file has {len(lines)})"
            )
            continue
        symbol = m.group("symbol")
        if symbol:
            lo = max(0, start - 1 - SLACK)
            hi = min(len(lines), end + SLACK)
            if not any(symbol in ln for ln in lines[lo:hi]):
                failures.append(
                    f"{where}: symbol `{symbol}` not within "
                    f"lines {lo + 1}-{hi} of {os.path.relpath(resolved, repo)}"
                )
    return failures


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    failures = audit(repo)
    for f in failures:
        print(f)
    print(f"check_anchors: {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
