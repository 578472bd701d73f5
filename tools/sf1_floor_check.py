#!/usr/bin/env python
"""sf1 regression floor (r11 verdict item 4): gate, not snapshot.

Re-runs registry queries against the `tools/sf1_probe.py` 10× corpus
(same construction, same seed-free deterministic replicas as the
committed artifact) and compares per-query wall clock against the
committed floor ``BENCH_SF1_LOCAL.json``. A query FAILS the gate when

    fresh > RATIO * max(floor, ABS_FLOOR_S)

with RATIO = 1.5 (the r11 verdict's tolerance) and ABS_FLOOR_S = 0.75
— sub-second queries are scheduler-noise-dominated at local[32], so
the absolute clamp keeps 0.3 s -> 0.5 s jitter from flagging while a
real 2× blow-up on anything that matters still trips. Timing is
min-of-2 full-materialization passes (bench.py's convention) so a
cold first pass doesn't false-positive.

Usage::

    python tools/sf1_floor_check.py            # full registry
    python tools/sf1_floor_check.py q1 q2 ...  # subset

Writes ``/tmp/sf1_floor_check.json`` (fresh timings + verdicts) and
exits non-zero listing offenders. Queries present in the registry but
missing from the floor (new gates) are reported as ``no-floor`` and
do not fail; regenerate the floor artifact after seating new gates.
"""

from __future__ import annotations

import json
import os
import sys
import time

RATIO = 1.5
ABS_FLOOR_S = 0.75
PASSES = 2


def run_check(names: list[str] | None = None) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from sf1_probe import OUT, build

    from scraping_etl_spark.plans.registry import QUERIES
    from scraping_etl_spark.session import get_spark

    with open(os.path.join(repo, "BENCH_SF1_LOCAL.json")) as f:
        floor = json.load(f)["queries"]

    spark = get_spark(app_name="sf1-floor-check")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(OUT, "documents.parquet")):
        build(spark)

    todo = [q for q in QUERIES if names is None or q.name in names]
    fresh: dict[str, float] = {}
    verdicts: dict[str, str] = {}
    for q in todo:
        try:
            best = None
            for _ in range(PASSES):
                t0 = time.perf_counter()
                q.fn(spark, OUT).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            fresh[q.name] = round(best, 4)
            base = floor.get(q.name)
            if base is None:
                verdicts[q.name] = "no-floor"
            elif best > RATIO * max(base, ABS_FLOOR_S):
                verdicts[q.name] = f"REGRESSED {best:.2f}s vs floor {base:.2f}s"
            else:
                verdicts[q.name] = "ok"
        except Exception as exc:  # noqa: BLE001 - per-query isolation
            verdicts[q.name] = f"ERROR {type(exc).__name__}: {str(exc)[:160]}"
    spark.stop()

    out = {
        "ratio": RATIO,
        "abs_floor_s": ABS_FLOOR_S,
        "passes": PASSES,
        "fresh": fresh,
        "verdicts": verdicts,
    }
    with open("/tmp/sf1_floor_check.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    return out


def main() -> int:
    names = sys.argv[1:] or None
    out = run_check(names)
    bad = {
        n: v for n, v in out["verdicts"].items()
        if v.startswith(("REGRESSED", "ERROR"))
    }
    n_ok = sum(1 for v in out["verdicts"].values() if v == "ok")
    print(f"sf1 floor check: {n_ok} ok, {len(bad)} flagged "
          f"(ratio {RATIO}, abs clamp {ABS_FLOOR_S}s, min of {PASSES})")
    for n, v in sorted(bad.items()):
        print(f"  {n}: {v}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
