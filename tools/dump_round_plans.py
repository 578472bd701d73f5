#!/usr/bin/env python
"""Dump `.explain("formatted")` for named registry queries into
plans/<round>/<name>_<suffix>.txt (optimization-round evidence).

Usage:
    python tools/dump_round_plans.py r16 before q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    rnd, suffix, *names = sys.argv[1:]
    from scraping_etl_spark.plans.registry import queries_map
    from scraping_etl_spark.session import get_spark

    spark = get_spark(app_name=f"plans-{rnd}-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = queries_map()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", rnd,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qmap[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
