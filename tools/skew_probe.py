#!/usr/bin/env python
"""Hot-key skew escalation probe for the gram-join family (r10
verdict item 6).

Builds a deliberately Zipf-skewed corpus — sf0.1 documents with ONE
shared boilerplate line prepended to 30% of docs (the "of the"/footer
regime real crawls have) — and measures the worst gram join,
``dedup.containment_pairs``, WITH its too-common filter (the
documented skew guard: grams shared by > ``max_docs_per_gram`` docs
are dropped before the pair join) and WITHOUT it (guard threshold
lifted above the corpus size, AQE skew-join left on, so whatever AQE
can do it does).

The quantity that matters is the candidate-pair relation: a gram in
``h`` docs fans out to ``h·(h-1)/2`` pairs, so one line in 30% of N
docs costs O((0.3·N)²) rows PER boilerplate gram — quadratic in
corpus size, which no partition-splitting (AQE's tool) repairs: AQE
can split an oversized partition, but the rows still exist, shuffle,
and aggregate. The guard removes them by construction.

Prints a markdown table row per run; paste into PLANS.md.

Usage: ``python tools/skew_probe.py [sf_dir] [boilerplate_frac]``
"""

from __future__ import annotations

import os
import sys
import time

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3

BOILER = (
    "subscribe to our newsletter for weekly updates and exclusive offers "
    "terms of service apply"
)


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from pyspark.sql import functions as F

    from scraping_etl_spark.operators.dedup import containment_pairs
    from scraping_etl_spark.session import get_spark
    from scraping_etl_spark.sources.readers import load_table

    spark = get_spark(app_name="skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_docs = d.count()
    bucket = int(FRAC * 100)
    skewed = d.select(
        "doc_id",
        F.when(
            F.pmod(F.xxhash64("doc_id"), F.lit(100)) < bucket,
            F.concat(F.lit(BOILER + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).localCheckpoint()  # both runs read identical materialized input
    n_hot = skewed.filter(F.col("text").startswith(BOILER)).count()
    print(f"corpus: {n_docs} docs, {n_hot} carry the boilerplate line "
          f"({100.0 * n_hot / n_docs:.1f}%)")

    rows = []
    for label, cap in [("guard ON (default 64)", 64),
                       ("guard OFF (cap 2^31)", 1 << 31)]:
        t0 = time.perf_counter()
        out = containment_pairs(skewed, k=5, tau=0.5, max_docs_per_gram=cap)
        n_pairs = out.count()
        dt = time.perf_counter() - t0
        rows.append((label, dt, n_pairs))
        print(f"{label}: {dt:.1f} s, {n_pairs} result pairs")

    print("\n| run | wall (s) | result pairs |")
    print("|---|---|---|")
    for label, dt, n_pairs in rows:
        print(f"| {label} | {dt:.1f} | {n_pairs} |")
    on, off = rows[0][1], rows[1][1]
    print(f"\nslowdown without the guard: {off / on:.1f}x")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
