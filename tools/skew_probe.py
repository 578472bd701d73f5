#!/usr/bin/env python
"""Hot-key skew escalation probe for the gram-join family (r10
verdict item 6).

Builds a deliberately Zipf-skewed corpus — sf0.1 documents with ONE
shared boilerplate line prepended to ~30% of docs (the "of the"/
footer regime real crawls have) — and measures the worst gram join,
``dedup.containment_pairs``, WITH its too-common filter (the
documented skew guard: grams shared by > ``max_docs_per_gram`` docs
are dropped before the pair join) and WITHOUT it (guard threshold
lifted above the corpus size; AQE skew-join left on, so whatever AQE
can do it does).

A single scale point can't show the failure mode — at 5k docs the
hot grams cost ~13M join rows, which local[32] absorbs in seconds —
so the probe runs at 1x/2x/4x corpus scale (id-shifted copies, the
100x-probe convention) and reports, per scale:

- candidate-join input rows = Σ_gram nd·(nd-1)/2 (computed exactly
  from gram document frequencies; this is the quantity AQE cannot
  reduce — splitting an oversized partition re-buckets the rows, but
  they still exist, shuffle and aggregate), and
- end-to-end wall clock of ``containment_pairs``.

Guard-off candidate rows grow QUADRATICALLY in the hot-doc count
(4x corpus → 16x rows); guard-on stays linear. That growth table is
the 100 TB argument in measured form.

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

    from scraping_etl_spark.operators.corpus_prep import word_grams
    from scraping_etl_spark.operators.dedup import containment_pairs
    from scraping_etl_spark.session import get_spark
    from scraping_etl_spark.sources.readers import load_table

    spark = get_spark(app_name="skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_base = base.count()
    bucket = int(FRAC * 100)

    print(f"base corpus: {n_base} docs; boilerplate planted in "
          f"~{FRAC:.0%} of docs (hash-selected)")
    print("\n| scale | docs | hot docs | cand rows (guard ON) | "
          "cand rows (guard OFF) | wall ON (s) | wall OFF (s) |")
    print("|---|---|---|---|---|---|---|")

    for mult in (1, 2, 4):
        d = base
        for i in range(1, mult):
            d = d.unionByName(
                base.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    "text",
                )
            )
        skewed = d.select(
            "doc_id",
            F.when(
                F.pmod(F.xxhash64("doc_id"), F.lit(100)) < bucket,
                F.concat(F.lit(BOILER + " "), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        ).localCheckpoint()  # all runs read identical materialized input
        n_docs = skewed.count()
        n_hot = skewed.filter(F.col("text").startswith(BOILER)).count()

        # exact candidate-join input rows from gram doc-frequencies
        dfreq = (
            skewed.select(
                "doc_id",
                F.explode(word_grams(F.lower(F.col("text")), 5)).alias("gram"),
            )
            .distinct()
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("nd"))
        )
        cand = dfreq.select(
            F.sum(
                F.when(F.col("nd") <= 64, F.col("nd") * (F.col("nd") - 1) / 2)
                .otherwise(F.lit(0))
            ).alias("on"),
            F.sum(F.col("nd") * (F.col("nd") - 1) / 2).alias("off"),
        ).collect()[0]

        walls = {}
        for label, cap in [("on", 64), ("off", 1 << 31)]:
            t0 = time.perf_counter()
            containment_pairs(
                skewed, k=5, tau=0.5, max_docs_per_gram=cap
            ).count()
            walls[label] = time.perf_counter() - t0

        print(
            f"| {mult}x | {n_docs} | {n_hot} | {int(cand['on'])} | "
            f"{int(cand['off'])} | {walls['on']:.1f} | {walls['off']:.1f} |",
            flush=True,
        )

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
