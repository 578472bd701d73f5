#!/usr/bin/env python
"""sf1 sanity probe: run registry gates against a synthetic 10× corpus.

Reusable form of the ad-hoc 10× passes recorded in PLANS.md since
round 5 (same construction): materializes a parquet scale dir at
``/tmp/sf1_probe`` with

- ``documents`` ×10: id-shifted replicas, each carrying one extra
  replica-tagged token so every doc sits in a 10-member NEAR-dup
  group (a far denser pair graph than the bench corpus — adversarial
  for the dedup family);
- ``embeddings`` ×10: id-shifted replicas with the deterministic
  per-element perturbation of ``tools/measure_recall.py`` (replicas
  are near-neighbors, stressing ANN candidate volume);
- every other table copied through unchanged (the probed gates here
  are corpus/embedding-shaped; relational 10× passes were recorded in
  earlier rounds' tables).

Then runs the requested gates with the ENGINE session on local[32],
full-materialization action (noop write, as bench.py), and prints a
markdown table row per gate for pasting into tools/plans_footer.md.

Usage: ``python tools/sf1_probe.py gate1 gate2 ...``
"""

from __future__ import annotations

import os
import shutil
import sys
import time

OUT = "/tmp/sf1_probe"
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10


def build(spark) -> None:
    from pyspark.sql import functions as F

    from scraping_etl_spark.schemas import TESTDATA_TABLES
    from scraping_etl_spark.sources.readers import load_table

    os.makedirs(OUT, exist_ok=True)

    docs = load_table(spark, SRC, "documents")
    n = docs.count()
    parts = []
    for r in range(REPLICAS):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * n)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" replica{r}")).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + F.lit(9)).alias("n_chars"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT, "documents.parquet")
    )

    emb = load_table(spark, SRC, "embeddings")
    m = emb.count()
    dim = len(emb.select("embedding").first()[0])
    eparts = []
    for r in range(REPLICAS):
        eps = F.array(
            *[F.lit(1.0 + (((r * dim + j) % 7) - 3) * 1e-3) for j in range(dim)]
        )
        eparts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * m)).alias("vec_id"),
                F.zip_with(
                    "embedding", eps,
                    lambda x, s: (x.cast("double") * s).cast("float"),
                ).alias("embedding"),
                "label",
            )
        )
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.repartition(8).write.mode("overwrite").parquet(
        os.path.join(OUT, "embeddings.parquet")
    )

    for t in TESTDATA_TABLES:
        if t in ("documents", "embeddings"):
            continue
        dest = os.path.join(OUT, f"{t}.parquet")
        src = os.path.join(SRC, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dest):
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dest)


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    gates = sys.argv[1:]
    if not gates:
        print("usage: python tools/sf1_probe.py gate1 gate2 ...")
        return 2

    from scraping_etl_spark.plans.registry import QUERIES
    from scraping_etl_spark.session import get_spark

    spark = get_spark(app_name="sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(OUT, "documents.parquet")):
        t0 = time.perf_counter()
        build(spark)
        print(f"built 10x corpus at {OUT} in {time.perf_counter() - t0:.1f}s")

    by = {q.name: q for q in QUERIES}
    print("| Query | sf1 (10×) | rows |")
    print("|---|---|---|")
    for g in gates:
        if g not in by:
            print(f"| {g} | UNKNOWN GATE | |")
            continue
        try:
            t0 = time.perf_counter()
            df = by[g].fn(spark, OUT)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            nrows = df.count()
            print(f"| {g} | {dt:.1f} s | {nrows} |")
        except Exception as exc:  # noqa: BLE001 - probe isolation
            print(f"| {g} | FAIL {type(exc).__name__}: {str(exc)[:160]} | |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
