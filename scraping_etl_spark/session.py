"""SparkSession factory with scale-aware defaults.

The confs here are chosen for correctness-vs-oracle parity on local[32]
while remaining the right defaults for a 1000-executor cluster:

- UTC session timezone — Spark timestamps are session-TZ while DuckDB's
  (the correctness oracle) are UTC-naive; pinning UTC makes date/ts
  semantics identical on both sides.
- AQE on (coalesce post-shuffle partitions, skew-join splitting) — at
  100 TB the static shuffle-partition count is always wrong somewhere;
  AQE re-plans from runtime statistics.
- Arrow on — every pandas_udf / mapInPandas / toPandas transfer is
  columnar-batched instead of pickled row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Default parallelism for local mode: the driver harness exposes
# SPARK_GRAFT_CPUS; fall back to all cores.
_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_spark(
    app_name: str = "scraping-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``shuffle_partitions`` defaults to the local core count — at cluster
    scale you'd size it to ~2-3x total executor cores or simply let AQE
    coalesce from a generous initial value.
    """
    master = master or f"local[{_CPUS}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- determinism / oracle parity -------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # Read parquet TIMESTAMP(NANOS) (e.g. events.ts) as long; readers
        # convert to a microsecond timestamp losslessly (see load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- adaptive execution (the 100 TB safety net) ------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- Python data sources: let Catalyst push filters into them ----
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # --- Arrow everywhere Python touches data ------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- scan sizing: 128 MiB splits are the parquet sweet spot ------
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # --- broadcast joins for dims up to 64 MiB ------------------------
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or _local_cores()))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _local_cores() -> int:
    if _CPUS != "*":
        try:
            return max(1, int(_CPUS))
        except ValueError:
            pass
    return os.cpu_count() or 8
