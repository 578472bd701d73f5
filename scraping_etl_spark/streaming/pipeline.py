"""Structured Streaming twins of the batch pipeline (SURVEY §2.8).

The reference has no true streaming, but its incremental
append-per-article sink (ScienceDirect/ScienceDirect.py:457-488
``save_to_json`` — an O(n²) whole-file rewrite per record) is
stream-shaped; SURVEY §1.1 maps it to Structured Streaming. Two twins:

- :func:`incremental_append_stream` — S11's streaming form: file-source
  stream → true append parquet sink (replacing the reference's
  read-modify-write loop with an idempotent, checkpointed append).
- :func:`hourly_rollup_stream` — the streaming twin of the batch
  ``hourly_event_rollup`` query (plans/relational.py): 1-hour tumbling
  windows with a watermark for late data, upserted per micro-batch via
  ``foreachBatch`` + dynamic partition overwrite (the portable upsert
  for plain parquet — each batch rewrites exactly the window partitions
  it touched; with a Delta/Iceberg sink this becomes a MERGE).

Scale notes: the rollup state is bounded by the watermark horizon
(2 h of windows per key); ``foreachBatch`` writes are idempotent per
(window, event_type) partition so replays after failure are safe;
file-source listing uses ``maxFilesPerTrigger`` to bound batch size at
a 100 TB backfill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from scraping_etl_spark import schemas


def incremental_append_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = schemas.EVENTS,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """S11 streaming twin: watch ``source_dir`` for new parquet files,
    append them to ``out_dir`` exactly once (checkpointed)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    writer = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hourly_rollup_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = schemas.EVENTS,
    watermark: str = "2 hours",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming hourly event rollup, upserted to parquet.

    Mirrors the batch ``q_hourly_event_rollup`` semantics: per
    (hour-window, event_type) counts and value sums. ``update`` output
    mode + ``foreachBatch`` upsert keeps windows correct under late
    data within the watermark.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # dynamic partition overwrite: only the (hour_start) partitions
        # present in this micro-batch are rewritten — an idempotent
        # upsert on plain parquet
        (
            batch_df.withColumn("hour_key", F.date_format("hour_start", "yyyyMMddHH"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("hour_key")
            .parquet(out_dir)
        )

    writer = (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
