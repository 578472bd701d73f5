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


SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 1800,
    schema: T.StructType = schemas.EVENTS,
    available_now: bool = True,
) -> StreamingQuery:
    """Custom stateful operator via ``applyInPandasWithState`` — the
    streaming twin of the batch ``q_sessionize`` (plans/relational.py):
    per-user session counting where a gap > ``gap_seconds`` opens a new
    session.

    State design (the part ``session_window`` can't express when the
    output must be *running per-user totals* rather than per-session
    rows): one fixed-size state row per user — (last event time,
    session count, event count). Each micro-batch sorts its per-user
    rows by time, folds them into the state, and emits the updated
    totals. State is O(|users|), not O(events); a production deployment
    adds state TTL via ``GroupStateTimeout.ProcessingTimeTimeout``.

    Within-batch rows arrive sorted here, but events that arrive in a
    LATER batch with an earlier timestamp are folded in arrival order —
    the documented at-scale trade-off of per-key running state (exactly
    what a watermark + drop-late policy would formalize).
    """
    import pandas as pd

    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs, state):
        (user_id,) = key
        if state.exists:
            last_ts, n_sess, n_ev = state.get
        else:
            last_ts, n_sess, n_ev = None, 0, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts in pdf["ts"]:
                ts_us = int(ts.value // 1000) if hasattr(ts, "value") else int(ts)
                if last_ts is None or ts_us - last_ts > gap_us:
                    n_sess += 1
                last_ts = ts_us
                n_ev += 1
        state.update((last_ts, n_sess, n_ev))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_sessions": [n_sess], "n_events": [n_ev]}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(schema).parquet(source_dir)
    sessions = (
        stream.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # latest totals win: partition by user bucket, dynamic overwrite
        (
            batch_df.withColumn("bucket", F.pmod(F.col("user_id"), F.lit(16)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(out_dir)
        )

    writer = (
        sessions.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_star_stream(
    spark: SparkSession,
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental star-schema maintenance from a record stream — the
    pipeline-level form of the reference's per-article incremental sink
    (ScienceDirect.py:457-488 rewrote a whole JSON array per article;
    here each micro-batch appends fact rows and dedup-merges dims).

    Per batch (``foreachBatch``):
    - ``articles`` fact: plain parquet append of the batch's rows keyed
      by deterministic ``xxhash64`` surrogate keys — append-only, no
      read-modify-write;
    - ``topics`` dim: union current dim with the batch's new topics,
      keyed dedup, overwrite — idempotent because the surrogate key is
      a pure function of the natural key (replays converge to the same
      dim; a nondeterministic key scheme would fork on every retry,
      which is exactly reference quirk Q1).

    Dims are orders smaller than facts, so the read-union-overwrite is
    cheap at any scale; the fact path never rewrites existing data."""
    import os

    from scraping_etl_spark.etl.star_schema import surrogate_key

    fact_dir = os.path.join(out_dir, "articles")
    topic_dir = os.path.join(out_dir, "topics")

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.withColumn("TopicID", surrogate_key("topic"))
        # fact: append-only
        (
            batch_df.select(
                F.col("doi").alias("DOI"),
                F.col("title").alias("Title"),
                "TopicID",
                F.col("site").alias("Website"),
            )
            .write.mode("append")
            .parquet(fact_dir)
        )
        # dim: keyed dedup-merge (idempotent under replay)
        new_topics = batch_df.select("TopicID", F.col("topic").alias("Topic")).distinct()
        try:
            current = batch_df.sparkSession.read.parquet(topic_dir)
            merged = current.unionByName(new_topics).dropDuplicates(["TopicID"])
        except Exception:  # first batch — dim doesn't exist yet
            merged = new_topics
        # materialize before overwrite: the merged plan reads the same
        # files the overwrite deletes
        rows = merged.collect()
        batch_df.sparkSession.createDataFrame(rows, merged.schema).write.mode(
            "overwrite"
        ).parquet(topic_dir)

    writer = (
        stream.writeStream.outputMode("append")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
