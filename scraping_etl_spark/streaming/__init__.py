"""Structured Streaming twins of the batch pipeline (SURVEY §2.8)."""

from scraping_etl_spark.streaming.pipeline import (  # noqa: F401
    hourly_rollup_stream,
    incremental_append_stream,
    sessionize_stream,
)
