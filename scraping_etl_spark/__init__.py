"""scraping_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``marua15/Scraping-ETL`` (an academic-
publications scraping + ETL + star-schema warehouse pipeline), extended
with the operators a large-scale (100 TB) training-data pipeline needs:
deduplication, similarity search, text analysis, and multimodal-column
plumbing.

Design principles (see SURVEY.md):

- **DataFrame-first.** Every operator is a ``DataFrame -> DataFrame``
  library function; Catalyst owns optimization (pushdown, pruning,
  join selection, AQE).
- **Explicit schemas** for every table (``schemas.py``); no inference
  in production paths.
- **JVM-side hot path.** Built-in ``pyspark.sql.functions`` everywhere
  possible; Arrow-vectorized ``pandas_udf`` / ``mapInPandas`` only where
  semantics genuinely require Python (binary re-decode, web fetch).
- **Deterministic surrogate keys** (``xxhash64`` of natural keys), fixing
  the reference's nondeterministic ``monotonically_increasing_id`` usage
  (SURVEY §2.9 Q1-Q4).
"""

from scraping_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
