"""Writers: every sink the reference has, as distributed Spark writes.

Reference equivalents (SURVEY §2.1):
- S9/S10 MongoDB — optional connector, gated behind import-try (jar not in
  this environment); Parquet is the canonical store.
- S11 incremental JSON append (the scrapers' O(n²) read-modify-write of a
  whole array per record — ScienceDirect/ScienceDirect.py:457-488) →
  true ``mode("append")`` parquet / JSON-lines.
- S12 JSON-array writer (SD_Upd.py:127-145) → :func:`write_json_array`
  (export-parity only; JSON-lines is the scale format).
- S13 CSV via driver-side pandas (DB/ETL.ipynb cell 52) →
  :func:`write_csv` — no driver collect.
- S14 JSON-lines (cell 54) → :func:`write_json_lines`.
- S15 SQL INSERT-text renderer (DB/iqueries generator.py:19-46) →
  :func:`write_sql_inserts`, matching the reference's escaping rules
  byte-for-byte, but rendered distributed. ``df.write.jdbc`` is the
  idiomatic path when a real database is reachable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """Canonical sink. ``partition_by`` low-cardinality columns (e.g.
    ``topic``, ``website``) so partition pruning engages at scale."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """ORC sink — the columnar alternative for Hive-centric lakes; same
    partition-pruning contract as :func:`write_parquet`."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_json_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_json_array(df: DataFrame, path: str, max_rows: int = 1_000_000) -> None:
    """Whole-array JSON export for parity with the reference's file format
    (SD_Upd.py:127-145). Inherently single-file — only for small exports.
    Rows stream through ``toLocalIterator`` (one partition in driver
    memory at a time, never the full result), and ``max_rows`` refuses
    runaway exports outright — the scale path is :func:`write_json_lines`.
    """
    it = df.select(F.to_json(F.struct(*df.columns)).alias("j")).toLocalIterator()
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("[\n")
        for i, row in enumerate(it):
            if i >= max_rows:
                raise ValueError(
                    f"write_json_array: >{max_rows} rows — this sink is a "
                    "small-export parity format; use write_json_lines"
                )
            if i:
                fh.write(",\n")
            fh.write(row["j"])
        fh.write("\n]")


# ---------------------------------------------------------------------------
# S15: SQL INSERT-statement text sink
# ---------------------------------------------------------------------------

def _sql_literal(col: str, dtype: T.DataType) -> F.Column:
    """Render one column as a SQL literal per the reference's escaping rules
    (DB/iqueries generator.py:26-40): NULL for missing, bare numerics,
    single-quoted strings with ``'`` doubled.
    """
    c = F.col(col)
    if isinstance(dtype, (T.IntegerType, T.LongType, T.DoubleType, T.FloatType, T.DecimalType)):
        rendered = c.cast("string")
    else:
        rendered = F.concat(F.lit("'"), F.regexp_replace(c.cast("string"), "'", "''"), F.lit("'"))
    return F.when(c.isNull(), F.lit("NULL")).otherwise(rendered)


def render_sql_inserts(df: DataFrame, table: str) -> DataFrame:
    """One ``INSERT INTO t (cols) VALUES (...);`` statement per row, as a
    single-column DataFrame — stays distributed (the reference renders via
    pandas ``iterrows`` on the driver)."""
    cols = ", ".join(df.columns)
    literals = [_sql_literal(f.name, f.dataType) for f in df.schema.fields]
    values = F.concat_ws(", ", *literals)
    stmt = F.concat(
        F.lit(f"INSERT INTO {table} ({cols}) VALUES ("), values, F.lit(");")
    )
    return df.select(stmt.alias("stmt"))


def write_sql_inserts(df: DataFrame, table: str, path: str) -> None:
    """Materialize the INSERT statements as text files (one stmt per line)."""
    render_sql_inserts(df, table).write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# Optional MongoDB connector (reference S9/S10) — jar not shipped here.
# ---------------------------------------------------------------------------

def write_mongodb(df: DataFrame, uri: str, database: str, collection: str) -> None:
    """``df.write.format("mongodb")`` — requires the mongo-spark-connector
    jar (the reference repo's .gitignore references
    ``mongo-spark-connector_2.13-10.3.0.jar``). Raises a clear error when
    the connector is absent instead of a cryptic ClassNotFound."""
    try:
        (
            df.write.format("mongodb")
            .mode("append")
            .option("connection.uri", uri)
            .option("database", database)
            .option("collection", collection)
            .save()
        )
    except Exception as exc:  # pragma: no cover - connector not in test env
        raise RuntimeError(
            "MongoDB connector jar not on classpath; add "
            "mongo-spark-connector to spark.jars.packages or use parquet sinks"
        ) from exc


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 32,
    path: str | None = None,
    fmt: str = "parquet",
) -> None:
    """Bucketed table write — the co-located-join storage layout.

    Two tables bucketed (and sorted) on the same join key with the same
    bucket count join WITHOUT a shuffle: each bucket pairs off and the
    sort-merge runs directly on the bucket files. At 100 TB this is the
    difference between re-shuffling the fact on every join and paying
    the shuffle once at write time. Size ``n_buckets`` so one bucket of
    the largest table fits an executor core's working set.

    Bucketing metadata lives in the session catalog (``saveAsTable`` —
    plain ``save`` cannot record it); pass ``path`` for an external
    table location."""
    writer = (
        df.write.format(fmt)
        .mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
