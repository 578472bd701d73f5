"""Sources & sinks: schema-checked readers and distributed writers."""

from scraping_etl_spark.sources.readers import (
    load_table,
    load_testdata,
    read_csv,
    read_json_array,
    read_json_lines,
)
from scraping_etl_spark.sources.writers import (
    write_csv,
    write_json_array,
    write_json_lines,
    write_parquet,
    write_sql_inserts,
)

__all__ = [
    "load_table",
    "load_testdata",
    "read_csv",
    "read_json_array",
    "read_json_lines",
    "write_csv",
    "write_json_array",
    "write_json_lines",
    "write_parquet",
    "write_sql_inserts",
]
