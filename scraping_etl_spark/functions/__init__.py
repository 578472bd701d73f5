"""Scalar-function surface: the (deliberately tiny) Python-UDF layer.

Everything expressible as a built-in lives inline in the operators
(SURVEY §2.7 maps F1-F14 to pyspark.sql.functions); only the binary
re-decode (F6) needs Python — see udfs.py.
"""

from scraping_etl_spark.functions.udfs import fix_mojibake  # noqa: F401
