"""Explicit StructType schemas for every table the engine touches.

The reference infers schemas end-to-end (SURVEY §1.3 — ``spark.read.json``
inference plus a JSON→pandas→Spark round-trip); the one declared schema in
the whole reference repo is the affiliation struct used as a UDF return
type (``DB/ETL.ipynb`` cell 21, raw 752-757). This module inverts that:
every table gets an explicit schema, so scans prune columns, parquet
pushdown works, and bad rows land in a quarantine column instead of
silently mistyping a whole column.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Domain: scraped article documents (FIXTURES.md §1)
# ---------------------------------------------------------------------------

#: One author-affiliation link; schema declared by the reference itself at
#: DB/ETL.ipynb cell 21 (raw 752-757).
AFFILIATION = T.StructType(
    [
        T.StructField("author", T.StringType()),
        T.StructField("university", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("location", T.StringType()),
    ]
)

#: Nested publisher struct attached by the enrichment pass
#: (ScienceDirect/SD_Upd.py:75).
PUBLISHER = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("ISSN", T.StringType()),
        T.StructField("Quartile", T.StringType()),
    ]
)

#: Raw scraped+enriched article document — the ETL input
#: (produced by ScienceDirect/ScienceDirect.py:290-395 + SD_Upd.py:64-103).
#: Day/Year/citations are nullable ints; the reference's string sentinels
#: ("Day not found", …) are modeled as nulls + a quarantine flag at read
#: time rather than as a union type.
RAW_ARTICLES = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("abstract", T.StringType()),
        T.StructField("doi", T.StringType()),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField("authors_with_affiliations", T.ArrayType(AFFILIATION)),
        T.StructField("universities", T.ArrayType(T.StringType())),
        T.StructField("countries", T.ArrayType(T.StringType())),
        T.StructField("locations", T.ArrayType(T.StringType())),
        T.StructField("Date", T.StringType()),
        T.StructField("Day", T.StringType()),      # sentinel-bearing in raw form
        T.StructField("Month", T.StringType()),
        T.StructField("Year", T.StringType()),     # sentinel-bearing in raw form
        T.StructField("citations", T.IntegerType()),
        T.StructField("type", T.StringType()),
        T.StructField("keywords", T.ArrayType(T.StringType())),
        T.StructField("ISSN", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("website", T.StringType()),
        T.StructField("publisher", PUBLISHER),
    ]
)

#: SCImago journal-quartile enrichment table (FIXTURES.md §2; the as-of
#: join build side — ScienceDirect/SD_Upd.py:46-57).
JOURNAL_QUARTILES = T.StructType(
    [
        T.StructField("journal_name", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("quartile", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Star-schema outputs (FIXTURES.md §3, DB/Tables/*.csv headers)
# ---------------------------------------------------------------------------

STAR_ARTICLES = T.StructType(
    [
        T.StructField("DOI", T.StringType()),
        T.StructField("Title", T.StringType()),
        T.StructField("Abstract", T.StringType()),
        T.StructField("Citations", T.IntegerType()),
        T.StructField("ISSN", T.StringType()),
        T.StructField("DateID", T.LongType()),
        T.StructField("Website", T.StringType()),
        T.StructField("TopicID", T.LongType()),
    ]
)

STAR_AUTHORS = T.StructType(
    [
        T.StructField("AuthorID", T.LongType()),
        T.StructField("FullName", T.StringType()),
        T.StructField("Country", T.StringType()),
        T.StructField("University", T.StringType()),
    ]
)

STAR_PUBLISHERS = T.StructType(
    [
        T.StructField("ISSN", T.StringType()),
        T.StructField("Name", T.StringType()),
        T.StructField("Quartile", T.StringType()),
    ]
)

STAR_KEYWORDS = T.StructType(
    [
        T.StructField("KeywordID", T.LongType()),
        T.StructField("Keyword", T.StringType()),
    ]
)

STAR_TOPICS = T.StructType(
    [
        T.StructField("TopicID", T.LongType()),
        T.StructField("Topic", T.StringType()),
    ]
)

STAR_DATES = T.StructType(
    [
        T.StructField("DateID", T.LongType()),
        T.StructField("PublicationDate", T.StringType()),
        T.StructField("Day", T.IntegerType()),
        T.StructField("Month", T.StringType()),
        T.StructField("Year", T.IntegerType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver-provided scale tables (/root/testdata, TESTDATA.md)
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

#: Discovered-URL records feeding the streaming crawl frontier
#: (streaming/pipeline.frontier_stream). ``discovered_at`` is the
#: event time (watermark column when the caller bounds state).
FRONTIER = T.StructType(
    [
        T.StructField("url_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("discovered_at", T.TimestampType()),
        T.StructField("depth", T.IntegerType()),
    ]
)

TESTDATA_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
