"""Writer tests (SURVEY §2.1 S12-S15): escaping parity with the
reference's INSERT generator, and CSV/JSON round-trips."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scraping_etl_spark.sources import writers as W
from scraping_etl_spark.sources.readers import read_csv, read_json_array, read_json_lines


def test_sql_insert_escaping_rules(spark):
    """Byte-parity with DB/iqueries generator.py:26-40: NULL for
    missing, bare numerics, quoted strings with ' doubled."""
    schema = T.StructType(
        [
            T.StructField("AuthorID", T.LongType()),
            T.StructField("FullName", T.StringType()),
            T.StructField("Country", T.StringType()),
            T.StructField("University", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [
            (510, "Yu Xi", "China",
             "Department of endocrinology, Huangshan city People's Hospital, Huangshan 245000"),
            (7, None, "France", None),
        ],
        schema,
    )
    stmts = sorted(
        r.stmt for r in W.render_sql_inserts(df, "authors").collect()
    )
    # exact line shipped in the reference's DB/queries/authors_queries.sql
    assert stmts[0] == (
        "INSERT INTO authors (AuthorID, FullName, Country, University) VALUES "
        "(510, 'Yu Xi', 'China', 'Department of endocrinology, Huangshan city "
        "People''s Hospital, Huangshan 245000');"
    )
    assert stmts[1] == (
        "INSERT INTO authors (AuthorID, FullName, Country, University) VALUES "
        "(7, NULL, 'France', NULL);"
    )


def test_sql_insert_topic_reference_parity(spark):
    """Reproduce the first shipped line of DB/queries/topic_queries.sql."""
    df = spark.createDataFrame([(0, "Cryptography")], "TopicID long, Topic string")
    [r] = W.render_sql_inserts(df, "topic").collect()
    assert r.stmt == "INSERT INTO topic (TopicID, Topic) VALUES (0, 'Cryptography');"


def test_csv_roundtrip(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, 'comma, "quoted"', 1.5), (2, None, None), (3, "plain", -2.0)], schema
    )
    path = str(tmp_path / "csv")
    W.write_csv(df, path)
    back = read_csv(spark, path, schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_lines_roundtrip(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("meta", T.StructType([T.StructField("k", T.StringType())])),
        ]
    )
    df = spark.createDataFrame(
        [(1, ["a", "b"], ("v",)), (2, [], (None,))], schema
    )
    path = str(tmp_path / "jsonl")
    W.write_json_lines(df, path)
    back = read_json_lines(spark, path, schema, quarantine=False)
    assert sorted(r.id for r in back.collect()) == [1, 2]
    assert back.filter(F.col("id") == 1).collect()[0].tags == ["a", "b"]


def test_json_array_writer_format(spark, tmp_path):
    """S12 parity: whole-array JSON that json.load (and the engine's
    read_json_array) both accept."""
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    path = str(tmp_path / "arr.json")
    W.write_json_array(df, path)
    with open(path, encoding="utf-8") as fh:
        data = json.load(fh)
    assert sorted(d["id"] for d in data) == [1, 2]
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    back = read_json_array(spark, path, schema, quarantine=False)
    assert back.count() == 2


def test_sql_inserts_file_sink(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b'c")], "id long, v string")
    path = str(tmp_path / "sql")
    W.write_sql_inserts(df, "t", path)
    lines = []
    for f in os.listdir(path):
        if f.startswith("part-"):
            lines += open(os.path.join(path, f), encoding="utf-8").read().splitlines()
    assert sorted(lines) == [
        "INSERT INTO t (id, v) VALUES (1, 'a');",
        "INSERT INTO t (id, v) VALUES (2, 'b''c');",
    ]


def test_json_array_max_rows_guard(spark, tmp_path):
    df = spark.range(10).selectExpr("id AS a")
    p = str(tmp_path / "arr.json")
    with pytest.raises(ValueError, match="small-export"):
        from scraping_etl_spark.sources.writers import write_json_array

        write_json_array(df, p, max_rows=5)


def test_mongodb_contract(spark):
    """S9/S10 without the connector jar, both phases in ONE test so the
    ordering is explicit rather than a file-position accident (the
    fake-source registration below is session-wide and irreversible, so
    the jar-absent error paths must be probed first):

    phase 1 — with no ``mongodb`` format available, both directions
    fail with the engine's actionable RuntimeError, not a raw
    ClassNotFound;

    phase 2 — a Python DataSource registered under the same ``mongodb``
    format name receives exactly the options the wrappers wire
    (connection.uri / database / collection)."""
    import pytest
    from pyspark.sql.datasource import DataSource, DataSourceReader

    from scraping_etl_spark.sources.readers import read_mongodb
    from scraping_etl_spark.sources.writers import write_mongodb

    df_probe = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(RuntimeError, match="connector jar"):
        write_mongodb(df_probe, "mongodb://localhost:27017", "db", "c")
    with pytest.raises(RuntimeError, match="connector jar"):
        read_mongodb(spark, "mongodb://localhost:27017", "db", "c")

    class FakeMongoReader(DataSourceReader):
        def __init__(self, options):
            self.options = options

        def read(self, partition):
            for k in ("connection.uri", "database", "collection"):
                yield (k, self.options.get(k))

    class FakeMongoSource(DataSource):
        @classmethod
        def name(cls):
            return "mongodb"

        def schema(self):
            return "k string, v string"

        def reader(self, schema):
            return FakeMongoReader(self.options)

        def writer(self, schema, overwrite):
            raise ValueError(
                "fake-mongo-write "
                + " ".join(
                    f"{k}={self.options.get(k)}"
                    for k in ("connection.uri", "database", "collection")
                )
            )

    spark.dataSource.register(FakeMongoSource)

    got = {
        r.k: r.v
        for r in read_mongodb(
            spark, "mongodb://h:27017", "db1", "coll1"
        ).collect()
    }
    assert got == {
        "connection.uri": "mongodb://h:27017",
        "database": "db1",
        "collection": "coll1",
    }

    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(RuntimeError) as ei:
        write_mongodb(df, "mongodb://h:27017", "db2", "coll2")
    cause = str(ei.value.__cause__)
    assert "connection.uri=mongodb://h:27017" in cause
    assert "database=db2" in cause and "collection=coll2" in cause


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC sink/source round-trip; the filter reaches the ORC scan as a
    pushed predicate (searchArgument) and the projection prunes."""
    from scraping_etl_spark.sources.readers import load_table, read_orc
    from scraping_etl_spark.sources.writers import write_orc

    src = load_table(spark, "/root/testdata/sf0.001", "customer")
    path = str(tmp_path / "cust_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.count() == src.count()
    q = back.filter("c_nationkey = 3").select("c_custkey", "c_name")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "c_nationkey" in plan
    got = {r.c_custkey for r in q.collect()}
    want = {r.c_custkey for r in src.filter("c_nationkey = 3").collect()}
    assert got == want
