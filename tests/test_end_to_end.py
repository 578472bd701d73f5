"""End-to-end integration: fixture-HTML extraction → typed records →
quartile enrichment → cleaning → star schema → sinks. The "a user of
the reference could switch" proof: every pipeline stage of the
reference (SURVEY §0 stages 1-4) composed from this engine's operators
in one run, no live web, no Mongo."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scraping_etl_spark.etl import enrichment as EN
from scraping_etl_spark.etl.star_schema import build_star
from scraping_etl_spark.sources import extraction as X
from scraping_etl_spark.sources.writers import render_sql_inserts, write_csv

PAGE = """
<html><body>
<article data-doi="10.1/{topic}.{page}.1">
  <h2>Deep {topic} Methods</h2>
  <span class="authors">Alice Smith a; Bob Jones b</span>
  <span class="date">19 July 2024</span>
  <span class="affils">a Univ X, France|b Univ Y, Spain</span>
  <span class="journal">Journal of {topic}</span>
  <span class="abstract">We study {topic} at scale with twelve methods.</span>
  <span class="citations">Cited by (7)</span>
  <span class="keywords">{topic}; scaling; benchmarks</span>
</article>
<article data-doi="10.1/{topic}.{page}.2">
  <h2>Empty Affil {topic}</h2>
  <span class="authors">Carol White</span>
  <span class="date">1 August 2023</span>
  <span class="affils"></span>
  <span class="journal">Journal of {topic}</span>
  <span class="abstract">A second study of {topic} systems.</span>
  <span class="citations">Cited by (0)</span>
  <span class="keywords">{topic}; systems</span>
</article>
</body></html>
"""

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("doi", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("abstract", T.StringType()),
        T.StructField("Date", T.StringType()),
        T.StructField("citations", T.IntegerType()),
        T.StructField("journal_name", T.StringType()),
        T.StructField("keywords", T.ArrayType(T.StringType())),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField(
            "authors_with_affiliations",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("author", T.StringType()),
                        T.StructField("university", T.StringType()),
                        T.StructField("country", T.StringType()),
                        T.StructField("location", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("countries", T.ArrayType(T.StringType())),
    ]
)


def _make_fetcher():
    tpl = PAGE

    def fetch(url: str) -> str:
        topic = url.split("qs=")[1].split("&")[0]
        page = url.split("offset=")[1].split("&")[0]
        return tpl.format(topic=topic, page=page)

    return fetch


def _make_parser():
    # closures only: executors can't import the tests package
    import re

    art_re = re.compile(r"<article data-doi=\"(.*?)\">(.*?)</article>", re.S)
    span_re = re.compile(r'<span class="(\w+)">(.*?)</span>', re.S)
    cite_re = re.compile(r"\((\d+)\)")
    from scraping_etl_spark.sources.extraction import (
        match_superscript_affiliations,
    )

    def parse(html: str) -> list[dict]:
        out = []
        for doi, body in art_re.findall(html):
            spans = dict(span_re.findall(body))
            title = re.search(r"<h2>(.*?)</h2>", body).group(1)
            authors_raw = [a.strip() for a in spans["authors"].split(";")]
            affils = [a for a in spans.get("affils", "").split("|") if a.strip()]
            matched = match_superscript_affiliations(authors_raw, affils)
            cited = cite_re.search(spans.get("citations", ""))
            out.append(
                {
                    "doi": doi,
                    "title": title,
                    "abstract": spans.get("abstract"),
                    "Date": spans.get("date"),
                    "citations": int(cited.group(1)) if cited else None,
                    "journal_name": spans.get("journal"),
                    "keywords": [k.strip() for k in spans.get("keywords", "").split(";") if k.strip()],
                    "authors": [m["author"] for m in matched],
                    "authors_with_affiliations": [
                        {**m, "location": None} for m in matched
                    ],
                    "countries": sorted(
                        {m["country"] for m in matched if m["country"]}
                    ),
                }
            )
        return out

    return parse


@pytest.fixture(scope="module")
def star_tables(spark):
    # 1. Extract: two topics x two pages, fixture fetch + parse
    frontiers = [
        X.build_frontier(
            spark, "sd", topic, "https://fixture/search", pages=2,
            filters={"accessTypes": "openaccess"},
        )
        for topic in ("AI", "IoT")
    ]
    fetched = X.fetch_pages(
        X.merge_frontiers(*frontiers), _make_fetcher(), _make_parser()
    )
    typed = X.typed_records(fetched, RECORD_SCHEMA)

    # 2. Enrich: quartile dim lookup + publisher struct (as-of by year)
    parsed_date = F.to_date("Date", "d MMMM yyyy")
    articles = (
        typed.withColumnRenamed("topic", "topic_col")
        .withColumn("Day", F.dayofmonth(parsed_date))
        .withColumn("Month", F.date_format(parsed_date, "MMMM"))
        .withColumn("Year", F.year(parsed_date))
        .withColumn("type", F.lit("RESEARCH-ARTICLE"))
        .withColumnRenamed("topic_col", "topic")
        .withColumnRenamed("site", "website")
        .drop("page", "url")
    )
    quartiles = spark.createDataFrame(
        [
            ("Journal of AI", 2024, "Q1", "1111-1111"),
            ("Journal of AI", 2020, "Q2", "1111-1111"),
            ("Journal of IoT", 2022, "Q2", "2222-2222"),
        ],
        "journal string, year int, quartile string, issn string",
    )
    enriched = EN.enrich(articles, quartiles)

    # 3-4. Clean + star schema (fixed semantics)
    return build_star(enriched), enriched


def test_extraction_to_star_cardinalities(star_tables):
    star, enriched = star_tables
    # 2 topics x 2 pages x 2 articles = 8 scraped; the no-affiliation
    # article still has authors (NULL affil fields) so cleaning keeps
    # docs with non-empty author arrays and a resolvable publisher
    assert enriched.count() == 8
    clean_n = star["clean"].count()
    assert clean_n > 0
    assert star["articles"].count() == clean_n
    assert {r["Topic"] for r in star["topics"].collect()} == {"AI", "IoT"}
    # publishers keyed by ISSN from the enrichment quartile dim
    issns = {r["ISSN"] for r in star["publishers"].collect()}
    assert issns <= {"1111-1111", "2222-2222"}


def test_enrichment_asof_year_fallback(star_tables):
    _, enriched = star_tables
    rows = {r["doi"]: r["publisher"] for r in enriched.collect()}
    # 2024 AI article hits the 2024 Q1 row; 2023 AI article falls back
    # to 2020 Q2 (backward as-of within 10 years)
    assert rows["10.1/AI.0.1"]["Quartile"] == "Q1"
    assert rows["10.1/AI.0.2"]["Quartile"] == "Q2"
    # IoT 2024 and 2023 both fall back to 2022
    assert rows["10.1/IoT.0.1"]["Quartile"] == "Q2"


def test_bridges_consistent_with_dims(star_tables):
    star, _ = star_tables
    # every bridge row's AuthorID/KeywordID resolves in its dim (the
    # Q3 fix: joins on full identity cannot orphan or fan out)
    a_ids = {r["AuthorID"] for r in star["authors"].collect()}
    assert {r["AuthorID"] for r in star["author_article_map"].collect()} <= a_ids
    k_ids = {r["KeywordID"] for r in star["keywords"].collect()}
    assert {r["KeywordID"] for r in star["keyword_article_map"].collect()} <= k_ids


def test_sinks_round_trip(spark, star_tables, tmp_path):
    star, _ = star_tables
    # CSV sink → read back (S13/S8)
    out = str(tmp_path / "topics_csv")
    write_csv(star["topics"], out)
    back = spark.read.csv(out, header=True, schema="TopicID long, Topic string")
    assert {r["Topic"] for r in back.collect()} == {"AI", "IoT"}
    # SQL INSERT text sink (S15)
    inserts = [r[0] for r in render_sql_inserts(star["topics"], "topics").collect()]
    assert all(s.startswith("INSERT INTO topics") for s in inserts)
    assert len(inserts) == 2
