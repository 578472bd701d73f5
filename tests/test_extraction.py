"""Extraction-skeleton tests: URL frontier, pushdown, mapInPandas fetch
with fixture HTML — no live web (SURVEY §5 strategy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scraping_etl_spark.sources import extraction as X

PAGE_TPL = """
<html><body>
<article data-doi="10.1/{site}.{page}.1">
  <h2>Title {page}-1</h2>
  <span class="authors">Alice Smith; Bob Jones</span>
  <span class="date">19 July 2024</span>
</article>
<article data-doi="10.1/{site}.{page}.2">
  <h2>Title {page}-2</h2>
  <span class="authors">Carol White</span>
  <span class="date">1 August 2024</span>
</article>
</body></html>
"""


def make_fixture_fetcher():
    """Return a self-contained closure: Spark workers cannot import the
    test module (tests/ is not on the executor PYTHONPATH), so the
    fetcher must pickle by value — a closure over locals does; a
    module-level function pickles by reference and fails to load."""
    tpl = PAGE_TPL

    def fetch(url: str) -> str:
        if "page=BOOM" in url or "offset=300" in url:
            raise IOError(f"HTTP 503 for {url}")
        page = url.split("offset=")[1].split("&")[0]
        site = "sd" if "sciencedirect" in url else "ieee"
        return tpl.format(site=site, page=page)

    return fetch


def test_frontier_urls_and_pushdown(spark):
    f = X.build_frontier(
        spark, "sciencedirect", "DevOps", "https://example.org/search",
        pages=3, page_size=100,
        filters={"articleTypes": "FLA", "accessTypes": "openaccess"},
    )
    rows = {r.page: r.url for r in f.collect()}
    assert len(rows) == 3
    # S3: pushed-down predicates rendered into the source URL, offset
    # arithmetic mirrors ScienceDirect.py:534
    assert rows[2] == (
        "https://example.org/search?qs=DevOps&show=100&offset=200"
        "&accessTypes=openaccess&articleTypes=FLA"
    )


def test_fetch_parse_typed(spark):
    f = X.build_frontier(
        spark, "sciencedirect", "AI", "https://example.org/sciencedirect",
        pages=2, page_size=100,
    )
    fetched = X.fetch_pages(f, make_fixture_fetcher(), X.parse_result_page)
    typed = X.typed_records(fetched, X.PARSED_RECORD_SCHEMA)
    rows = {r.doi: r for r in typed.collect()}
    assert len(rows) == 4  # 2 pages x 2 articles
    r = rows["10.1/sd.0.1"]
    assert r.title == "Title 0-1"
    assert r.authors == ["Alice Smith", "Bob Jones"]
    assert r.date == "19 July 2024"
    assert {x.page for x in typed.collect()} == {0, 1}


def test_fetch_error_quarantine(spark):
    # page 3 (offset=300) raises in the fetcher → one _error row,
    # job does NOT fail (per-row fault tolerance)
    f = X.build_frontier(
        spark, "sciencedirect", "AI", "https://example.org/sciencedirect",
        pages=4, page_size=100,
    )
    fetched = X.fetch_pages(f, make_fixture_fetcher(), X.parse_result_page).cache()
    errs = fetched.filter(F.col("_error").isNotNull()).collect()
    assert len(errs) == 1 and "503" in errs[0]._error and errs[0].page == 3
    ok = X.typed_records(fetched, X.PARSED_RECORD_SCHEMA)
    assert ok.count() == 6  # pages 0,1,2 x 2 records


def test_detail_fetch(spark):
    df = spark.createDataFrame(
        [("10.1/a", "https://example.org/sciencedirect?offset=0&d=1"),
         ("10.1/b", "https://example.org/x?page=BOOM")],
        "doi string, url string",
    )
    out = {r.doi: r for r in X.fetch_details(df, "url", make_fixture_fetcher()).collect()}
    assert out["10.1/a"].detail_html and out["10.1/a"]._detail_error is None
    assert out["10.1/b"].detail_html is None and "503" in out["10.1/b"]._detail_error


def test_parser_field_tolerance():
    # parser emits records even when fields are missing downstream;
    # a page with no matching articles yields [] → EMPTY_PAGE marker
    assert X.parse_result_page("<html>nothing here</html>") == []


def test_zip_full_names(spark):
    df = spark.createDataFrame(
        [(["Alice", "Bob"], ["Smith", "Jones"]), (["Solo"], ["One", "Extra"])],
        "given array<string>, surname array<string>",
    )
    out = [r["full"] for r in df.select(X.zip_full_names("given", "surname").alias("full")).collect()]
    assert out[0] == ["Alice Smith", "Bob Jones"]
    assert out[1] == ["Solo One", "Extra"]  # shorter side pads with NULL


def test_match_superscript_affiliations():
    authors = ["Alice Smith a,b", "Bob Jones b", "Carol NoMark", "Alice Smith a,b"]
    affs = ["a Univ X, France", "b Univ Y, Spain"]
    recs = X.match_superscript_affiliations(authors, affs)
    assert {"author": "Alice Smith", "university": "Univ X", "country": "France"} in recs
    assert {"author": "Alice Smith", "university": "Univ Y", "country": "Spain"} in recs
    assert {"author": "Bob Jones", "university": "Univ Y", "country": "Spain"} in recs
    # no-marker author keeps per-field-tolerant NULLs
    assert {"author": "Carol NoMark", "university": None, "country": None} in recs
    # duplicate author line set-deduped (reference's processed-set)
    assert len(recs) == 4


def test_merge_frontiers_visited_dedup(spark):
    f1 = X.build_frontier(spark, "sd", "AI", "https://x/search", pages=2)
    f2 = X.build_frontier(spark, "sd", "AI", "https://x/search", pages=3)
    merged = X.merge_frontiers(f1, f2)
    assert merged.count() == 3  # pages 0,1 shared; URL-level dedup


def test_compat_unicode_escape(spark):
    from scraping_etl_spark.operators.cleaning import compat_unicode_escape

    df = spark.createDataFrame([("Bj\\u00f6rn",), (None,)], "s string")
    out = [r["s"] for r in compat_unicode_escape(df, ["s"]).collect()]
    # bug-compat: unicode_escape decodes the literal backslash-escape,
    # then latin-1-mangles real non-ascii (the Q6 mojibake source)
    assert out[0] == "Björn".encode("utf-8").decode("unicode_escape") or out[0] == "Björn"
    assert out[1] is None
