"""URL canonicalization edge cases (operators/urls.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scraping_etl_spark.operators.urls import canonical_url, url_dedup


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(canonical_url("u").alias("c")).collect()[0].c


def test_host_scheme_lowercased_path_case_preserved(spark):
    assert _canon(spark, "HTTP://Example.COM/CaseSensitive/Path") == \
        "http://example.com/CaseSensitive/Path"


def test_default_ports_stripped_only_for_matching_scheme(spark):
    assert _canon(spark, "http://a.com:80/x") == "http://a.com/x"
    assert _canon(spark, "https://a.com:443/x") == "https://a.com/x"
    # non-default port survives; 443 on http is NOT default
    assert _canon(spark, "http://a.com:443/x") == "http://a.com:443/x"
    assert _canon(spark, "https://a.com:8443/x") == "https://a.com:8443/x"


def test_fragment_dropped_slashes_collapsed_trailing_stripped(spark):
    assert _canon(spark, "https://a.com//x///y/#frag") == "https://a.com/x/y"


def test_tracking_params_removed_rest_sorted(spark):
    got = _canon(spark, "https://a.com/p?z=1&utm_source=tw&a=2&fbclid=abc&gclid=g")
    assert got == "https://a.com/p?a=2&z=1"


def test_all_params_tracking_drops_query_entirely(spark):
    assert _canon(spark, "https://a.com/p?utm_a=1&utm_b=2") == "https://a.com/p"


def test_root_url_and_no_path(spark):
    assert _canon(spark, "https://A.com/") == "https://a.com"
    assert _canon(spark, "https://A.com") == "https://a.com"


def test_schemeless_value_passes_through_trimmed_defragged(spark):
    assert _canon(spark, "  not-a-url#frag  ") == "not-a-url"


def test_null_in_null_out(spark):
    df = spark.createDataFrame([(None,)], "u string")
    assert df.select(canonical_url("u").alias("c")).collect()[0].c is None


def test_url_dedup_groups_aliases(spark):
    df = spark.createDataFrame(
        [
            (1, "HTTPS://A.com:443/x?utm_s=1"),
            (2, "https://a.com/x"),
            (3, "https://a.com/y"),
        ],
        "id long, u string",
    )
    out = {r.canonical_url: r for r in
           url_dedup(df, "u", "id").collect()}
    assert out["https://a.com/x"].n_urls == 2
    assert out["https://a.com/x"].survivor_id == 1
    assert out["https://a.com/y"].n_urls == 1


def test_canonicalizer_is_map_side_only(spark):
    df = spark.createDataFrame([(1, "https://a.com/x")], "id long, u string")
    plan = (
        df.select(canonical_url("u"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
