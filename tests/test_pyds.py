"""Python Data Source (planner-protocol pushdown) tests — SURVEY §4's
DSv2 stretch goal: predicates on site/topic prune fetch partitions
through Catalyst, unsupported predicates stay in the Spark plan."""

from __future__ import annotations

import pytest

from scraping_etl_spark.sources.pyds import ScrapeFixtureDataSource


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ScrapeFixtureDataSource)


def _read(spark, **opts):
    r = spark.read.format("scrapefixture")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_pushdown_prunes_partitions(spark):
    """site='boom' raises on fetch — the equality filter must prune its
    partitions via pushFilters, or this collect would explode."""
    df = _read(spark, sites="sd,boom", topics="AI,IoT", pages=2).filter("site = 'sd'")
    rows = df.collect()
    assert {r.site for r in rows} == {"sd"}
    assert {r.topic for r in rows} == {"AI", "IoT"}
    assert len(rows) == 2 * 2 * 2  # 2 topics x 2 pages x 2 articles


def test_unpushed_predicate_still_applies(spark):
    df = _read(spark, sites="sd", topics="AI,IoT", pages=1).filter(
        "topic = 'IoT' AND title LIKE '%study 0-1%'"
    )
    rows = df.collect()
    assert [r.doi for r in rows] == ["10.1/sd.IoT.0.1"]


def test_in_filter_pushdown(spark):
    df = _read(spark, sites="sd,boom,ieee", topics="AI", pages=1).filter(
        "site IN ('sd', 'ieee')"
    )
    assert {r.site for r in df.collect()} == {"sd", "ieee"}


def test_partition_parallelism(spark):
    # one input partition per (site, topic, page) — the fetch unit
    df = _read(spark, sites="sd,ieee", topics="AI,IoT", pages=3)
    assert df.rdd.getNumPartitions() == 2 * 2 * 3


def test_stream_source_drains_pages(spark, tmp_path):
    """The streaming face: each checkpointed availableNow run admits the
    next pages_per_batch page increment (the poll-for-new-results
    cadence); offsets persist across restarts, and a drained source
    yields no duplicate rows."""
    from scraping_etl_spark.sources.pyds import ScrapeFixtureStreamDataSource

    spark.dataSource.register(ScrapeFixtureStreamDataSource)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("scrapefixture_stream")
            .option("sites", "sd,ieee").option("topics", "AI")
            .option("pages", "3").option("pages_per_batch", "1")
            .load()
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).count()

    # 2 sites x 1 topic x 2 articles = 4 rows per page increment
    assert run_once() == 4
    assert run_once() == 8
    assert run_once() == 12
    got = spark.read.parquet(out)
    assert {r.page for r in got.select("page").distinct().collect()} == {0, 1, 2}
    assert run_once() == 12  # drained: restart adds nothing


def test_max_results_page_window_prunes_fetches(spark):
    """Limit pushdown in the reference's form (show/offset page window,
    ScienceDirect.py:534): max_results truncates the page range BEFORE
    planning, so pages past the window are never fetched. Topic
    'boomafter0' explodes for any page > 0 — with pages=4 declared,
    only a max_results small enough to stop at page 0 survives."""
    df = _read(spark, sites="sd", topics="boomafter0", pages=4, max_results=2)
    assert df.rdd.getNumPartitions() == 1  # 1 site x 1 topic x 1 page
    assert len(df.collect()) == 2

    # without the window the planner would schedule all 4 pages and hit
    # the exploding fetch
    with pytest.raises(Exception):
        _read(spark, sites="sd", topics="boomafter0", pages=4).collect()


def test_max_results_window_recomputed_after_filter_pushdown(spark):
    """The page window is sized from the PRUNED (site, topic) frontier:
    8 results over 2 sites need 2 pages, but once site='sd' is pushed
    the same 8 need 4 pages of the single remaining site."""
    from scraping_etl_spark.sources.pyds import ScrapeFixtureReader

    r = ScrapeFixtureReader(
        {"sites": "sd,ieee", "topics": "AI", "pages": "6", "max_results": "8"}
    )
    assert len(r.partitions()) == 2 * 1 * 2
    consumed = list(r.pushFilters([]))  # no-op pushdown, window unchanged
    assert consumed == []

    r2 = ScrapeFixtureReader(
        {"sites": "sd,ieee", "topics": "AI", "pages": "6", "max_results": "8"}
    )
    from pyspark.sql.datasource import EqualTo

    leftover = list(r2.pushFilters([EqualTo(("site",), "sd")]))
    assert leftover == []
    assert len(r2.partitions()) == 1 * 1 * 4


def test_max_results_zero_and_negative(spark):
    """max_results=0 plans ZERO partitions (nothing fetched, empty
    result); negative is a configuration error."""
    from scraping_etl_spark.sources.pyds import ScrapeFixtureReader

    r = ScrapeFixtureReader({"sites": "boom", "topics": "AI",
                             "pages": "3", "max_results": "0"})
    assert r.partitions() == []

    with pytest.raises(ValueError, match="max_results"):
        ScrapeFixtureReader({"sites": "sd", "max_results": "-1"})

    # non-numeric boomafter suffixes are ordinary topics, not bombs
    from scraping_etl_spark.sources.pyds import _fixture_fetch

    assert "boomafterparty" in _fixture_fetch("sd", "boomafterparty", 5)
