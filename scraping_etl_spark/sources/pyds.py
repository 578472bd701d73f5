"""Planner-integrated extraction source: a Python Data Source (Spark 4
``pyspark.sql.datasource``) exposing the scrape frontier as a real
catalog-visible source with **filter pushdown through Catalyst**.

`sources/extraction.py` implements pushdown as library convention (the
caller passes filter kwargs — mirroring DataSourceV2 without planner
involvement, SURVEY §4's baseline). This module is the stretch goal the
survey marks optional polish: the SAME pushdown driven by the planner's
own protocol — a ``WHERE site = 'sd' AND topic = 'AI'`` on the
DataFrame reaches :meth:`ScrapeFixtureReader.pushFilters`, prunes whole
(site, topic, page) partitions BEFORE any fetch happens, and unsupported
predicates automatically stay in the Spark plan.

Scale notes: one :class:`InputPartition` per (site, topic, page) — the
fetch parallelism unit; at cluster scale Spark schedules each partition
as a task, so per-site politeness = per-task rate limiting. The fetcher
here is the deterministic HTML fixture generator (no network in this
environment); a production source swaps ``_fixture_fetch`` for HTTP and
keeps every planner-facing part unchanged.

Usage::

    spark.dataSource.register(ScrapeFixtureDataSource)
    df = (spark.read.format("scrapefixture")
          .option("sites", "sd,ieee").option("topics", "AI,IoT")
          .option("pages", "3").load()
          .filter("site = 'sd'"))   # <- pushed, ieee never fetched
"""

from __future__ import annotations

from typing import Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)
from pyspark.sql.types import StructType

#: Declared output schema (explicit, never inferred — engine policy).
SCHEMA_DDL = (
    "site string, topic string, page int, doi string, title string, "
    "authors array<string>, date string"
)


def _fixture_fetch(site: str, topic: str, page: int) -> str:
    """Deterministic fixture HTML for one result page. A site named
    'boom' raises — used by tests to PROVE partition pruning (a pruned
    partition is never fetched, so filtering site != 'boom' must
    succeed)."""
    if site == "boom":
        raise IOError(f"fetch exploded for {site}/{topic}/{page}")
    rows = []
    for i in (1, 2):
        rows.append(
            f'<article data-doi="10.1/{site}.{topic}.{page}.{i}">'
            f"<h2>{topic} study {page}-{i}</h2>"
            f'<span class="authors">Alice Smith; Bob Jones</span>'
            f'<span class="date">19 July 2024</span></article>'
        )
    return "<html><body>" + "".join(rows) + "</body></html>"


class ScrapeFixtureReader(DataSourceReader):
    def __init__(self, options: dict):
        self.sites = [s for s in options.get("sites", "sd").split(",") if s]
        self.topics = [t for t in options.get("topics", "AI").split(",") if t]
        self.pages = int(options.get("pages", "1"))

    def pushFilters(self, filters: List[Filter]) -> Iterator[Filter]:
        """S3 as the planner protocol: accept equality/IN predicates on
        the partition columns, yield back everything else for Spark to
        evaluate post-scan."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute in (("site",), ("topic",)):
                key = f.attribute[0]
                setattr(self, key + "s", [v for v in getattr(self, key + "s") if v == f.value])
            elif isinstance(f, In) and f.attribute in (("site",), ("topic",)):
                key = f.attribute[0]
                allowed = set(f.value)
                setattr(self, key + "s", [v for v in getattr(self, key + "s") if v in allowed])
            else:
                yield f  # unsupported → Spark keeps it in the plan

    def partitions(self):
        # fetch unit = one result page of one (site, topic) search
        return [
            InputPartition((site, topic, page))
            for site in self.sites
            for topic in self.topics
            for page in range(self.pages)
        ]

    def read(self, partition: InputPartition):
        import re

        site, topic, page = partition.value
        html = _fixture_fetch(site, topic, page)
        art = re.compile(
            r'<article data-doi="(.*?)"><h2>(.*?)</h2>'
            r'<span class="authors">(.*?)</span>'
            r'<span class="date">(.*?)</span></article>'
        )
        for doi, title, authors, date in art.findall(html):
            yield (
                site,
                topic,
                page,
                doi,
                title,
                [a.strip() for a in authors.split(";")],
                date,
            )


class ScrapeFixtureDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "scrapefixture"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> ScrapeFixtureReader:
        return ScrapeFixtureReader(self.options)
