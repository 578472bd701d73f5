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
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

#: Declared output schema (explicit, never inferred — engine policy).
SCHEMA_DDL = (
    "site string, topic string, page int, doi string, title string, "
    "authors array<string>, date string, keywords array<string>"
)


def _fixture_fetch(site: str, topic: str, page: int) -> str:
    """Deterministic fixture HTML for one result page. A site named
    'boom' raises — used by tests to PROVE partition pruning (a pruned
    partition is never fetched, so filtering site != 'boom' must
    succeed). A topic of the form 'boomafterN' raises for pages > N —
    the same proof for page-window (limit) pruning."""
    if site == "boom":
        raise IOError(f"fetch exploded for {site}/{topic}/{page}")
    suffix = topic[len("boomafter"):]
    if topic.startswith("boomafter") and suffix.isdigit() and page > int(suffix):
        raise IOError(f"fetch exploded for {site}/{topic}/{page}")
    rows = []
    for i in (1, 2):
        rows.append(
            f'<article data-doi="10.1/{site}.{topic}.{page}.{i}">'
            f"<h2>{topic} study {page}-{i}</h2>"
            f'<span class="authors">Alice Smith; Bob Jones</span>'
            f'<span class="date">19 July 2024</span>'
            f'<span class="keywords">{topic}; scaling; s{i}</span></article>'
        )
    return "<html><body>" + "".join(rows) + "</body></html>"


class ScrapeFixtureReader(DataSourceReader):
    """Reader with filter pushdown via the planner protocol and limit
    pushdown via the page-window option.

    LIMIT note: PySpark's Python DataSource API (4.1) exposes
    ``pushFilters`` but no ``pushLimit`` — a ``.limit(n)`` cannot reach
    the reader through Catalyst. The reference's limit pushdown is the
    paginated URL window (``show=100&offset=k`` —
    ScienceDirect/ScienceDirect.py:534), and that form IS expressible
    here: ``max_results`` truncates the page range so trailing page
    partitions are never even planned, let alone fetched. Spark's
    CollectLimit still applies the exact row cut on top; the source's
    job is to not fetch pages past the window."""

    def __init__(self, options: dict):
        self.sites = [s for s in options.get("sites", "sd").split(",") if s]
        self.topics = [t for t in options.get("topics", "AI").split(",") if t]
        self.pages = int(options.get("pages", "1"))
        #: rows one page of one (site, topic) yields — the reference's
        #: ``show`` page-size parameter (fixture pages carry 2 articles)
        self.page_size = int(options.get("page_size", "2"))
        mr = options.get("max_results")
        self.max_results = int(mr) if mr is not None else None
        if self.max_results is not None and self.max_results < 0:
            raise ValueError(f"max_results must be >= 0, got {self.max_results}")

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
        # fetch unit = one result page of one (site, topic) search.
        # The page window is computed AFTER pushFilters pruned
        # sites/topics: fewer (site, topic) pairs per page → more pages
        # may be needed to satisfy the same max_results.
        pages = self.pages
        if self.max_results is not None:
            per_page = self.page_size * max(
                1, len(self.sites) * len(self.topics)
            )
            # ceil; max_results=0 legitimately plans ZERO partitions
            # (nothing is ever fetched for an empty window)
            pages = min(pages, -(-self.max_results // per_page))
        return [
            InputPartition((site, topic, page))
            for site in self.sites
            for topic in self.topics
            for page in range(pages)
        ]

    def read(self, partition: InputPartition):
        import re

        site, topic, page = partition.value
        html = _fixture_fetch(site, topic, page)
        art = re.compile(
            r'<article data-doi="(.*?)"><h2>(.*?)</h2>'
            r'<span class="authors">(.*?)</span>'
            r'<span class="date">(.*?)</span>'
            r'<span class="keywords">(.*?)</span></article>'
        )
        for doi, title, authors, date, keywords in art.findall(html):
            yield (
                site,
                topic,
                page,
                doi,
                title,
                [a.strip() for a in authors.split(";")],
                date,
                [k.strip() for k in keywords.split(";")],
            )


class ScrapeFixtureDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "scrapefixture"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> ScrapeFixtureReader:
        return ScrapeFixtureReader(self.options)


class ScrapeFixtureStreamReader(SimpleDataSourceStreamReader):
    """Continuous extraction as a Structured Streaming source (SURVEY
    §1.1 / §2.8: the scrape loop's streaming-native form): the offset is
    the next unread page index; each micro-batch drains newly-available
    pages across every (site, topic). Replays are exact
    (``readBetweenOffsets`` re-fetches the page range deterministically),
    so downstream checkpointed sinks get effectively-once rows.

    ``pages_per_batch`` caps how many new pages a batch admits — the
    streaming twin of the batch frontier's pagination bound (the live
    analogue: "whatever new results appeared since the last poll")."""

    def __init__(self, options: dict):
        self.sites = [s for s in options.get("sites", "sd").split(",") if s]
        self.topics = [t for t in options.get("topics", "AI").split(",") if t]
        self.max_pages = int(options.get("pages", "3"))
        self.per_batch = int(options.get("pages_per_batch", "1"))

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _rows_for(self, page: int):
        reader = ScrapeFixtureReader(
            {"sites": ",".join(self.sites), "topics": ",".join(self.topics), "pages": "1"}
        )
        for site in self.sites:
            for topic in self.topics:
                yield from reader.read(InputPartition((site, topic, page)))

    def read(self, start: dict):
        first = start["page"]
        until = min(first + self.per_batch, self.max_pages)
        # list ITERATOR, not a generator and not a bare list: the
        # prefetch wrapper calls next() on it AND pickles it to tasks —
        # list_iterator satisfies both, generators can't pickle
        rows = [r for p in range(first, until) for r in self._rows_for(p)]
        return iter(rows), {"page": until}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [r for p in range(start["page"], end["page"]) for r in self._rows_for(p)]
        )


class ScrapeFixtureStreamDataSource(DataSource):
    """Streaming face of the fixture scrape source (format name
    ``scrapefixture_stream``); same schema and options as the batch
    source plus ``pages_per_batch``."""

    @classmethod
    def name(cls) -> str:
        return "scrapefixture_stream"

    def schema(self) -> str:
        return SCHEMA_DDL

    def simpleStreamReader(self, schema: StructType) -> ScrapeFixtureStreamReader:
        return ScrapeFixtureStreamReader(self.options)
