"""Distributed extraction: URL frontier + ``mapInPandas`` fetch (SURVEY
§2.1 S1-S5, §3.1).

The reference extracts with single-threaded Selenium loops
(ScienceDirect/ScienceDirect.py:492-592 ``main_scraper``;
IEEE/IEEE.py:442-489). The Spark-native shape inverts it:

1. the pagination loop becomes an explicit **frontier DataFrame**
   ``(site, topic, url, page)`` — :func:`build_frontier`;
2. source-side predicate pushdown (S3 — the reference encodes
   ``articleTypes=FLA&accessTypes=openaccess`` in the URL,
   ScienceDirect.py:497) becomes filter kwargs rendered into the URL at
   frontier-build time, mirroring DataSourceV2 ``SupportsPushDownFilters``
   without needing a planner rule (SURVEY §4);
3. fetching becomes one ``mapInPandas`` pass over the frontier
   (:func:`fetch_pages`) — Arrow batches, per-executor politeness rate
   limit, per-row fault tolerance into an ``_error`` column instead of
   crashing the job;
4. parsing is a **pluggable pure function** ``html -> list[dict]``
   evaluated inside the same pass; parsed records are emitted as JSON
   strings and typed with ``from_json`` against the explicit schema —
   malformed records quarantine as NULL structs, never fail the stage.

No live web access in this environment or in tests: the fetcher is
injected (tests use an HTML-fixture fetcher; production wires urllib /
httpx here). Scale notes: partition the frontier by (site, page-range)
so per-site rate limits apply per executor; detail fetches (S4) batch
per Arrow chunk; the SCImago enrichment (S5) collapses N per-row scans
into ``distinct(journal)`` + one fetch pass + a broadcast as-of join
(operators/asof.py) — SURVEY §3.3.
"""

from __future__ import annotations

import json
import re
import time
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: fetcher: url -> html text (raises on failure; failures are captured
#: per-row into the _error column).
Fetcher = Callable[[str], str]
#: parser: html -> list of record dicts (per-field fault tolerance is
#: the parser's job — emit None for missing fields, like the
#: reference's per-field try/except, ScienceDirect.py:290-395).
Parser = Callable[[str], list[dict]]

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("site", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("url", T.StringType()),
    ]
)

FETCHED_SCHEMA = T.StructType(
    list(FRONTIER_SCHEMA.fields)
    + [
        T.StructField("record_json", T.StringType()),
        T.StructField("_error", T.StringType()),
    ]
)


def build_frontier(
    spark: SparkSession,
    site: str,
    topic: str,
    base_url: str,
    pages: int,
    page_size: int = 100,
    filters: dict[str, str] | None = None,
) -> DataFrame:
    """Materialize the pagination loop as data (S1/S2) with source-side
    pushdown (S3): ``filters`` render into every page URL exactly like
    the reference's query-string predicates. The offset arithmetic
    mirrors ScienceDirect.py:534 (``show=100&offset=k*100``)."""
    fparams = "".join(
        f"&{k}={v}" for k, v in sorted((filters or {}).items())
    )
    rows = [
        (site, topic, p, f"{base_url}?qs={topic}&show={page_size}&offset={p * page_size}{fparams}")
        for p in range(pages)
    ]
    # partition by page so fetch parallelism == page count (politeness
    # rate limits then apply per executor, not per job)
    return spark.createDataFrame(rows, FRONTIER_SCHEMA).repartition(
        max(1, min(pages, 64)), "page"
    )


def fetch_pages(
    frontier: DataFrame,
    fetcher: Fetcher,
    parser: Parser,
    requests_per_second: float = 0.0,
) -> DataFrame:
    """One distributed fetch+parse pass over the frontier.

    Emits one output row per parsed record (page fan-out happens inside
    the UDF — explode-free), with per-row fault tolerance: a fetch or
    parse failure produces a single row carrying ``_error`` and a NULL
    ``record_json`` instead of failing the task (the reference wraps
    every field extractor in try/except for the same reason).
    """
    import pandas as pd

    min_interval = 1.0 / requests_per_second if requests_per_second > 0 else 0.0

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        last_fetch = 0.0
        for pdf in batches:
            out: list[dict] = []
            for row in pdf.itertuples(index=False):
                base = {
                    "site": row.site, "topic": row.topic,
                    "page": row.page, "url": row.url,
                }
                if min_interval:
                    wait = min_interval - (time.monotonic() - last_fetch)
                    if wait > 0:
                        time.sleep(wait)
                last_fetch = time.monotonic()
                try:
                    html = fetcher(row.url)
                    records = parser(html)
                except Exception as exc:  # per-row quarantine, never crash
                    out.append({**base, "record_json": None, "_error": repr(exc)[:500]})
                    continue
                if not records:
                    out.append({**base, "record_json": None, "_error": "EMPTY_PAGE"})
                    continue
                for rec in records:
                    out.append({**base, "record_json": json.dumps(rec), "_error": None})
            yield pd.DataFrame(out, columns=[f.name for f in FETCHED_SCHEMA.fields])

    return frontier.mapInPandas(run, schema=FETCHED_SCHEMA)


def typed_records(fetched: DataFrame, schema: T.StructType) -> DataFrame:
    """Type the parsed JSON records against an explicit schema.
    Unparseable records become NULL structs (quarantined by the caller
    via ``_error``/null checks), mirroring PERMISSIVE mode."""
    return (
        fetched.filter(F.col("record_json").isNotNull())
        .withColumn("rec", F.from_json("record_json", schema))
        .select("site", "topic", "page", "url", "rec.*")
    )


def fetch_details(
    df: DataFrame, url_col: str, fetcher: Fetcher, out_col: str = "detail_html"
) -> DataFrame:
    """Per-row detail-page lookup scan (S4): the reference opens each
    result in a new browser tab (ScienceDirect.py:566-585); here one
    ``mapInPandas`` pass adds the detail payload + error column."""
    import pandas as pd

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.StringType()), T.StructField("_detail_error", T.StringType())]
    )
    names = [f.name for f in out_schema.fields]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            htmls, errs = [], []
            for u in pdf[url_col]:
                try:
                    htmls.append(fetcher(u)); errs.append(None)
                except Exception as exc:
                    htmls.append(None); errs.append(repr(exc)[:500])
            pdf = pdf.copy()
            pdf[out_col] = htmls
            pdf["_detail_error"] = errs
            yield pdf[names]

    return df.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# Fixture-format parsers (pluggable; production swaps real site parsers)
# ---------------------------------------------------------------------------

_RESULT_RE = re.compile(
    r'<article[^>]*data-doi="(?P<doi>[^"]*)"[^>]*>.*?'
    r"<h2[^>]*>(?P<title>.*?)</h2>.*?"
    r'<span class="authors">(?P<authors>.*?)</span>.*?'
    r'<span class="date">(?P<date>.*?)</span>',
    re.S,
)


def parse_result_page(html: str) -> list[dict]:
    """Reference parser for the test fixture format: one ``<article>``
    element per result with data-doi, h2 title, authors and date spans.
    Per-field tolerance: missing groups become None, a record with no
    DOI is still emitted (quarantined downstream), matching the
    reference's default-value extractors."""
    out = []
    for m in _RESULT_RE.finditer(html):
        d = {k: (v.strip() or None) for k, v in m.groupdict().items()}
        if d.get("authors"):
            d["authors"] = [a.strip() for a in d["authors"].split(";") if a.strip()]
        else:
            d["authors"] = None
        out.append(d)
    return out


PARSED_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("doi", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField("date", T.StringType()),
    ]
)


# ---------------------------------------------------------------------------
# In-extraction joins: positional zip (J5) and superscript matching (J6)
# ---------------------------------------------------------------------------

def zip_full_names(given_col, surname_col):
    """J5: positional zip-join — pair ``given-name[i]`` with
    ``surname[i]`` into full names, the reference's index-paired author
    construction (ScienceDirect.py:59-73) as one higher-order
    ``zip_with`` (F11's ``concat_ws`` per element). Shorter array pads
    with NULL → ``concat_ws`` degrades to the non-null part."""
    g = F.col(given_col) if isinstance(given_col, str) else given_col
    s = F.col(surname_col) if isinstance(surname_col, str) else surname_col
    return F.zip_with(g, s, lambda a, b: F.concat_ws(" ", a, b))


# markers must be whitespace-separated single letters — without the \s+
# anchor the lazy name group surrenders its own final letter
_MARKER_RE = re.compile(r"^(?P<name>.+?)(?:\s+(?P<markers>[a-z](?:\s*,\s*[a-z])*))?$")
_AFF_RE = re.compile(r"^(?P<marker>[a-z])\s+(?P<univ>.+?),\s*(?P<country>[^,]+)$")


def match_superscript_affiliations(
    authors: list[str], affiliations: list[str]
) -> list[dict]:
    """J6: superscript-membership matching — associate each author with
    the affiliations its superscript markers reference, set-deduped on
    (name, university, country) like the reference's processed-set
    (ScienceDirect.py:84-147). Pure function: runs inside the parser
    (extraction-UDF logic, not a DataFrame join).

    Input shapes (fixture format): authors like ``"Alice Smith a,b"``
    (trailing single-letter markers), affiliations like
    ``"a University X, Country"``. An author with no markers, or a
    marker with no affiliation entry, yields one record with NULL
    university/country (per-field tolerance)."""
    by_marker = {}
    for aff in affiliations:
        m = _AFF_RE.match(aff.strip())
        if m:
            by_marker[m.group("marker")] = (
                m.group("univ").strip(),
                m.group("country").strip(),
            )
    out, seen = [], set()
    for raw in authors:
        m = _MARKER_RE.match(raw.strip())
        name = (m.group("name") or "").strip() if m else raw.strip()
        markers = [
            t.strip() for t in (m.group("markers") or "").split(",") if t.strip()
        ] if m else []
        entries = [by_marker.get(t) for t in markers] or [None]
        for e in entries:
            univ, country = e if e else (None, None)
            key = (name, univ, country)
            if key in seen:
                continue
            seen.add(key)
            out.append({"author": name, "university": univ, "country": country})
    return out


def merge_frontiers(*frontiers: DataFrame) -> DataFrame:
    """P11: visited-URL dedup across frontiers — overlapping topic
    searches surface the same URLs; ``dropDuplicates`` on the URL is
    the distributed twin of the reference's in-page visited-link set
    (ScienceDirect.py:552-563)."""
    out = frontiers[0]
    for f in frontiers[1:]:
        out = out.unionByName(f)
    return out.dropDuplicates(["url"])
