"""URL canonicalization — the web-corpus dedup key.

The reference is a web scraper whose frontier dedups VISITED urls by
exact string match (ScienceDirect.py visited-set; re-expressed at
sources/extraction.py:287). Exact match misses the aliasing every real
crawl produces — case-shifted hosts, default ports, tracking params,
fragments, duplicated slashes — so a corpus pipeline canonicalizes
before dedup (every CommonCrawl-derived dataset does this before URL-
level dedup). This module is that normalizer, as a pure JVM-side
expression chain (``regexp_replace`` / ``split`` / ``filter`` /
``array_sort`` / ``concat_ws`` — no UDFs), map-side at any scale, and
restricted to the Java∩RE2 regex subset so DuckDB oracles reproduce it
bit-for-bit (same discipline as corpus_prep.scrub_pii).

Normalizations applied (scheme://host[:port]/path?query#fragment):
- scheme and host lowercased (path case is PRESERVED — paths are
  case-sensitive);
- default ports stripped (:80 for http, :443 for https);
- fragment dropped;
- runs of slashes in the path collapsed, trailing slash dropped;
- tracking parameters removed (utm_*, fbclid, gclid, msclkid, ref),
  empty params dropped, the rest SORTED (param order never changes
  resource identity for idempotent GETs — the standard canonicalizer
  trade; callers for whom order matters skip the sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query parameters that never change resource identity.
TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=", "msclkid=", "ref=")


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL column (see module docstring). Null in →
    null out; a value with no ``scheme://`` is returned trimmed and
    fragment-stripped but otherwise untouched (relative URLs are not
    guessed at)."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    u = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    auth = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
        .otherwise(auth)
    )
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    path = F.regexp_replace(path, r"//+", "/")
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(u, r"\?(.*)$", 1)

    def _keep(p: Column) -> Column:
        cond = p != ""
        for t in TRACKING_PREFIXES:
            cond = cond & ~p.startswith(t)
        return cond

    qstr = F.concat_ws("&", F.array_sort(F.filter(F.split(query, "&"), _keep)))
    canon = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(canon)


def url_dedup(
    df: DataFrame, url_col: str, id_col: str, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """URL-level dedup groups: one row per canonical URL with the
    duplicate count and the min-id survivor (the same survivor rule as
    the text near-dup path). One partial-agg shuffle on the canonical
    key — the 100 TB shape of crawl-frontier dedup."""
    return (
        df.withColumn("canonical_url", canonical_url(url_col))
        .groupBy("canonical_url", *keep_cols)
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.min(id_col).alias("survivor_id"),
        )
    )
