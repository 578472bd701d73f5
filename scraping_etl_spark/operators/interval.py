"""Bucketed point-in-interval (range) join.

Spark has no native range join; the naive formulation
``points JOIN intervals ON p.ts BETWEEN i.start AND i.end`` plans as a
broadcast-nested-loop (or, with an equality key, a sort-merge join whose
range residual re-scans dense groups). The scalable classic — used by
Databricks' range-join optimization and bin-based genomic joins — is
**bucketing**: quantize time into fixed-width buckets, explode each
interval into the buckets it covers, take a plain hash equi-join on
(key, bucket), then re-check the exact range predicate.

Cost model: each interval produces ``⌈span/width⌉ + 1`` rows; each point
exactly one. With ``width`` ≈ the typical span, the join is a uniform
hash shuffle with ~2× interval duplication and ZERO row explosion on the
point side — a point lives in exactly one bucket, so a matching
(interval, point) pair meets in exactly one bucket and needs no
post-join dedup.

At 100 TB: both sides shuffle on (by, bucket) — high cardinality, AQE
splits skewed buckets; nothing is broadcast-nested-loop, nothing is
cartesian. Pick ``bucket_width`` near the median interval span (too
small → interval duplication, too big → residual-filter waste).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__iv_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    by: str | list[str] | None = None,
    bucket_width: int = 3_600_000_000,
    start_inclusive: bool = True,
    end_inclusive: bool = True,
) -> DataFrame:
    """Join every point to every interval containing it.

    ``point_ts`` / ``start_col`` / ``end_col`` must be integral (cast
    timestamps to ``unix_micros`` first — integral bucket math is exact
    and engine-portable). Column names of the two inputs must be
    disjoint apart from ``by``. Returns inner-join rows with all
    columns from both sides.
    """
    by_keys = [by] if isinstance(by, str) else list(by or [])

    def bucket(c: Column) -> Column:
        return F.floor(c / F.lit(bucket_width))

    iv = intervals.withColumn(
        _BUCKET,
        F.explode(F.sequence(bucket(F.col(start_col)), bucket(F.col(end_col)))),
    )
    pt = points.withColumn(_BUCKET, bucket(F.col(point_ts)))

    lo = (
        F.col(point_ts) >= F.col(start_col)
        if start_inclusive
        else F.col(point_ts) > F.col(start_col)
    )
    hi = (
        F.col(point_ts) <= F.col(end_col)
        if end_inclusive
        else F.col(point_ts) < F.col(end_col)
    )
    return pt.join(iv, by_keys + [_BUCKET]).filter(lo & hi).drop(_BUCKET)
