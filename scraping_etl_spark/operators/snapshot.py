"""Snapshot diff + data-quality profiling — lake-maintenance operators.

The reference re-scrapes and fully rewrites its JSON corpus every run
(ScienceDirect.py save_to_json; SD_Upd re-enrichment), so "what changed
since yesterday" is answered by eyeballing file diffs. At pipeline
scale that question is an operator: a keyed diff of two snapshots
(added / removed / changed) drives incremental downstream recompute
(only re-embed changed docs, only re-index added ones), and a
data-quality rule profile gates a snapshot before it replaces the
previous one.

Both are single-shuffle shapes: the diff is one full-outer hash join
on the key comparing content hashes (never values column-by-column
across the wire — the md5 collapses arbitrary row width to 32 bytes
before the shuffle); the DQ profile is one partial-agg pass with every
rule evaluated map-side.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_fingerprint(df: DataFrame, cols: list[str]) -> Column:
    """Collision-free change-detection key: each column hashes
    SEPARATELY to a fixed-width digest of a null-flag + value — so a
    NULL can never collide with any string (the flag differs) and no
    separator ambiguity exists across columns (parts are fixed width;
    a naive ``concat_ws(sep, ...)`` is forgeable whenever a value
    contains the separator) — then the concatenated digests collapse
    to the final 32-byte md5 that crosses the shuffle."""
    parts = []
    for c in cols:
        v = F.col(c).cast("string")
        parts.append(
            F.md5(
                F.concat(
                    F.when(v.isNull(), F.lit("0")).otherwise(F.lit("1")),
                    F.coalesce(v, F.lit("")),
                )
            )
        )
    return F.md5(F.concat(*parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Keyed diff of two snapshots: one row per key present in either,
    with ``status`` in ``added`` / ``removed`` / ``changed`` (and
    ``unchanged`` when ``include_unchanged``). Change detection runs on
    :func:`row_fingerprint` of ``compare_cols``.

    Plan shape at 100 TB: fingerprints are computed map-side on both
    scans, then ONE full-outer shuffle join on the key moves only
    (key, 32-byte hash) pairs — never the payload columns. The status
    projection is map-side after the join. Downstream incremental
    consumers filter on ``status`` with ordinary pushdown."""
    o = old.select(
        F.col(key_col), row_fingerprint(old, compare_cols).alias("_old_fp")
    )
    n = new.select(
        F.col(key_col), row_fingerprint(new, compare_cols).alias("_new_fp")
    )
    j = o.join(n, key_col, "full_outer")
    status = (
        F.when(F.col("_old_fp").isNull(), F.lit("added"))
        .when(F.col("_new_fp").isNull(), F.lit("removed"))
        .when(F.col("_old_fp") != F.col("_new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(key_col, status.alias("status"))
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def dq_profile(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Data-quality rule profile: each rule is a boolean Column (true =
    row passes); the output is one row per rule — ``(rule, n_rows,
    n_violations, violation_frac)`` — computed in ONE map-side
    partial-agg pass over the snapshot (rules evaluate per-row inside
    the same projection; no per-rule scans, no shuffle beyond the final
    single-row combine).

    NULL rule results count as violations (a rule that cannot evaluate
    did not pass) — the conservative gate semantics."""
    if not rules:
        raise ValueError("dq_profile: at least one rule required")
    aggs = [F.count(F.lit(1)).alias("_n")]
    names = sorted(rules)
    for i, name in enumerate(names):
        aggs.append(
            F.sum(
                F.when(~F.coalesce(rules[name], F.lit(False)), 1).otherwise(0)
            ).alias(f"_v{i}")
        )
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{name}', _v{i}" for i, name in enumerate(names))
    return wide.select(
        F.expr(f"stack({len(names)}, {stack}) AS (rule, n_violations)"),
        F.col("_n").alias("n_rows"),
    ).select(
        "rule",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.round(F.col("n_violations") / F.col("n_rows"), 6).alias("violation_frac"),
    )
