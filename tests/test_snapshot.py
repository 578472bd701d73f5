"""Snapshot diff + DQ profile semantics (operators/snapshot.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scraping_etl_spark.operators.snapshot import dq_profile, snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b long")


def test_diff_statuses(spark):
    old = _snap(spark, [(1, "x", 1), (2, "y", 2), (3, "z", 3)])
    new = _snap(spark, [(1, "x", 1), (2, "y2", 2), (4, "w", 4)])
    got = {r.k: r.status for r in
           snapshot_diff(old, new, "k", ["a", "b"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_diff_include_unchanged(spark):
    old = _snap(spark, [(1, "x", 1)])
    new = _snap(spark, [(1, "x", 1)])
    assert snapshot_diff(old, new, "k", ["a", "b"]).count() == 0
    got = snapshot_diff(old, new, "k", ["a", "b"], include_unchanged=True).collect()
    assert [(r.k, r.status) for r in got] == [(1, "unchanged")]


def test_diff_null_transitions_are_changes(spark):
    old = _snap(spark, [(1, None, 1), (2, "v", 2)])
    new = _snap(spark, [(1, "v", 1), (2, None, 2)])
    got = {r.k: r.status for r in
           snapshot_diff(old, new, "k", ["a", "b"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_diff_no_fingerprint_forgeries(spark):
    """The fixed-width per-column digests rule out the two classic
    concat-fingerprint collisions: NULL vs any literal (incl. a
    would-be sentinel), and separator-straddling value pairs."""
    old = _snap(spark, [(1, None, 1), (2, "a\x011b", None)])
    new = _snap(spark, [(1, "\x00null\x00", 1), (2, "a", 1)])
    got = {r.k: r.status for r in
           snapshot_diff(old, new, "k", ["a", "b"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_diff_shuffles_fingerprints_not_payload(spark):
    """The full-outer join must move (key, fp) only: the wide payload
    column never crosses an Exchange."""
    old = _snap(spark, [(1, "x" * 100, 1)])
    new = _snap(spark, [(1, "y" * 100, 1)])
    plan = (
        snapshot_diff(old, new, "k", ["a", "b"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "_fp" in plan  # fingerprints computed below the exchange
    # the payload columns are pruned before the join
    assert plan.count("md5") >= 2


def test_dq_null_rule_result_counts_as_violation(spark):
    df = _snap(spark, [(1, None, 5), (2, "ok", 5)])
    out = {r.rule: r for r in
           dq_profile(df, {"a_nonnull_len": F.length("a") > 1}).collect()}
    # length(NULL) -> NULL -> violation
    assert out["a_nonnull_len"].n_violations == 1
    assert out["a_nonnull_len"].violation_frac == 0.5


def test_dq_requires_rules(spark):
    df = _snap(spark, [(1, "x", 1)])
    with pytest.raises(ValueError, match="at least one rule"):
        dq_profile(df, {})


def test_dq_single_pass_no_join(spark):
    df = _snap(spark, [(1, "x", 1), (2, "y", 2)])
    out = dq_profile(df, {"b_pos": F.col("b") > 0, "a_set": F.col("a").isNotNull()})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Scan ") <= 1
    got = {r.rule: r.n_violations for r in out.collect()}
    assert got == {"b_pos": 0, "a_set": 0}
