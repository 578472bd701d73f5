"""SCD type-2 merge semantics (etl/scd.scd2_merge)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from scraping_etl_spark.etl.scd import scd2_merge

EFF = "2000-06-01"
D_EFF = datetime.date(2000, 6, 1)
D0 = datetime.date(1995, 1, 1)


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k long, attr string, effective_from date, effective_to date, is_current boolean"
    )


def _upd(spark, rows):
    return spark.createDataFrame(rows, "k long, attr string")


def _merge(dim, upd):
    return scd2_merge(dim, upd, key_col="k", compare_cols=["attr"], effective_date=EFF)


def test_changed_key_closes_and_appends(spark):
    dim = _dim(spark, [(1, "a", D0, None, True)])
    out = _merge(dim, _upd(spark, [(1, "b")])).orderBy("effective_from").collect()
    assert len(out) == 2
    closed, opened = out
    assert (closed.attr, closed.effective_to, closed.is_current) == ("a", D_EFF, False)
    assert (opened.attr, opened.effective_from, opened.effective_to, opened.is_current) == (
        "b", D_EFF, None, True,
    )


def test_identical_redelivery_is_noop(spark):
    dim = _dim(spark, [(1, "a", D0, None, True)])
    out = _merge(dim, _upd(spark, [(1, "a")])).collect()
    assert len(out) == 1
    assert (out[0].attr, out[0].effective_to, out[0].is_current) == ("a", None, True)


def test_absent_key_passes_through(spark):
    dim = _dim(spark, [(1, "a", D0, None, True)])
    out = _merge(dim, _upd(spark, [(2, "z")])).orderBy("k").collect()
    assert [(r.k, r.attr, r.is_current) for r in out] == [(1, "a", True), (2, "z", True)]
    assert out[1].effective_from == D_EFF


def test_closed_history_untouched(spark):
    dim = _dim(
        spark,
        [(1, "old", datetime.date(1990, 1, 1), D0, False), (1, "a", D0, None, True)],
    )
    out = _merge(dim, _upd(spark, [(1, "b")])).orderBy("effective_from").collect()
    assert len(out) == 3
    assert (out[0].attr, out[0].effective_to, out[0].is_current) == (
        "old", D0, False,
    )


def test_null_transitions_version(spark):
    # value -> NULL and NULL -> value must both count as changes
    dim = _dim(spark, [(1, "a", D0, None, True), (2, None, D0, None, True)])
    out = _merge(dim, _upd(spark, [(1, None), (2, "b")]))
    assert out.count() == 4
    cur = {r.k: r.attr for r in out.filter(F.col("is_current")).collect()}
    assert cur == {1: None, 2: "b"}


def test_missing_attr_raises(spark):
    dim = spark.createDataFrame(
        [(1, "a", "x", D0, None, True)],
        "k long, attr string, extra string, effective_from date, effective_to date, is_current boolean",
    )
    with pytest.raises(ValueError, match="extra"):
        scd2_merge(dim, _upd(spark, [(1, "b")]), key_col="k",
                   compare_cols=["attr"], effective_date=EFF)


def test_merge_is_idempotent(spark):
    """Re-applying the same batch to the merged result changes nothing."""
    dim = _dim(spark, [(1, "a", D0, None, True), (2, "b", D0, None, True)])
    upd = _upd(spark, [(1, "a2"), (3, "c")])
    once = _merge(dim, upd)
    twice = _merge(once, upd)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_update_side_broadcasts(spark):
    dim = _dim(spark, [(1, "a", D0, None, True)])
    out = _merge(dim, _upd(spark, [(1, "b")]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# As-of (time travel)
# ---------------------------------------------------------------------------

def test_scd2_asof_selects_version_valid_at_date(spark):
    from scraping_etl_spark.etl.scd import scd2_asof

    dim = spark.createDataFrame(
        [
            (1, "v1", "2020-01-01", "2021-01-01", False),
            (1, "v2", "2021-01-01", None, True),
            (2, "w1", "2022-01-01", None, True),
        ],
        "k LONG, val STRING, effective_from STRING, effective_to STRING, is_current BOOLEAN",
    ).selectExpr(
        "k", "val",
        "CAST(effective_from AS DATE) AS effective_from",
        "CAST(effective_to AS DATE) AS effective_to",
        "is_current",
    )
    mid = {r.k: r.val for r in scd2_asof(dim, "2020-06-01").collect()}
    assert mid == {1: "v1"}  # key 2 not born yet
    # boundary: the new version takes effect ON its from date
    on = {r.k: r.val for r in scd2_asof(dim, "2021-01-01").collect()}
    assert on[1] == "v2"
    now = {r.k: r.val for r in scd2_asof(dim, "2023-01-01").collect()}
    assert now == {1: "v2", 2: "w1"}
