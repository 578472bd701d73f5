"""Fellegi–Sunter linkage scoring units (operators/linkage.py):
hand-computed m/u estimates, score arithmetic, smoothing floors."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from scraping_etl_spark.operators import linkage as LK


def _labeled(spark):
    # 4 matches, 2 non-matches; field f1 agrees on 3/4 matches and
    # 1/2 non-matches; f2 agrees on all matches and no non-match
    rows = [
        (True, True, True),
        (True, True, True),
        (True, True, True),
        (True, False, True),
        (False, True, False),
        (False, False, False),
    ]
    return spark.createDataFrame(
        rows, "is_match boolean, f1 boolean, f2 boolean"
    )


def test_fs_weights_hand_computed(spark):
    w = LK.fs_weights(_labeled(spark), ["f1", "f2"]).collect()[0]
    assert w.n_match == 4 and w.n_nonmatch == 2
    assert w.m_f1 == pytest.approx((3 + 0.5) / (4 + 1))
    assert w.u_f1 == pytest.approx((1 + 0.5) / (2 + 1))
    assert w.m_f2 == pytest.approx((4 + 0.5) / (4 + 1))
    # f2 never agrees on a non-match -> smoothing floor, not 0
    assert w.u_f2 == pytest.approx(0.5 / 3)


def test_fs_score_hand_computed(spark):
    lab = _labeled(spark)
    w = LK.fs_weights(lab, ["f1", "f2"])
    pairs = spark.createDataFrame(
        [(1, True, True), (2, False, False)], "pid long, f1 boolean, f2 boolean"
    )
    got = {r.pid: r.fs_score for r in
           LK.fs_score(pairs, w, ["f1", "f2"]).collect()}
    m1, u1 = 3.5 / 5, 1.5 / 3
    m2, u2 = 4.5 / 5, 0.5 / 3
    exp_agree = math.log(m1 / u1) + math.log(m2 / u2)
    exp_dis = math.log((1 - m1) / (1 - u1)) + math.log((1 - m2) / (1 - u2))
    assert got[1] == pytest.approx(round(exp_agree, 6), abs=1e-9)
    assert got[2] == pytest.approx(round(exp_dis, 6), abs=1e-9)
    # agreement raises the score, disagreement lowers it
    assert got[1] > 0 > got[2]


def test_fs_weights_requires_fields(spark):
    with pytest.raises(ValueError, match="at least one field"):
        LK.fs_weights(_labeled(spark), [])


def test_fs_score_passes_through_columns(spark):
    lab = _labeled(spark)
    w = LK.fs_weights(lab, ["f1"])
    pairs = spark.createDataFrame(
        [(7, "x", True)], "pid long, tag string, f1 boolean"
    )
    out = LK.fs_score(pairs, w, ["f1"])
    assert out.columns == ["pid", "tag", "f1", "fs_score"]
    assert out.collect()[0].tag == "x"
