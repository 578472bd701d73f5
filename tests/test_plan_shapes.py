"""Plan-shape regressions: the scale-critical physical properties the
operators promise, asserted on the executed/physical plan so a future
refactor can't silently reintroduce a cross join or lose a broadcast."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scraping_etl_spark.plans import ml_ops as M
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_minhash_no_cartesian_no_bnlj(spark):
    plan = _plan(M.q_doc_minhash_pairs(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # candidates via equi-join only


def test_ann_bucket_equijoin(spark):
    plan = _plan(M.q_emb_ann_topk(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # bucket id is an equi key


def test_token_bridge_broadcasts_dim(spark):
    plan = _plan(M.q_doc_token_bridge(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan  # dim side must broadcast (J2/J3)


def test_ann_recall_floor(spark):
    """Hyperplane-LSH ANN must recover a healthy fraction of the exact
    top-k (same-bucket constraint trades recall for the equi-join scale
    path; this pins the trade-off so hash changes can't quietly ruin it).
    """
    from scraping_etl_spark.operators.similarity import ann_hyperplane_topk, cosine_topk
    from scraping_etl_spark.sources.readers import load_table

    e = load_table(spark, SF_SMOKE, "embeddings")
    probes = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    k = 3
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(e, probes, k=k).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_hyperplane_topk(e, probes, dim=64, k=k, planes=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"ANN recall collapsed: {recall:.2f}"


def test_ivf_recall_floor(spark):
    """IVF cluster pruning must beat the LSH path's recall at a similar
    scan fraction (n_probe/n_clusters = 1/4 of the corpus here)."""
    from scraping_etl_spark.operators.similarity import cosine_topk, ivf_topk
    from scraping_etl_spark.sources.readers import load_table

    e = load_table(spark, SF_SMOKE, "embeddings")
    probes = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(e, probes, k=3).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(e, probes, k=3, n_clusters=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall collapsed: {recall:.2f}"


def test_ivf_no_cross_join(spark):
    from scraping_etl_spark.plans import ml_ops as M

    plan = _plan(M.q_emb_ivf_topk(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lm_score_plan_no_bnlj(spark):
    """Regression guard for the vocab-size attach: FoldablePropagation
    turns a literal join key into a one-sided filter and the 1-row
    join degrades to BroadcastNestedLoopJoin; the non-foldable key must
    keep the whole plan BNLJ- and cartesian-free."""
    from scraping_etl_spark.operators.corpus_prep import with_lm_score

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )
    plan = _plan(with_lm_score(df))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
