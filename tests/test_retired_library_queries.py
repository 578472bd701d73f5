"""Retired driver gates stay correct as library queries.

When a gate is folded into a superset (window-saturation fold, see
README "Correctness rotation"), the standalone query function and its
DuckDB oracle leave the registry — and therefore leave the
tests/test_relational_queries.py sweep, which parametrizes over
registry QUERIES only. This module keeps each retired (query, oracle)
pair exercised directly so they never rot into dead code: the fold
supersets are the driver-checked surface, these are the library faces.
"""

from __future__ import annotations

import pytest

from scraping_etl_spark.plans import corpus_ops as C
from scraping_etl_spark.plans import ml_ops as M
from scraping_etl_spark.plans import relational as R
from tests.conftest import SF_SMOKE
from tests.oracle import assert_matches_oracle

RETIRED = [
    # folded r15 into doc_text_stats (n_bpe_tokens / tokens_per_word)
    ("doc_token_counts", M.q_doc_token_counts, M.ORACLE_DOC_TOKEN_COUNTS),
    # folded r15 into doc_zipf_fit (Heaps columns)
    ("doc_heaps_fit", C.q_doc_heaps_fit, C.ORACLE_DOC_HEAPS_FIT),
    # folded r15 into event_lag_delta (mavg_7)
    ("event_moving_avg", R.q_event_moving_avg, R.ORACLE_EVENT_MOVING_AVG),
    # folded r16 into emb_quantized_topk (tier='float32')
    ("emb_cosine_topk", M.q_emb_cosine_topk, M.ORACLE_EMB_COSINE_TOPK),
    # folded r16 into doc_gumbel_sample (method='stratified')
    ("doc_stratified_sample", C.q_doc_stratified_sample,
     C.ORACLE_DOC_STRATIFIED_SAMPLE),
]


@pytest.mark.parametrize("name,fn,oracle", RETIRED, ids=[r[0] for r in RETIRED])
def test_retired_query_matches_oracle(spark, name, fn, oracle):
    sql = oracle(SF_SMOKE) if callable(oracle) else oracle
    assert_matches_oracle(fn(spark, SF_SMOKE), sql, SF_SMOKE)


def test_quantized_topk_fold_is_genuine_superset(spark):
    """Superset honesty (the doc_zipf_fit bar): the r16 fold's
    tier='float32' slice must equal the retired emb_cosine_topk
    row-for-row, and tier='int8' the pre-fold quantized gate (pinned
    against its preserved component oracle)."""
    from pyspark.sql import functions as F

    sup = M.q_emb_quantized_topk(spark, SF_SMOKE)
    f32 = sup.filter(F.col("tier") == "float32").drop("tier")
    assert sorted(map(tuple, f32.collect())) == sorted(
        map(tuple, M.q_emb_cosine_topk(spark, SF_SMOKE).collect())
    )
    assert_matches_oracle(
        sup.filter(F.col("tier") == "int8").drop("tier"),
        M.ORACLE_EMB_QUANTIZED_TOPK_INT8,
        SF_SMOKE,
    )


def test_gumbel_sample_fold_is_genuine_superset(spark):
    """Superset honesty: the method='stratified' slice equals the
    retired doc_stratified_sample verbatim, the method='gumbel' slice
    the pre-fold gumbel gate (its preserved component oracle)."""
    from pyspark.sql import functions as F

    from scraping_etl_spark.plans import curation_ops as CU

    sup = CU.q_doc_gumbel_sample(spark, SF_SMOKE)
    strat = sup.filter(F.col("method") == "stratified").select(
        "doc_id", "lang", "sample_rank"
    )
    assert sorted(map(tuple, strat.collect())) == sorted(
        map(tuple, C.q_doc_stratified_sample(spark, SF_SMOKE).collect())
    )
    assert_matches_oracle(
        sup.filter(F.col("method") == "gumbel").select(
            "doc_id", "lang", "n_chars", "gumbel_key"
        ),
        CU.ORACLE_DOC_GUMBEL_COMPONENT,
        SF_SMOKE,
    )
