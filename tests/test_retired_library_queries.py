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
]


@pytest.mark.parametrize("name,fn,oracle", RETIRED, ids=[r[0] for r in RETIRED])
def test_retired_query_matches_oracle(spark, name, fn, oracle):
    sql = oracle(SF_SMOKE) if callable(oracle) else oracle
    assert_matches_oracle(fn(spark, SF_SMOKE), sql, SF_SMOKE)
