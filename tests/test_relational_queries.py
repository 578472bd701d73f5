"""Every registered query hash-matches its DuckDB oracle at sf0.001
(fast) — the driver runs the same compare at sf0.01."""

from __future__ import annotations

import pytest

from scraping_etl_spark.plans.registry import QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle import assert_matches_oracle

ORACLE_SPECS = [q for q in QUERIES if q.oracle is not None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[q.name for q in ORACLE_SPECS])
def test_query_matches_oracle(spark, spec):
    df = spec.fn(spark, SF_SMOKE)
    # lazy oracles embed run-time plan constants (e.g. IVF centroids)
    # that depend on the scale dir — build them for THIS sf, the same
    # way the driver's zero-arg call builds them for sf0.01
    oracle = spec.oracle(SF_SMOKE) if callable(spec.oracle) else spec.oracle
    assert_matches_oracle(df, oracle, SF_SMOKE)


@pytest.mark.parametrize("spec", [q for q in QUERIES if q.oracle is None],
                         ids=[q.name for q in QUERIES if q.oracle is None])
def test_query_runs(spark, spec):
    df = spec.fn(spark, SF_SMOKE)
    assert df.count() >= 0
