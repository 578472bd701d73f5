from __future__ import annotations

import pytest

from scraping_etl_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="scraping-etl-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
