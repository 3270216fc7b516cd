from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import pytest

from casie_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("casie_tests", master="local[4]", shuffle_partitions=4,
                  extra_conf={"spark.driver.memory": "8g"})
    yield s
    s.stop()


@pytest.fixture(autouse=True, scope="module")
def _cache_hygiene(request):
    """Pipeline stages persist intermediates; a shared session across
    all modules would accumulate them until the heap fills. Clear the
    SQL cache after each module."""
    yield
    if "spark" in request.fixturenames:
        pass
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        s.catalog.clearCache()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
