from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import pytest

from casie_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("casie_tests", master="local[4]", shuffle_partitions=4,
                  extra_conf={"spark.driver.memory": "6g"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
