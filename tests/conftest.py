from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from prql_query_spark.engine.session import get_spark

    s = get_spark("pytest", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
