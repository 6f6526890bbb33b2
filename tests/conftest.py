import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from lyssandra_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "8g")
    s = get_spark(app="lyssandra-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
