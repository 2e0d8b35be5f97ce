import pytest

from emdatapipelines_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("emdp-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
