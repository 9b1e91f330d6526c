import pytest

from brdrq_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("brdrq_spark_tests", cpus=4, shuffle_partitions=8)
    yield s
