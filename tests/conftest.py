import tempfile

import pytest

from brdrq_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    wh = tempfile.mkdtemp(prefix="brdrq_warehouse_")
    s = get_spark(
        "brdrq_spark_tests",
        cpus=4,
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
