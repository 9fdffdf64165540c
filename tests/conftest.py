import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from jena_spark.session import get_spark

    s = get_spark(app="jena_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
