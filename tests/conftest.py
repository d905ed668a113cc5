import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from grandine_spark.session import get_spark

    s = get_spark("grandine-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
