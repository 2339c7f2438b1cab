import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from fatespark.session import get_spark
    s = get_spark(cpus=int(os.environ.get("FATESPARK_TEST_CPUS", "8")),
                  app="fatespark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tmp_root(tmp_path_factory):
    return tmp_path_factory.mktemp("fatespark")
