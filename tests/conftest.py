import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linked_maps_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small local session for tests; shuffle partitions kept low for speed
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    sp = get_spark("linked-maps-tests", cores=4, shuffle_partitions=4)
    yield sp
