import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linked_maps_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small local session for tests; shuffle partitions kept low for speed.
    # The background plan-compile warm (a micro ingest prewarm_workers runs
    # by default) is disabled here: it exists to hoist codegen cost off the
    # bench's timed epoch, and in a 4-core test session it would only race
    # the early tests for cores.  test_ingest covers the warm explicitly.
    os.environ.setdefault("LMS_PLAN_WARM", "0")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    sp = get_spark("linked-maps-tests", cores=4, shuffle_partitions=4)
    yield sp
