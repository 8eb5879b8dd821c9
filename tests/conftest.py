import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", os.environ.get("SPARK_GRAFT_CPUS", "8"))


@pytest.fixture(scope="session")
def spark():
    from gdalcubes_cpp_spark.session import get_spark

    s = get_spark(app="gdalcubes-tests", cores=int(os.environ["SPARK_GRAFT_CPUS"]))
    yield s
    s.stop()
