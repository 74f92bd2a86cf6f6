import shutil
import tempfile

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from cartography_spark.session import get_spark

    s = get_spark(app_name="cartography_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture()
def store(spark):
    from cartography_spark.core.store import GraphStore

    root = tempfile.mkdtemp(prefix="graphstore_")
    yield GraphStore(spark, root, write_partitions=2)
    shutil.rmtree(root, ignore_errors=True)
