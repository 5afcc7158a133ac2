import shutil
import sys
import os
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from snappydata_spark import get_spark

    spark = get_spark("tests")
    yield spark


@pytest.fixture()
def snappy(spark):
    from snappydata_spark import SnappySession

    store = tempfile.mkdtemp(prefix="snappy_test_store_")
    sn = SnappySession(spark, store_dir=store)
    yield sn
    shutil.rmtree(store, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
