import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    from geomesa_spark import get_spark
    from geomesa_spark.functions import register_functions

    spark = get_spark("geomesa-spark-tests", cpus=4, shuffle_partitions=8)
    register_functions(spark)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.path.join(TESTDATA, "sf0.001")
