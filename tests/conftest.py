import os

import pytest
from pyspark.sql import SparkSession

from datasketches_spark_spark.sources import session_builder

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = (session_builder(master="local[4]", app="dss-tests",
                             shuffle_partitions=4)
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from datasketches_spark_spark.sources import load_tables
    return load_tables(spark, sf_dir)
