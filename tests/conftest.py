import os

import pytest
from pyspark.sql import SparkSession

from datasketches_spark_spark.sources import session_builder

# Property-test determinism policy (r15 verdict #6): the default
# profile keeps hypothesis's randomized example search — that is how
# the r15 min/max defect was found — but close-record / CI runs set
# DSS_HYPOTHESIS_PROFILE=pinned so "N tests green" is a reproducible
# pin rather than a roll of the example dice.
try:
    from hypothesis import settings as _hyp_settings
    _hyp_settings.register_profile("pinned", derandomize=True)
    _hyp_settings.register_profile("dev")
    _hyp_settings.load_profile(
        os.environ.get("DSS_HYPOTHESIS_PROFILE", "dev"))
except ImportError:  # hypothesis not installed: property tests skip
    pass

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
