"""PYTHONSTARTUP for bin/pyspark: run Spark's own shell bootstrap first
(its path arrives in DSS_SPARK_SHELL — Spark's `pyspark` script exports it
as PYTHONSTARTUP, and bin/.driver-python re-points PYTHONSTARTUP here),
then install the engine's SQL functions into the live session before the
first prompt. Entry-point parity with the reference launcher
(/root/reference/bin/python:45-72 + bin/.startup.py:23-28, which installs
its functions via a py4j call; this engine is pure Python, so install()
registers them directly)."""

import os

_shell = os.environ.pop("DSS_SPARK_SHELL", "")
if _shell and os.path.exists(_shell):
    exec(compile(open(_shell).read(), _shell, "exec"))

import datasketches_spark_spark as dss  # noqa: E402

try:
    spark  # bound by Spark's shell.py above
except NameError:
    from pyspark.sql import SparkSession
    spark = SparkSession.builder.getOrCreate()
dss.install(spark)

print("datasketches_spark_spark functions installed "
      "(e.g. spark.sql('SELECT approx_count_distinct_ex(c) FROM t')); "
      "dss.sql(spark, ...) gives sketch aggregates two-phase physics.")
