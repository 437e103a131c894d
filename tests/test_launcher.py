"""bin/pyspark launcher: the interactive entry point must come up with the
engine's SQL functions already installed (reference entry-point parity,
``/root/reference/bin/python:45-72`` + ``bin/.startup.py:23-28``)."""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_launcher_runs_sketch_sql():
    script = ('spark.sql("SELECT approx_count_distinct_ex(id) AS ndv '
              'FROM range(100)").show()\n')
    env = dict(os.environ)
    env.pop("PYTHONSTARTUP", None)
    out = subprocess.run(
        [os.path.join(REPO, "bin", "pyspark"),
         "--master", "local[2]", "--conf", "spark.ui.enabled=false"],
        input=script, text=True, capture_output=True, env=env, timeout=300)
    assert "functions installed" in out.stdout, out.stderr[-2000:]
    assert "|100|" in out.stdout, out.stdout[-2000:]
    assert "NameError" not in out.stdout + out.stderr
