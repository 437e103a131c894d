"""Smoke the accuracy-report harness at small scale so the parity
artifact cannot rot (full scale runs standalone: python accuracy_report.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_accuracy_report_small_scale(spark, capsys):
    import accuracy_report
    rc = accuracy_report.main(spark=spark, rows=30_000)
    out = capsys.readouterr().out
    assert rc == 0, out
    assert '"experiment": "ndv"' in out
    assert '"failures": null' in out
