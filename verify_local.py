#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, column names, and order-insensitive values (columns sorted by
name, rows sorted by string repr — approximating the driver's value-hash).

Usage: python verify_local.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

import __spark_entry__ as entrymod
from datasketches_spark_spark.sources import TABLE_NAMES, session_builder


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    data = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return cols_sorted, data


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (session_builder(master="local[8]", shuffle_partitions=8)
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:200]}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows-only {name}: {len(srows)} rows (no oracle)")
            continue
        # The driver canonicalizes via pandas sort_values over all columns,
        # which cannot factorize list/map/struct cells (CORRECTNESS_r03
        # q32/q33/q35 err) — fail loudly here on any nested result type.
        nested = [f.name for f in sdf.schema.fields
                  if f.dataType.typeName() in ("array", "map", "struct")]
        if nested:
            print(f"FAIL {name}: nested result columns {nested} would break "
                  "the driver's pandas canonicalizer — flatten them")
            n_fail += 1
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        sc, sv = _normalize(scols, srows)
        oc, ov = _normalize(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: column mismatch spark={sc} oracle={oc}")
            n_fail += 1
        elif len(sv) != len(ov):
            print(f"FAIL {name}: row count spark={len(sv)} oracle={len(ov)}")
            n_fail += 1
        elif sv != ov:
            diffs = [(a, b) for a, b in zip(sv, ov) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sv)} rows, cols={sc}")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
