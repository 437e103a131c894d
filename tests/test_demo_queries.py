"""The five demo queries (redundant-coverage variants outside the
driver's 50-slot correctness window — ``__spark_entry__.demo_queries``)
verified with the driver's own compare: row count, sorted column names,
order-insensitive normalized values vs the DuckDB oracle."""

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod
from verify_local import _normalize

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    from datasketches_spark_spark.sources import TABLE_NAMES
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", list(entrymod.demo_queries()))
def test_demo_query_matches_oracle(spark, duck, name):
    import datasketches_spark_spark as dss
    dss.install(spark)
    fn = entrymod.demo_queries()[name]
    sdf = fn(spark, SF_DIR)
    nested = [f.name for f in sdf.schema.fields
              if f.dataType.typeName() in ("array", "map", "struct")]
    assert not nested, f"nested result columns {nested}"
    res = duck.execute(entrymod.demo_oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    sc, sv = _normalize(sdf.columns, sdf.collect())
    oc, ov = _normalize(ocols, orows)
    assert sc == oc
    assert len(sv) == len(ov)
    assert sv == ov
