"""Every oracle-declared query must match the DuckDB oracle at the test
scale factor — the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from lakeflow import registry
from tests.oracle_harness import compare, duck_connection

ORACLED = sorted(name for name, (_, sql) in registry.ALL_QUERIES.items() if sql)
ROWS_ONLY = sorted(name for name, (_, sql) in registry.ALL_QUERIES.items() if not sql)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, sf_dir, duck, name):
    fn, sql = registry.ALL_QUERIES[name]
    compare(fn(spark, sf_dir), duck, sql, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    fn, _ = registry.ALL_QUERIES[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0
