"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_align():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) >= 40
    assert set(o) <= set(q)
    # the vast majority must be oracle-checked, not rows-only
    assert len(o) >= 0.8 * len(q)


def test_all_queries_return_dataframes(spark, sf_dir):
    # spot-check a few across families (full sweep is test_oracle_parity)
    for name in ("q_claims_summary", "q_tpch_q1", "q_knn_bruteforce"):
        df = entrymod.queries()[name](spark, sf_dir)
        assert df.columns
