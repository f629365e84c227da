"""Differential correctness: every registered query with an oracle is run
through Spark AND DuckDB on the same parquet and compared — the local twin
of the driver's t2 gate."""

from __future__ import annotations

import pytest

from sqlite_to_clickhouse_spark.registry import all_queries
from tests.utils import assert_df_matches_oracle

_QUERIES = all_queries()
_WITH_ORACLE = sorted(n for n, q in _QUERIES.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in _QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_match(spark, duck, sf_dir, name):
    q = _QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert_df_matches_oracle(df, duck, q.oracle, name=name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    q = _QUERIES[name]
    df = q.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.columns  # stable, non-empty schema


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # queries()/oracle_sql() keys line up
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
