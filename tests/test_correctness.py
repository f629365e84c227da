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


def test_entry_pins_utc(spark):
    """The driver owns the SparkSession; every contract callable must
    force the session timezone to UTC (and the entry module pins the
    process TZ) so collected timestamps match the naive-UTC oracle on
    ANY host — see the round-5 America/New_York drive in SURVEY §6.4."""
    import os
    import __spark_entry__ as e

    assert os.environ.get("TZ") == "UTC"
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        next(iter(e.queries().values()))(spark, "/root/testdata/sf0.001")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
