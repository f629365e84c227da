"""Differential correctness: every registered query with an oracle is run
through Spark AND DuckDB on the same parquet and compared — the local twin
of the driver's t2 gate."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark_heavy  # full-registry sweep module (see README: two-command split)

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


# The ⊘ ceiling (VERDICT r5 item 8): exactly these ops may register with
# oracle=None (rows-only driver checks).  sink_jdbc_clickhouse needs a live
# ClickHouse server; stream_watermark_late's late-drop is pinned by a
# 3-batch reverse-time feed in tests/test_streaming.py; embedding_pca_project
# is numpy-parity-pinned; text_compression_ratio depends on zlib output
# bytes.  Any other oracle-less registration is a regression.
_ALLOWED_ROWS_ONLY = {
    "sink_jdbc_clickhouse",
    "stream_watermark_late",
    "embedding_pca_project",
    "text_compression_ratio",
}


def test_rows_only_ceiling():
    assert set(_ROWS_ONLY) == _ALLOWED_ROWS_ONLY, (
        f"unexpected oracle=None registrations: "
        f"{sorted(set(_ROWS_ONLY) - _ALLOWED_ROWS_ONLY)} "
        f"(every new op needs a DuckDB oracle or a bound-as-result gate)"
    )


def test_ops_emit_scalar_columns_only(spark, sf_dir):
    """The driver's canonicalizer factorizes column values — a top-level
    array/map/struct column is unhashable there and reds the gate even
    when values match (embedding_normalize, r5; embedding_quantize_int8,
    caught pre-driver in r6; embedding_pca_project, driver red r6 because
    this audit skipped rows-only ops — the canonicalizer crashes on those
    too, nulling even the weak spark_rows check). EVERY registered op must
    emit scalar columns only; flatten (posexplode) or stringify
    (concat_ws) instead."""
    offenders = {}
    for name in (*_WITH_ORACLE, *_ROWS_ONLY):
        df = _QUERIES[name].fn(spark, sf_dir)
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.dataType.simpleString().startswith(("array", "map", "struct"))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"non-scalar output columns on registered ops: {offenders}"


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
