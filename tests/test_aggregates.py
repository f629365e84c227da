"""Semantics tests for aggregates that the DuckDB oracle cannot check
exactly (approximate sketches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlite_to_clickhouse_spark.io import table
from sqlite_to_clickhouse_spark.registry import all_queries

_Q = all_queries()


def test_approx_distinct_within_rsd(spark, sf_dir):
    """approx_count_distinct(rsd=0.02) must land within a conservative 5×
    multiple of the configured relative error of the exact count, per
    group (HLL guarantees ~rsd std-dev; 10% absolute bound at rsd=2%)."""
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in _Q["agg_approx_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["exact_parts"]
        for r in table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact_parts"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, est in approx.items():
        rel_err = abs(est - exact[flag]) / exact[flag]
        assert rel_err < 0.10, (flag, est, exact[flag], rel_err)


def test_approx_percentile_error_bound(spark, sf_dir):
    # The sketch's p50/p95 must land within 0.5% rank error of the exact
    # interpolated percentile (accuracy=10000 bounds rank error at 1e-4;
    # 0.5% leaves slack for value-space gaps between ranks).
    from sqlite_to_clickhouse_spark.registry import all_queries

    approx = {
        r["l_returnflag"]: (r["ap50"], r["ap95"])
        for r in all_queries()["agg_approx_percentile"].fn(spark, sf_dir).collect()
    }
    from sqlite_to_clickhouse_spark.io import table
    from pyspark.sql import functions as F

    exact = {
        r["l_returnflag"]: (r["p50"], r["p95"])
        for r in table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        )
        .collect()
    }
    for flag, (a50, a95) in approx.items():
        e50, e95 = exact[flag]
        assert abs(a50 - e50) / e50 < 0.005, (flag, a50, e50)
        assert abs(a95 - e95) / e95 < 0.005, (flag, a95, e95)
