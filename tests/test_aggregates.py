"""Semantics tests for the approximate-sketch aggregates.

These ops render their error bound AS the gate result (boolean in-band
columns the DuckDB oracle asserts TRUE — see the op docstrings), so the
raw-estimate accuracy is additionally asserted here against independently
computed exact values."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlite_to_clickhouse_spark.io import table
from sqlite_to_clickhouse_spark.registry import all_queries

_Q = all_queries()


def test_approx_distinct_within_rsd(spark, sf_dir):
    """approx_count_distinct(rsd=0.02) must land within a conservative 5×
    multiple of the configured relative error of the exact count, per
    group (HLL guarantees ~rsd std-dev; 10% absolute bound at rsd=2%) —
    the same bound the op itself emits as ``hll_within_5rsd``."""
    rows = _Q["agg_approx_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["hll_within_5rsd"] is True, (r["l_returnflag"], r.asDict())
    # Independent recomputation of the raw estimate vs exact:
    li = table(spark, sf_dir, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    for r in both.collect():
        rel_err = abs(r["approx_parts"] - r["exact_parts"]) / r["exact_parts"]
        assert rel_err < 0.10, (r["l_returnflag"], r.asDict(), rel_err)


def test_approx_percentile_error_bound(spark, sf_dir):
    # The op's own band columns must hold, and the raw sketch p50/p95 must
    # land within 0.5% of the exact interpolated percentile
    # (accuracy=10000 bounds rank error at 1e-4; 0.5% leaves slack for
    # value-space gaps between ranks).
    rows = _Q["agg_approx_percentile"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p50_in_rank_band"] is True, r.asDict()
        assert r["p95_in_rank_band"] is True, r.asDict()

    li = table(spark, sf_dir, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("ap50"),
        F.approx_percentile("l_extendedprice", F.lit(0.95), F.lit(10000)).alias("ap95"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    )
    for r in both.collect():
        assert abs(r["ap50"] - r["p50"]) / r["p50"] < 0.005, r.asDict()
        assert abs(r["ap95"] - r["p95"]) / r["p95"] < 0.005, r.asDict()
