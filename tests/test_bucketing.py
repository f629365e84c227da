"""Bucketed co-located join (SURVEY.md §4: "bucketing for co-located
joins"): bucket lineitem and orders on the join key, then prove the join
plan has NO shuffle on either side and the result matches the plain join."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from sqlite_to_clickhouse_spark.io import table
from sqlite_to_clickhouse_spark.sources.sinks import write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(o, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    yield
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_is_shuffle_free(spark, sf_dir, bucketed):
    # Disable broadcast so the co-location is what avoids the shuffle,
    # not a broadcast of the small fixture side.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bl, bo = spark.table("b_lineitem"), spark.table("b_orders")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount: 8 out of 8" in plan

        got = joined.count()
        want = (
            table(spark, sf_dir, "lineitem")
            .join(
                table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_coloc_cold_catalog_registers_without_rewrite(spark, sf_dir):
    """A session whose catalog lacks the coloc tables but whose on-disk
    generation is valid (a fresh process after another session built the
    cache) must REGISTER the existing immutable generation — never write
    a new one (the files may be mid-scan in the builder session, the
    cross-session race from ADVICE r6/r7). Pins: files untouched, same
    generation dir resolved, results identical, and the registered-table
    plan still exchange-free with bucket pruning metadata."""
    import contextlib
    import glob
    import io as _io
    import os

    from sqlite_to_clickhouse_spark.io import cache_base, read_marker
    from sqlite_to_clickhouse_spark.registry import all_queries

    fn = all_queries()["join_bucketed_colocated"].fn
    first = {(r.o_orderkey, r.o_orderstatus): r.revenue_e4
             for r in fn(spark, sf_dir).collect()}

    base = cache_base("coloc", sf_dir)
    gen_name = read_marker(os.path.join(base, "CURRENT"))
    assert gen_name, "expected a CURRENT generation pointer"
    gen = os.path.join(base, gen_name)
    stamp = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(gen, "*", "*.parquet"))
    }
    assert stamp, "expected an on-disk bucketed layout"

    # Simulate the fresh process: cold catalog, valid generation on disk.
    gtag = gen_name[4:]
    spark.sql(f"DROP TABLE IF EXISTS coloc_orders_{gtag}")
    spark.sql(f"DROP TABLE IF EXISTS coloc_lineitem_{gtag}")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = fn(spark, sf_dir)
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # With broadcast off, the registered external bucketed tables must
        # still give the exchange-free co-located SMJ — proof the DDL
        # registration carried the bucket spec.
        assert "Exchange" not in plan, plan
        again = {
            (r.o_orderkey, r.o_orderstatus): r.revenue_e4 for r in df.collect()
        }
        assert again == first
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    after = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(gen, "*", "*.parquet"))
    }
    assert after == stamp, "register-only path rewrote the shared layout"
    assert read_marker(os.path.join(base, "CURRENT")) == gen_name, (
        "register-only path swung CURRENT to a new generation"
    )
