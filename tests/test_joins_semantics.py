"""Semantics tests for round-5 join operators beyond the DuckDB oracle:
the bucketed interval-overlap plan must equal the direct theta join, and
the ANY-join pick must be deterministic across runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlite_to_clickhouse_spark.io import table
from sqlite_to_clickhouse_spark.registry import all_queries

_Q = all_queries()


def test_interval_overlap_equals_theta_join(spark, sf_dir):
    """The 7-day-cell bucketing is an optimization, not a semantics
    change: pairs and overlap lengths must match the naive theta join
    exactly (including intervals spanning several cells)."""
    got = {
        (r.a_key, r.b_key): r.overlap_days
        for r in _Q["join_interval_overlap"].fn(spark, sf_dir).collect()
    }
    o = table(spark, sf_dir, "orders")
    h1 = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    d0 = F.col("o_orderdate").cast("date")
    a = o.filter(h1 == "0").select(
        F.col("o_orderkey").alias("a_key"),
        d0.alias("a_start"),
        F.date_add(d0, (F.col("o_orderkey") % 20 + 1).cast("int")).alias("a_end"),
    )
    b = o.filter(h1 == "f").select(
        F.col("o_orderkey").alias("b_key"),
        F.date_add(d0, 5).alias("b_start"),
        F.date_add(d0, 12).alias("b_end"),
    )
    theta = a.join(
        b,
        (F.col("a_start") <= F.col("b_end"))
        & (F.col("b_start") <= F.col("a_end")),
    ).select(
        "a_key",
        "b_key",
        (
            F.datediff(
                F.least("a_end", "b_end"), F.greatest("a_start", "b_start")
            )
            + 1
        )
        .cast("long")
        .alias("overlap_days"),
    )
    want = {(r.a_key, r.b_key): r.overlap_days for r in theta.collect()}
    assert got == want
    assert want, "fixture produced no overlapping pairs — test is vacuous"


def test_any_left_join_is_deterministic_and_unique(spark, sf_dir):
    """ANY LEFT JOIN: exactly one output row per left row, the SAME
    matched row on repeated evaluation, and the pick is the true minimum
    (o_orderdate, o_orderkey) per customer."""
    df = _Q["join_any_left"].fn(spark, sf_dir)
    rows1 = {r.c_custkey: (r.first_orderkey, r.first_orderdate) for r in df.collect()}
    rows2 = {
        r.c_custkey: (r.first_orderkey, r.first_orderdate)
        for r in _Q["join_any_left"].fn(spark, sf_dir).collect()
    }
    assert rows1 == rows2  # deterministic pick
    n_cust = table(spark, sf_dir, "customer").count()
    assert len(rows1) == n_cust  # one row per left row, none dropped
    o = table(spark, sf_dir, "orders")
    w_first = (
        o.groupBy("o_custkey")
        .agg(F.min(F.struct("o_orderdate", "o_orderkey")).alias("f"))
        .select("o_custkey", "f.o_orderkey", "f.o_orderdate")
    )
    want = {r.o_custkey: (r.o_orderkey, r.o_orderdate) for r in w_first.collect()}
    for ck, pick in rows1.items():
        if pick[0] is None:
            assert ck not in want  # customers with no orders stay null
        else:
            assert want[ck] == pick
