"""Property-based check of the sort-merge as-of join: on random small
inputs, the windowed union implementation must agree with the obvious
brute-force definition (for each left row, the right row with the greatest
time <= left time, ties broken by highest payload id)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F


def _asof_union_impl(spark, left_rows, right_rows):
    """The REAL library operator (operators.joins.asof_join) on generic
    data: left (k, t, lid), right (k, t, rid) → {lid: asof_rid}."""
    from sqlite_to_clickhouse_spark.operators.joins import asof_join

    left = spark.createDataFrame(left_rows, "k: long, t: long, lid: long")
    right = spark.createDataFrame(right_rows, "rk: long, rt: long, rid: long")
    out = asof_join(
        left,
        right,
        left_on="k",
        right_on="rk",
        left_time="t",
        right_time="rt",
        right_payload=["rid"],
        right_tiebreak="rid",
    )
    return {r["lid"]: r["asof_rid"] for r in out.collect()}


def _asof_brute(left_rows, right_rows):
    out = {}
    for k, t, lid in left_rows:
        cands = [(rt, rid) for rk, rt, rid in right_rows if rk == k and rt <= t]
        out[lid] = max(cands)[1] if cands else None
    return out


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=12
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=0, max_size=12
    ),
)
def test_asof_union_equals_brute_force(spark_session_holder, left, right):
    spark = spark_session_holder
    left_rows = [(k, t, i) for i, (k, t) in enumerate(left)]
    right_rows = [(k, t, 100 + i) for i, (k, t) in enumerate(right)]
    got = _asof_union_impl(spark, left_rows, right_rows)
    want = _asof_brute(left_rows, right_rows)
    assert got == want


@pytest.fixture(scope="session")
def spark_session_holder(spark):
    return spark
