"""Property-based check of the sort-merge as-of join: on random small
inputs with interleaved left/right times, the windowed union implementation
must agree with the obvious brute-force definition for every direction —

- backward: right row with the greatest time <= left time;
- forward:  right row with the smallest time >= left time;
- nearest:  whichever of those two is closer, ties to backward
  (pandas merge_asof semantics);

ties within equal right times always break to the highest payload id."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st


def _asof_union_impl(spark, left_rows, right_rows, direction):
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
        direction=direction,
    )
    return {r["lid"]: r["asof_rid"] for r in out.collect()}


def _pick_backward(cands, t):
    back = [(rt, rid) for rt, rid in cands if rt <= t]
    return max(back) if back else None  # greatest rt, then greatest rid


def _pick_forward(cands, t):
    fwd = [(rt, rid) for rt, rid in cands if rt >= t]
    if not fwd:
        return None
    min_rt = min(rt for rt, _ in fwd)
    return (min_rt, max(rid for rt, rid in fwd if rt == min_rt))


def _asof_brute(left_rows, right_rows, direction):
    out = {}
    for k, t, lid in left_rows:
        cands = [(rt, rid) for rk, rt, rid in right_rows if rk == k]
        b, f = _pick_backward(cands, t), _pick_forward(cands, t)
        if direction == "backward":
            hit = b
        elif direction == "forward":
            hit = f
        else:  # nearest, ties to backward
            if b is None:
                hit = f
            elif f is None:
                hit = b
            else:
                hit = b if (t - b[0]) <= (f[0] - t) else f
        out[lid] = hit[1] if hit else None
    return out


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=12
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=0, max_size=12
    ),
)
def test_asof_union_equals_brute_force(spark_session_holder, direction, left, right):
    spark = spark_session_holder
    left_rows = [(k, t, i) for i, (k, t) in enumerate(left)]
    right_rows = [(k, t, 100 + i) for i, (k, t) in enumerate(right)]
    got = _asof_union_impl(spark, left_rows, right_rows, direction)
    want = _asof_brute(left_rows, right_rows, direction)
    assert got == want


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tol", [0, 3, 7])
@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=10
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=0, max_size=10
    ),
)
def test_asof_tolerance_equals_brute_force(
    spark_session_holder, direction, tol, left, right
):
    """merge_asof(tolerance=...) semantics: the directional pick is kept
    only if its time distance is within tol, else NULL — for every
    direction, including tol=0 (exact-time matches only)."""
    from sqlite_to_clickhouse_spark.operators.joins import asof_join

    spark = spark_session_holder
    left_rows = [(k, t, i) for i, (k, t) in enumerate(left)]
    right_rows = [(k, t, 100 + i) for i, (k, t) in enumerate(right)]
    ldf = spark.createDataFrame(left_rows, "k: long, t: long, lid: long")
    rdf = spark.createDataFrame(right_rows, "rk: long, rt: long, rid: long")
    out = asof_join(
        ldf,
        rdf,
        left_on="k",
        right_on="rk",
        left_time="t",
        right_time="rt",
        right_payload=["rid"],
        right_tiebreak="rid",
        direction=direction,
        tolerance_us=tol * 1_000_000,  # long times cast to epoch-second ts
    )
    got = {r["lid"]: r["asof_rid"] for r in out.collect()}

    want = {}
    base = _asof_brute(left_rows, right_rows, direction)
    rt_by_rid = {rid: rt for _, rt, rid in right_rows}
    for k, t, lid in left_rows:
        rid = base[lid]
        if rid is not None and abs(t - rt_by_rid[rid]) > tol:
            rid = None
        want[lid] = rid
    assert got == want


@pytest.fixture(scope="session")
def spark_session_holder(spark):
    return spark
