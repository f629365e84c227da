"""Unit + property tests for the typemap (SURVEY.md §5 items 3 and 6):
the only reference-normative code, asserted branch by branch against the
documented prepare_row / parse_datetime / parse_date semantics
(/root/reference/main.py:81-104, 18-37, 39-54) and fuzzed with hypothesis
for parser totality and scalar/columnar agreement."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlite_to_clickhouse_spark.typemap import (
    cast_expr,
    decl_type_to_spark,
    infer_clickhouse_type,
    parse_date,
    parse_datetime,
    unsigned_wraparound,
)


# --- declared-type map (main.py:125-134) -----------------------------------


@pytest.mark.parametrize(
    "decl,expected",
    [
        ("INTEGER", T.LongType()),
        ("int", T.LongType()),
        ("varchar(255)", T.StringType()),
        ("TEXT", T.StringType()),
        ("REAL", T.DoubleType()),
        ("FLOAT", T.DoubleType()),
        ("DATETIME", T.TimestampType()),
        ("DATE", T.DateType()),
        ("BLOB", T.StringType()),     # unmapped → String (main.py:134)
        ("BOOLEAN", T.StringType()),  # unmapped → String, per golden log
        ("", T.StringType()),
        (None, T.StringType()),
    ],
)
def test_decl_type_map(decl, expected):
    assert decl_type_to_spark(decl) == expected


# --- value-based inference, dead code in the reference (main.py:39-54) -----


@pytest.mark.parametrize(
    "value,expected",
    [
        (True, "Boolean"),
        (-5, "Int32"),
        (7, "UInt32"),
        (2**32 - 1, "UInt32"),
        (2**32, "UInt64"),
        (1.5, "Float64"),
        ("x", "String"),
        (None, "String"),
    ],
)
def test_value_based_inference(value, expected):
    assert infer_clickhouse_type(value) == expected


def test_unsigned_wraparound_masks():
    assert unsigned_wraparound(-1, "UInt32") == 2**32 - 1
    assert unsigned_wraparound(-1, "UInt64") == 2**64 - 1
    assert unsigned_wraparound(42, "Int32") == 42


# --- scalar parsers (main.py:18-37) ----------------------------------------


def test_parse_datetime_strips_fractional_seconds():
    assert parse_datetime("2024-07-25 15:04:42.993146") == dt.datetime(
        2024, 7, 25, 15, 4, 42
    )


@given(st.text(max_size=30))
@settings(max_examples=200, deadline=None)
def test_parsers_total_on_arbitrary_text(s):
    """Reference behavior: unparseable → NULL + warn, never raise."""
    r = parse_datetime(s)
    assert r is None or isinstance(r, dt.datetime)
    r = parse_date(s)
    assert r is None or isinstance(r, dt.date)


@given(
    st.datetimes(
        min_value=dt.datetime(1900, 1, 1),
        max_value=dt.datetime(2100, 1, 1),
    )
)
@settings(max_examples=100, deadline=None)
def test_parse_datetime_roundtrip(d):
    assert parse_datetime(d.strftime("%Y-%m-%d %H:%M:%S")) == d.replace(microsecond=0)


# --- columnar cast battery agrees with the scalar twins --------------------


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.dates(dt.date(1, 1, 1), dt.date(9999, 12, 28)).map(
                lambda d: d.strftime("%Y-%m-%d %H:%M:%S")
            ),
            st.text(
                alphabet="0123456789-: .absz", max_size=24
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_columnar_datetime_matches_scalar(spark_hyp, values):
    """cast_expr's DATETIME branch must agree with parse_datetime on every
    input — the columnar rewrite is only valid if it is extensionally the
    reference's function."""
    spark = spark_hyp
    df = spark.createDataFrame([(v,) for v in values], "s: string")
    got = [
        r["t"]
        for r in df.select(
            cast_expr(F.col("s"), T.TimestampType()).alias("t")
        ).collect()
    ]
    want = [parse_datetime(v) for v in values]
    assert got == want


@pytest.fixture(scope="session")
def spark_hyp(spark):
    """Session-scoped alias so hypothesis examples reuse one SparkSession."""
    return spark
