"""Scan / filter / project operators (SURVEY.md §2b: sources, projection).

Engine analogs of reference R3 (full scan), R5-R8 (cast battery as a
projection). Everything here is a declarative DataFrame plan: filters and
column selections reach the parquet scan as PushedFilters/ReadSchema —
at 100 TB that is the difference between scanning 100 TB and scanning the
few columns × row-groups the query touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlite_to_clickhouse_spark.io import table
from sqlite_to_clickhouse_spark.registry import register
from sqlite_to_clickhouse_spark.typemap import cast_expr


@register(
    "scan_parquet",
    oracle="SELECT * FROM lineitem",
    tags=("source",),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar file scan with embedded schema (reference R3 analog)."""
    return table(spark, sf_dir, "lineitem")


@register(
    "project_cast_typemap",
    oracle="""
    SELECT
        event_id,
        COALESCE(TRY_CAST(user_id AS BIGINT), 0)   AS i64,
        COALESCE(TRY_CAST(value AS DOUBLE), 0.0)   AS f64,
        CAST(event_type AS VARCHAR)                AS s,
        TRY_CAST(strptime(split_part(CAST(ts AS VARCHAR), '.', 1),
                          '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS t,
        TRY_CAST(CAST(ts AS DATE) AS DATE)         AS d
    FROM events
    """,
    tags=("projection", "typemap"),
)
def project_cast_typemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §1.2 cast battery (reference R5-R8) as one columnar projection.

    Exercises every live branch of the reference's prepare_row
    (main.py:81-104): int-with-null-default, float-with-null-default,
    string cast, fractional-second-stripping datetime parse, date cast.
    """
    ev = table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        cast_expr(F.col("user_id"), T.LongType()).alias("i64"),
        cast_expr(F.col("value"), T.DoubleType()).alias("f64"),
        cast_expr(F.col("event_type"), T.StringType()).alias("s"),
        # DATETIME branch: stringified ts → strip fractional secs → parse
        F.try_to_timestamp(
            F.split(F.col("ts").cast("string"), r"\.").getItem(0),
            F.lit("yyyy-MM-dd HH:mm:ss"),
        ).alias("t"),
        F.col("ts").try_cast("date").alias("d"),
    )


@register(
    "filter_predicate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           l_returnflag, l_shipdate
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 40
      AND l_returnflag IN ('A', 'R')
      AND l_linestatus LIKE 'F%'
      AND l_shipdate IS NOT NULL
      AND (l_discount < 0.05 OR l_tax >= 0.04)
    """,
    tags=("filter",),
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates, BETWEEN, IN, LIKE, IS NULL.

    All predicates are Column expressions, so Catalyst pushes them into the
    parquet scan (PushedFilters) — nothing is evaluated Python-side.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 40)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_linestatus").like("F%")
        & F.col("l_shipdate").isNotNull()
        & ((F.col("l_discount") < 0.05) | (F.col("l_tax") >= 0.04))
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        "l_shipdate",
    )


@register(
    "project_computed",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_extendedprice * (1 - l_discount) * 10000) / 10000 AS disc_price,
           FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000) / 10000 AS charge,
           CAST(FLOOR(l_quantity * 100) AS BIGINT)                   AS qty_centi
    FROM lineitem
    """,
    tags=("projection",),
)
def project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic expression columns (SURVEY §2b project_computed).

    Per-row double outputs are quantized with FLOOR(x*10^k)/10^k rather
    than round(): the raw IEEE products are bit-identical across engines,
    so flooring the same double is deterministic, while round() semantics
    differ at half-way boundaries (Spark HALF_UP vs DuckDB).
    """
    li = table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(disc * 10000) / 10000).alias("disc_price"),
        (F.floor(disc * (1 + F.col("l_tax")) * 10000) / 10000).alias("charge"),
        F.floor(F.col("l_quantity") * 100).cast("long").alias("qty_centi"),
    )


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 6)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 6)                                   AS avg_price,
           ROUND(AVG(l_discount), 6)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("flagship", "aggregate"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query: TPC-H-Q1-style pricing summary (SURVEY §7 step 1).

    filter → columnar arithmetic → hash aggregate (partial+final map-side
    combine, free from Catalyst) → sort. The filter and the 7-column
    projection push into the parquet scan; the groupBy key cardinality is
    tiny (≤6 groups) so the shuffle moves only partial aggregates —
    exactly the shape that survives a 100 TB fact table.
    """
    li = table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
