"""Sort / limit / top-k / set operators (SURVEY.md §2b: sort & set ops).

Top-k never materializes a global sort: Catalyst plans ORDER BY + LIMIT k
as TakeOrderedAndProject (per-partition heap of k, merge of partials), so
a top-100 over 100 TB moves 100 rows per partition, not the table.

LIMIT/OFFSET and top-k results are order-dependent, so every such query
here makes the selected SET of rows deterministic via unique-key
tie-breaks — otherwise the driver's order-insensitive hash would still
see different row sets on each engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqlite_to_clickhouse_spark.io import table
from sqlite_to_clickhouse_spark.registry import register


@register(
    "sort_multi",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal
    FROM customer
    ORDER BY c_nationkey ASC, c_acctbal DESC NULLS LAST, c_custkey ASC
    """,
    tags=("sort",),
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit nulls placement.

    Physically a range-partitioned sort (sampling → range exchange →
    per-partition sort) — the classic distributed sort; no single node
    ever holds the whole table.
    """
    c = table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_name", "c_nationkey", "c_acctbal").orderBy(
        F.asc("c_nationkey"), F.desc_nulls_last("c_acctbal"), F.asc("c_custkey")
    )


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50 OFFSET 100
    """,
    tags=("sort",),
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET over a deterministic total order (unique tiebreak)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(100)
        .limit(50)
    )


@register(
    "topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "topk"),
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: planned as TakeOrderedAndProject (no full sort)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal
    FROM (SELECT c_nationkey, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer)
    WHERE rn <= 3
    """,
    tags=("sort", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation: rank window + filter.

    One shuffle on the group key; the rank filter applies during the
    per-partition sort scan, so memory stays bounded per group.
    """
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


def _order_halves(spark: SparkSession, sf_dir: str):
    """Two overlapping slices of orders used by the set-op queries."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    a = o.filter(F.col("o_orderkey") % 3 != 0)
    b = o.filter(F.col("o_orderkey") % 2 != 0)
    return a, b


_HALVES_SQL_A = "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 <> 0"
_HALVES_SQL_B = "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 <> 0"


@register(
    "set_union_all",
    oracle=f"{_HALVES_SQL_A} UNION ALL {_HALVES_SQL_B}",
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union: pure concatenation, no shuffle at all."""
    a, b = _order_halves(spark, sf_dir)
    return a.unionAll(b)


@register(
    "set_union_distinct",
    oracle=f"{_HALVES_SQL_A} UNION {_HALVES_SQL_B}",
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union: concat + hash-distinct (one shuffle on all columns)."""
    a, b = _order_halves(spark, sf_dir)
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle=f"{_HALVES_SQL_A} INTERSECT {_HALVES_SQL_B}",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (distinct semantics) — left-semi under the hood."""
    a, b = _order_halves(spark, sf_dir)
    return a.intersect(b)


@register(
    "set_except",
    oracle=f"{_HALVES_SQL_A} EXCEPT {_HALVES_SQL_B}",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (distinct semantics) — left-anti under the hood."""
    a, b = _order_halves(spark, sf_dir)
    return a.subtract(b)


@register(
    "set_except_all",
    oracle=f"{_HALVES_SQL_A} EXCEPT ALL {_HALVES_SQL_B}",
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (multiplicity-aware EXCEPT ALL): each row survives
    max(0, count_left - count_right) times. Physically a count-compare per
    group, not a row-wise anti join — duplicates matter."""
    a, b = _order_halves(spark, sf_dir)
    return a.exceptAll(b)


_DUP_SQL_A = (
    "SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_orderkey % 3 <> 0"
)
_DUP_SQL_B = (
    "SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_orderkey % 2 <> 0"
)


@register(
    "set_intersect_all",
    oracle=f"{_DUP_SQL_A} INTERSECT ALL {_DUP_SQL_B}",
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (multiplicity-aware INTERSECT ALL): each row
    survives min(count_left, count_right) times. Defined over a lineitem
    (suppkey, returnflag) projection — NOT the unique-keyed orders halves
    the other set ops share — so per-row multiplicities are genuinely >1
    and the multiset semantics are exercised non-vacuously. Physically
    one hash shuffle per side on all columns + a count-min per group
    (Spark plans intersectAll as a grouped count compare, not an n×m
    join), so wire volume is O(distinct rows), fine at 100 TB."""
    li = table(spark, sf_dir, "lineitem")
    proj = ["l_suppkey", "l_returnflag"]
    a = li.filter(F.col("l_orderkey") % 3 != 0).select(*proj)
    b = li.filter(F.col("l_orderkey") % 2 != 0).select(*proj)
    return a.intersectAll(b)
