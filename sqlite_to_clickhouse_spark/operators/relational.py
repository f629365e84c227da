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


@register(
    "query_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS o_key,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_key
    LIMIT 10
    """,
    tags=("relational", "tpch"),
)
def query_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers × date-bounded orders ×
    lineitem, revenue per order, top 10. The customer/orders filters push
    to their scans; customer broadcasts into orders; only the
    orders⨝lineitem join and the per-order aggregate shuffle. Ties broken
    on the rounded revenue then o_key so both engines pick identical rows."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(li["l_orderkey"].alias("o_key"), o["o_orderdate"])
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("o_key", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_key")
        .limit(10)
    )


@register(
    "query_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
    tags=("relational", "tpch"),
)
def query_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the full dimension chain region→nation→supplier
    hung off lineitem. All three dims broadcast (they are tiny at any
    scale factor — region/nation are fixed-cardinality), so the fact table
    never shuffles for the joins; the only exchange is the final
    groupBy(n_name) on ~25 keys. This is the canonical star-join plan the
    100 TB design rule demands."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "query_part_margin",
    oracle="""
    SELECT p.p_brand,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - p.p_retailprice * l.l_quantity * 0.8), 2) AS margin,
           count(DISTINCT p.p_partkey) AS n_parts
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 10
    GROUP BY p.p_brand
    """,
    tags=("relational", "tpch"),
)
def query_part_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-dimension rollup (Q9-ish margin): lineitem ⨝ broadcast part
    with a dim-side filter (pushed to the part scan), per-brand margin +
    distinct part count. The distinct-count rides the same groupBy
    exchange via Spark's partial distinct aggregation."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") >= 10)
    margin = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.8
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(margin), 2).alias("margin"),
            F.countDistinct("p_partkey").alias("n_parts"),
        )
    )


_EXISTS_SQL = """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F')
"""


@register("filter_exists_subquery", oracle=_EXISTS_SQL, tags=("relational", "sql"))
def filter_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL entry point —
    Catalyst decorrelates both into a left-semi + left-anti join pair
    (never a per-row subquery execution), so the plan is two hash joins
    on c_custkey regardless of scale."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_EXISTS_SQL)


_NOT_IN_SQL = """
    WITH debtors AS (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    ),
    debtors_poisoned AS (
        SELECT CASE WHEN s_acctbal < 0 THEN s_suppkey END AS s_suppkey
        FROM supplier
    )
    SELECT 'null_free' AS variant, CAST(COUNT(*) AS BIGINT) AS n_suppliers
    FROM supplier
    WHERE s_suppkey NOT IN (SELECT s_suppkey FROM debtors)
    UNION ALL
    SELECT 'with_null' AS variant, CAST(COUNT(*) AS BIGINT) AS n_suppliers
    FROM supplier
    WHERE s_suppkey NOT IN (SELECT s_suppkey FROM debtors_poisoned)
"""


@register("filter_not_in_null_aware", oracle=_NOT_IN_SQL, tags=("relational", "sql"))
def filter_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with ANSI three-valued NULL semantics, certified on both
    branches in one result: against the NULL-free debtor list it returns
    the real non-debtor count; against the same list with NULLs injected
    it returns 0 — ONE NULL in a NOT-IN list makes every non-matching
    comparison UNKNOWN and silently empties the result, the classic
    production incident. Spark plans this as a null-aware anti join
    (a broadcast nested-loop, NOT a hash anti join — the NULL check
    defeats hashing), which is also the 100 TB lesson the op pins: a
    NOT-IN subquery must be broadcast-small, and when the key is known
    non-NULL, NOT EXISTS (plain hash anti join, see
    filter_exists_subquery) is the scalable form.
    """
    table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_NOT_IN_SQL)


_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice
             FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             LIMIT 2) t
"""


@register("join_lateral", oracle=_LATERAL_SQL, tags=("relational", "sql"))
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY … LIMIT (top-2
    orders per customer). Catalyst decorrelates the limit into a rank
    window over the join — same plan family as topk_per_group — instead
    of executing the subquery per customer row."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SQL)


@register(
    "query_market_share",
    oracle="""
    WITH rev AS (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                   AS cents,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN orders   o  ON l.l_orderkey  = o.o_orderkey
        JOIN part     p  ON l.l_partkey   = p.p_partkey
        JOIN supplier s  ON l.l_suppkey   = s.s_suppkey
        JOIN nation   n1 ON s.s_nationkey = n1.n_nationkey
        JOIN customer c  ON o.o_custkey   = c.c_custkey
        JOIN nation   n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region   r  ON n2.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA' AND p.p_size <= 25
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents
                               ELSE 0 END) AS DOUBLE) / sum(cents), 6)
               AS mkt_share,
           count(*) AS n_lines
    FROM rev
    GROUP BY o_year
    """,
    tags=("relational", "tpch"),
)
def query_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's part-filtered
    revenue per order year. Plan: lineitem⨝orders is the fact-fact
    shuffle; nation and region are force-broadcast (fixed cardinality 25
    and 5 at ANY scale factor), while part/supplier/customer — which
    GROW with SF and would OOM a forced broadcast at 100 TB — are left to
    the planner: AQE broadcasts them at small SF and falls back to
    shuffle joins when their post-filter stats exceed the threshold.
    Revenue is floored to integer cents per row before summing — the
    share is then a ratio of exact integers, so the division is
    bit-identical across engines (a float-sum share would be knife-edge
    at round()'s half-way points)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    c = table(spark, sf_dir, "customer")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            cents.alias("cents"),
            "supp_nation",
        )
    )
    share = (
        F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("cents")).otherwise(0))
        .cast("double")
        / F.sum("cents")
    )
    return joined.groupBy("o_year").agg(
        F.round(share, 6).alias("mkt_share"),
        F.count("*").alias("n_lines"),
    )


@register(
    "query_returned_items",
    oracle="""
    WITH per_cust AS (
        SELECT o.o_custkey,
               CAST(sum(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
                             AS BIGINT)) AS DOUBLE) / 100 AS revenue,
               count(*) AS n_lines
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R'
        GROUP BY o.o_custkey
    )
    SELECT p.o_custkey AS c_custkey, c.c_name, c.c_mktsegment,
           p.revenue, p.n_lines
    FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey
    ORDER BY p.revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("relational", "tpch"),
)
def query_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top customers by revenue lost to returns.

    Aggregate-before-join: lineitem(filtered R)⨝orders reduces to one row
    per customer BEFORE touching the customer dimension, so the customer
    join moves |customers| rows, not |lineitems| — the order of agg vs
    join is the difference between shuffling 100 TB and shuffling the
    (much smaller) key space. Revenue sums integer cents (exact), and the
    final top-20 is TakeOrderedAndProject with ties broken on c_custkey
    so both engines pick identical rows."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    per_cust = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            (F.sum(cents).cast("double") / 100).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )
    return (
        per_cust.join(c, per_cust["o_custkey"] == c["c_custkey"])
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "c_name",
            "c_mktsegment",
            "revenue",
            "n_lines",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "query_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS DOUBLE) / 100 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("relational", "tpch"),
)
def query_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarter revenue per supplier, keep the max. The
    scalar subquery (SELECT max(...)) compiles to a one-row broadcast
    joined as a filter — the revenue aggregate is computed ONCE and
    reused for both the ranking and the max (spark.sql sees the shared
    CTE; cache() would pin it explicitly if the optimizer re-expanded
    it). Revenue sums integer cents so the max-equality compare is exact
    — a float-sum tie at the top would be engine-dependent."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                                 AS BIGINT)) AS DOUBLE) / 100 AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        """
    )


@register(
    "query_large_volume_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(sum(l.l_quantity) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    """,
    tags=("relational", "tpch"),
)
def query_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers holding unusually large orders. The IN
    (GROUP BY … HAVING) subquery decorrelates to a left-semi join against
    the qualifying-order aggregate; quantity sums are exact (fixture
    quantities are integral doubles ≤ 50 with ≤ 7 lines per order, so
    the double sum is exact and engine-identical). Aggregate-then-join
    ordering: the HAVING filter reduces the semi-join side to the few
    hot orders BEFORE the three-way join fans out."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .join(li, F.col("o_orderkey") == li["l_orderkey"])
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
    )


@register(
    "query_promo_revenue",
    oracle="""
    SELECT CAST(month(l.l_shipdate) AS INTEGER) AS ship_month,
           round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
    tags=("relational", "tpch"),
)
def query_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share as a conditional-aggregate
    ratio, per ship month. lineitem ⨝ broadcast part; both sums ride ONE
    exchange on ship_month (the CASE is a projection, not a second
    aggregation pass), and the year filter is pushed to the parquet scan
    so only ~1/6 of the fact rows are read."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", net).otherwise(F.lit(0.0)))
                / F.sum(net),
                4,
            ).alias("promo_pct"),
            F.round(F.sum(net), 2).alias("revenue"),
        )
    )


@register(
    "query_small_qty_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
    tags=("relational", "tpch"),
)
def query_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from unusually small-quantity orders of one
    brand's parts. The oracle keeps the classic correlated scalar subquery;
    the Spark plan is the decorrelated form you'd hand-write at 100 TB:
    prune lineitem to the brand's parts FIRST (broadcast join — the brand
    is ~1/25 of part), compute the per-part 0.2·avg(quantity) threshold
    over that pruned slice (identical semantics: the correlation key is
    p_partkey, so per-part averages are unaffected by the brand filter),
    then one hash join of the slice against its own per-part aggregate.
    Two scans of the pruned slice beat a per-row subquery by orders of
    magnitude, and nothing touches the 96 % of lineitem outside the
    brand."""
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li = table(spark, sf_dir, "lineitem")
    li_b = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    qlim = li_b.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_limit")
    )
    return (
        li_b.join(qlim, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "query_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    tags=("relational", "tpch"),
)
def query_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a disjunction of brand/size/quantity
    conjunctions. The whole OR stays ONE codegen'd post-join filter; the
    common subexpressions Catalyst can factor out (p_size >= 1, quantity
    bounds 1..30) are derivable, and the brand IN-list implied by the OR
    prunes the broadcast side. No union-of-three-joins rewrite needed —
    that tripling of the fact scan is exactly what a 100 TB plan must
    avoid."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#7") & s.between(1, 35) & q.between(20, 30))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "query_dormant_customers",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_cust,
           round(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    GROUP BY c.c_mktsegment
    """,
    tags=("relational", "tpch"),
)
def query_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no very large (>400k) orders —
    uncorrelated scalar subquery (global positive-balance average) +
    anti join, per segment. The scalar average is a 1-row aggregate
    broadcast into the filter (NOT collected to the driver: crossJoin of
    a broadcast single row keeps it in-plan); the NOT EXISTS is a
    left-anti hash join against orders pre-filtered to >400k, which at
    100 TB shrinks the build side to the rare large orders before the
    join."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )
