"""Aggregation operators (SURVEY.md §2b: aggregation).

The reference's only aggregate is a running row counter
(/root/reference/main.py:171-177, R12); everything else here is declared
ClickHouse-class surface. All aggregates are built-in Catalyst operators —
partial (map-side) + final aggregation is automatic, so the shuffle moves
pre-combined state, not rows. That property is what makes a groupBy over a
100 TB fact table feasible: shuffle volume is O(groups × partitions), not
O(rows).

Float determinism: IEEE sums depend on addition order, which differs
between engines and between Spark runs (partition order). Every double
aggregate is rounded on BOTH sides (Spark + DuckDB oracle) to a precision
coarse enough that order effects vanish at the tested scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqlite_to_clickhouse_spark.io import table
from sqlite_to_clickhouse_spark.registry import register


@register(
    "agg_global",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2)      AS sum_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price,
           COUNT(l_shipdate)              AS n_shipdates
    FROM lineitem
    """,
    tags=("aggregate",),
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless aggregate: SUM/AVG/MIN/MAX/COUNT collapse to one row.

    Physically: per-partition partials → single-partition final merge.
    Only the partial states cross the wire (a few hundred bytes each),
    so this scales to any input size.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.count("l_shipdate").alias("n_shipdates"),
    )


@register(
    "agg_groupby_hash",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_total,
           ROUND(AVG(o_totalprice), 4) AS avg_total
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
    tags=("aggregate",),
)
def agg_groupby_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key hash aggregate with map-side partial combine."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_total"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey)  AS n_parts,
           COUNT(DISTINCT l_suppkey)  AS n_supps,
           COUNT(*)                   AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT …): Catalyst expands to a two-stage dedup+count plan.

    At scale the expand+regroup keeps distinct-tracking distributed (no
    driver-side set); multiple distinct columns cost one Expand each.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           TRUE     AS hll_within_5rsd
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog count-distinct: constant memory per group at any scale.

    The 100 TB path: exact COUNT(DISTINCT) shuffles every distinct value;
    HLL shuffles a fixed-size sketch per partition. rsd=0.02 ⇒ ~2% error.

    Gate rendering: HLL sketches differ across engines, so the raw
    estimate can't hash-match a DuckDB value. Instead the op emits the
    documented error bound AS the result — ``hll_within_5rsd`` is true iff
    |approx − exact| ≤ 5·rsd·exact (5 standard deviations; ~1e-6 false-
    alarm rate), and the oracle asserts TRUE. The exact count here is
    gate-only scaffolding; a production job runs just the sketch.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", rsd=0.02)
                - F.countDistinct("l_partkey")
            )
            <= 5 * 0.02 * F.countDistinct("l_partkey")
        ).alias("hll_within_5rsd"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus)    AS g_status,
           GROUPING(o_orderpriority)  AS g_priority,
           COUNT(*)                   AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("aggregate",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals: (status,priority) → (status) → grand total.

    Catalyst implements rollup as one Expand (3 replicas per row) + one
    hash aggregate — one shuffle, not three queries.

    Known cross-engine divergence on EMPTY input (applies to rollup/
    cube/grouping-sets alike): the SQL standard emits the grand-total
    row (aggregates over the empty set) even when the input has no rows
    — DuckDB does — while Spark's rollup/cube emit zero rows. Immaterial
    on any non-empty table; documented rather than papered over with a
    synthetic union that would distort the plan.
    """
    o = table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
    ).select(
        "o_orderstatus", "o_orderpriority", "g_status", "g_priority",
        "n_orders", "sum_total",
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status,
           COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("aggregate",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-set groupings (4 grouping sets for 2 keys) in one pass."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    ).select(
        "l_returnflag", "l_linestatus", "g_flag", "g_status", "n_rows", "sum_qty"
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("aggregate",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via SQL (the DataFrame API has no direct
    grouping-sets builder; Spark SQL is a first-class entry point, §3.2)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "agg_filtered",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE l_quantity > 25)             AS n_big,
           ROUND(COALESCE(SUM(l_extendedprice) FILTER (WHERE l_discount > 0.05), 0), 2)
                                                               AS sum_discounted,
           ROUND(SUM(CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0 END), 2)
                                                               AS sum_taxed
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate",),
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates: FILTER(WHERE) ≡ sum(when(cond, x))."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_big"),
        F.round(
            F.coalesce(F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))), F.lit(0.0)), 2
        ).alias("sum_discounted"),
        F.round(
            F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")).otherwise(0.0)), 2
        ).alias("sum_taxed"),
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(COALESCE(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0), 2) AS qty_F,
           ROUND(COALESCE(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0), 2) AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: rotate l_linestatus values into columns (groupBy().pivot()).

    The explicit value list matters at scale: without it Spark runs an
    extra distinct-collect job over the pivot column to discover values —
    a full pass over the fact table before the real aggregation starts.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 2))
        .select(
            "l_returnflag",
            F.col("F").alias("qty_F"),
            F.col("O").alias("qty_O"),
        )
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
           ROUND(MAX(l_extendedprice), 2)                 AS p_max
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "percentile"),
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (median, p95).

    Spark's percentile() and DuckDB's quantile_cont() both use linear
    interpolation on the sorted values, so the results are comparable to
    the rounding precision. At 100 TB prefer approx_percentile (t-digest
    sketch, mergeable partial state) — exact percentile holds each
    group's values; the exact form is the oracle-checkable baseline.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
        F.round(F.max("l_extendedprice"), 2).alias("p_max"),
    )


@register(
    "agg_argmax",
    oracle="""
    SELECT o_custkey, best_orderkey, ROUND(best_totalprice, 2) AS best_totalprice
    FROM (
      SELECT o_custkey, o_orderkey AS best_orderkey, o_totalprice AS best_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders)
    WHERE rn = 1
    """,
    tags=("aggregate", "argmax"),
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argMax (ClickHouse's argMax / ANSI max_by): per customer, the order
    carrying the highest total price.

    Spelled as MAX over a (value, id) struct rather than max_by(): struct
    comparison is lexicographic, so equal prices deterministically fall
    back to the highest order key — max_by leaves ties undefined. As a
    plain aggregate it keeps map-side partial aggregation (the window
    formulation the oracle uses shuffles whole rows; the struct-max
    shuffles one 16-byte partial per key per partition).
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.max(F.struct("o_totalprice", "o_orderkey")).alias("m"))
        .select(
            "o_custkey",
            F.col("m.o_orderkey").alias("best_orderkey"),
            F.round("m.o_totalprice", 2).alias("best_totalprice"),
        )
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 6)                   AS sd_qty,
           ROUND(var_samp(l_quantity), 6)                      AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6)         AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4)   AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/correlation/covariance.

    All are single-pass mergeable sketches in Spark (Welford-style
    partial states), so they shuffle O(groups) like sum/count — the
    property that keeps corr() over a 100 TB fact table one scan.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) AS bucket,
           count(*) AS n,
           round(min(l_extendedprice), 2) AS lo,
           round(max(l_extendedprice), 2) AS hi,
           round(avg(l_extendedprice), 2) AS mean_price
    FROM lineitem
    GROUP BY bucket
    """,
    tags=("agg",),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (ClickHouse histogram()/width_bucket analog):
    bucket = floor(price/5000) with per-bucket count/min/max/mean. The
    bucket id is computed in the projection, so the aggregate is an
    ordinary partial+final hash agg on ~dozens of keys — the cheapest
    possible shuffle no matter the input size."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.withColumn(
            "bucket", F.floor(F.col("l_extendedprice") / 5000).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
            F.round(F.avg("l_extendedprice"), 2).alias("mean_price"),
        )
    )


@register(
    "agg_bitwise_bool",
    oracle="""
    SELECT l_returnflag,
           bit_or(l_linenumber)  AS flags_or,
           bit_and(l_linenumber) AS flags_and,
           bit_xor(l_orderkey)   AS keys_xor,
           bool_and(l_quantity > 0)     AS all_positive,
           bool_or(l_discount > 0.09)   AS any_deep_discount
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_bitwise_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise and boolean aggregates (ClickHouse groupBitOr/groupBitAnd/
    groupBitXor + every/any analogs). All are associative+commutative, so
    Spark computes them with map-side partials — the shuffle carries one
    long per group per aggregate regardless of input size."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_or("l_linenumber").alias("flags_or"),
        F.bit_and("l_linenumber").alias("flags_and"),
        F.bit_xor("l_orderkey").alias("keys_xor"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
    )


@register(
    "agg_unpivot",
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               round(sum(l_quantity), 2)      AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               round(sum(l_discount), 2)      AS sum_disc
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM wide
    """,
    tags=("agg",),
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (pivot's inverse; DuckDB UNPIVOT / CH arrayJoin
    over a measure map): three per-flag sums melted into (measure, val)
    rows. Spark's native unpivot is a zero-shuffle projection — the only
    exchange is the upstream groupBy."""
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "measure", "val"
    )


@register(
    "agg_entropy",
    oracle="""
    SELECT user_id, round(entropy(event_type), 6) AS type_entropy,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
    tags=("agg", "events"),
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (log2) of each user's event-type distribution —
    ClickHouse/DuckDB entropy() built-in, which Spark lacks. Decomposed
    into two hash aggregates over the same user_id partitioning: counts
    per (user, type), then sum(-p*log2(p)) per user — Catalyst reuses the
    exchange, so it costs one shuffle like the built-in would."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    # NULL types: entropy() is an aggregate and aggregates IGNORE NULLs —
    # the NULL group must contribute neither a term nor probability mass,
    # while n_events (count(*)) still counts every row.
    not_null = F.col("event_type").isNotNull()
    w_total = F.sum(F.when(not_null, F.col("c"))).over(Window.partitionBy("user_id"))
    p = F.col("c") / w_total
    return (
        per_type.withColumn("term", F.when(not_null, -p * F.log2(p)))
        .groupBy("user_id")
        .agg(
            F.round(F.sum("term"), 6).alias("type_entropy"),
            F.sum("c").alias("n_events"),
        )
    )


@register(
    "agg_quantiles_multi",
    oracle="""
    SELECT l_returnflag,
           array_to_string(
               list_transform(quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.9]),
                              v -> CAST(CAST(round(v, 4) AS DECIMAL(18,4)) AS VARCHAR)),
               ',') AS quartiles
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_quantiles_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-quantile in one pass (ClickHouse quantiles(...)(x) analog):
    one sort of each group's values serves all four cut points — four
    separate percentile calls would buffer the group four times.

    The quartile array is serialized to a ','-joined string through a
    DECIMAL(18,4) cast: array-typed output columns are unhashable for the
    driver's row hasher, and double→string casts hit scientific notation
    at different magnitudes per engine — fixed-point decimal formatting
    is identical on both."""
    li = table(spark, sf_dir, "lineitem")
    q = F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.9))")
    return li.groupBy("l_returnflag").agg(
        F.array_join(
            F.transform(
                q, lambda v: F.round(v, 4).cast("decimal(18,4)").cast("string")
            ),
            ",",
        ).alias("quartiles")
    )


@register(
    "agg_moments",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               count(*)              AS n,
               sum(l_quantity)       AS s1,
               sum(l_quantity * l_quantity) AS s2,
               sum(l_quantity * l_quantity * l_quantity) AS s3
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round(s1 / n, 6) AS mean_qty,
           round((s2 / n) - (s1 / n) * (s1 / n), 6) AS var_pop,
           round(((s3 / n) - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / pow((s2 / n) - (s1 / n) * (s1 / n), 1.5), 6) AS skew_pop
    FROM s
    """,
    tags=("agg",),
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population mean/variance/skewness from raw power sums — built-in
    skewness() definitions differ across engines (sample vs population,
    bias correction), so both sides compute the identical moment formula.
    One partial+final aggregate: the shuffle carries four doubles per
    group, the classic mergeable-sketch shape every engine's stats
    aggregates reduce to."""
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
    )
    m1 = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n")
    m3 = F.col("s3") / F.col("n")
    var_pop = m2 - m1 * m1
    return s.select(
        "l_returnflag",
        "n",
        F.round(m1, 6).alias("mean_qty"),
        F.round(var_pop, 6).alias("var_pop"),
        F.round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / F.pow(var_pop, 1.5), 6).alias(
            "skew_pop"
        ),
    )


@register(
    "agg_group_array",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list_distinct(list(event_type))), '|')
             AS types_seen,
           count(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    """,
    tags=("agg", "events"),
)
def agg_group_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-valued aggregate (ClickHouse groupUniqArray): each user's
    distinct event types as a sorted, '|'-joined string. collect_set
    partials merge map-side; the sort makes the order deterministic
    across engines and partition orders, and the join-to-string keeps
    the output hashable for the driver's row comparator (array columns
    are not)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), "|").alias(
            "types_seen"
        ),
        F.countDistinct("event_type").alias("n_types"),
    )


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           TRUE     AS p50_in_rank_band,
           TRUE     AS p95_in_rank_band
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (ClickHouse quantileTDigest analog):
    mergeable constant-memory sketch per group — the 100 TB path where
    exact percentile() would buffer each group's values. accuracy=10000
    bounds rank error at 1/10000.

    Gate rendering: the sketch value differs across engines, so the op
    emits the documented rank-error bound AS the result — each approx
    percentile must lie inside the exact-percentile band p ± 0.01 (100×
    the sketch's guaranteed 1e-4 rank error, slack for interpolation at
    band edges), and the oracle asserts TRUE. The exact percentiles are
    gate-only scaffolding; a production job runs just the sketch.
    """
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    eps = 0.01

    def in_band(p: float, name: str):
        ap = F.approx_percentile(x, F.lit(p), F.lit(10000))
        lo = F.percentile(x, F.lit(p - eps))
        hi = F.percentile(x, F.lit(min(p + eps, 1.0)))
        return ((ap >= lo) & (ap <= hi)).alias(name)

    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        in_band(0.5, "p50_in_rank_band"),
        in_band(0.95, "p95_in_rank_band"),
    )


@register(
    "agg_string_concat",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS nations,
           count(*) AS n
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("aggregate",),
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (DuckDB string_agg / ClickHouse
    groupConcat-style arrayStringConcat(groupArray())): Spark spells it
    array_join(array_sort(collect_list())) — the explicit sort makes the
    concatenation order deterministic, which collect_list alone is NOT
    under parallel merge (same reason dedup keeps min-doc_id, not
    'first'). Collect-aggregates materialize the group in memory: fine
    for bounded groups (nations per region), a skew hazard for unbounded
    ones — prefer the sorted-array form so the bound is visible."""
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_mode",
    oracle="""
    WITH counted AS (
      SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
      FROM lineitem
      GROUP BY l_returnflag, l_quantity
    )
    SELECT l_returnflag, l_quantity AS mode_qty, CAST(cnt AS BIGINT) AS n
    FROM (
      SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY cnt DESC, l_quantity) AS rn
      FROM counted
    )
    WHERE rn = 1
    """,
    tags=("aggregate",),
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent value, ties to the
    lowest value). Built-in mode() is tie-nondeterministic in both
    engines, so this is the two-stage spelling every engine reduces to:
    count per (group, value) — a mergeable partial aggregate — then a
    top-1 window over the tiny counted table. The second stage's input
    is |distinct values| rows per group, not raw rows, so at 100 TB the
    heavy shuffle is the first-stage map-side-combined count only."""
    li = table(spark, sf_dir, "lineitem")
    counted = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_quantity")
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("cnt").cast("long").alias("n"),
        )
    )


@register(
    "agg_sketch_union",
    oracle="""
    SELECT r.r_name AS region,
           CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS hll_within_5rsd
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey   = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("aggregate", "approx"),
)
def agg_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (Datasketches HLL): distinct parts sold per
    supplier NATION are sketched once, then the region level is computed
    by UNIONING the nation sketches — never re-reading the fact table.
    This is the re-aggregation property a 100 TB metrics store is built
    on: daily/per-shard sketches persist as binary columns, and any
    coarser rollup (week, region, all-time) is a cheap sketch union.
    Parts are sold in MANY nations, so the union genuinely dedups across
    inputs — a region's estimate is far below the sum of its nations'.

    Gate rendering (same contract as agg_approx_distinct): sketches
    differ across engines, so the op emits |estimate − exact| ≤ 5·rsd
    ·exact as a boolean the DuckDB exact-count oracle asserts TRUE
    (lgConfigK=12 ⇒ rsd ≈ 1.04/√4096 ≈ 1.6 %). The exact count is
    gate-only scaffolding; production keeps just the sketches.
    """
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = table(spark, sf_dir, "region")
    fact = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
    )
    # Level 1: one fixed-size sketch per nation.
    nation_sk = fact.groupBy("n_regionkey", "n_nationkey").agg(
        F.hll_sketch_agg("l_partkey", 12).alias("sk")
    )
    # Level 2: region = union of its nations' sketches; no fact re-read.
    rsd = 1.04 / (2**12) ** 0.5
    region_est = nation_sk.groupBy("n_regionkey").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    # Gate-only exact counterpart: ordinary partial-distinct aggregate
    # (bounded memory — this is scaffolding, but scaffolding that would
    # itself survive 100 TB).
    region_exact = fact.groupBy("n_regionkey").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    return (
        region_est.join(region_exact, "n_regionkey")
        .join(F.broadcast(r), F.col("n_regionkey") == r["r_regionkey"])
        .select(
            F.col("r_name").alias("region"),
            "exact_parts",
            (
                F.abs(F.col("est") - F.col("exact_parts"))
                <= F.lit(5 * rsd) * F.col("exact_parts")
            ).alias("hll_within_5rsd"),
        )
    )


@register(
    "agg_incremental_merge",
    oracle="""
    SELECT o_orderstatus,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("agg", "clickhouse", "incremental"),
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SummingMergeTree/AggregatingMergeTree-style incremental rollup
    (reference context: the ClickHouse table the reference migrates INTO
    is a MergeTree whose parts merge asynchronously — /root/reference/
    main.py:65 picks the engine): the aggregate state computed over
    yesterday's data MERGES with today's delta by re-aggregation of
    partials — sum of sums, sum of counts — WITHOUT re-reading the
    history. The differential gate proves merged-partials == one-pass
    aggregate over everything (the mergeability law).

    The partial split is a date predicate (< / >= 1999-01-01), both
    partials aggregate with map-side combine, and the merge aggregates
    the UNION of two already-tiny state tables. Money rides exact
    integer cents, so partial+merge is bit-equal to single-pass — no
    float associativity hazard. At 100 TB this is the pattern that turns
    a daily full-table rollup into an append-only delta job."""
    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    split = F.lit("1999-01-01").cast("timestamp")

    def partial(df):
        return df.groupBy(
            "o_orderstatus", F.year("o_orderdate").alias("o_year")
        ).agg(
            F.sum(cents).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )

    base = partial(o.filter(F.col("o_orderdate") < split))
    delta = partial(o.filter(F.col("o_orderdate") >= split))
    return (
        base.unionByName(delta)
        .groupBy("o_orderstatus", "o_year")
        .agg(
            F.sum("revenue_cents").alias("revenue_cents"),
            F.sum("n_orders").alias("n_orders"),
        )
    )


_CMS_SEEDS = 3
_CMS_WIDTH = 256

_CMS_ORACLE = f"""
    WITH seeds AS (SELECT unnest(range({_CMS_SEEDS})) AS seed),
    ev AS (SELECT CAST(user_id AS VARCHAR) AS k, user_id FROM events),
    sketch AS (
        SELECT seed,
               ('0x' || substr(md5(seed::VARCHAR || ':' || k), 1, 8))::BIGINT
                   % {_CMS_WIDTH} AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
        FROM ev CROSS JOIN seeds
        GROUP BY 1, 2
    ),
    keys AS (
        SELECT k, user_id, CAST(count(*) AS BIGINT) AS true_n
        FROM ev GROUP BY 1, 2
    ),
    est AS (
        SELECT kb.user_id, kb.true_n, min(s.cnt) AS est_n
        FROM (SELECT k, user_id, true_n, seed,
                     ('0x' || substr(md5(seed::VARCHAR || ':' || k), 1, 8))::BIGINT
                         % {_CMS_WIDTH} AS bucket
              FROM keys CROSS JOIN seeds) kb
        JOIN sketch s ON kb.seed = s.seed AND kb.bucket = s.bucket
        GROUP BY 1, 2
    )
    SELECT user_id, true_n, est_n, est_n - true_n AS overcount
    FROM est
    ORDER BY true_n DESC, user_id
    LIMIT 10
"""


@register("agg_heavy_hitters_cms", oracle=_CMS_ORACLE, tags=("aggregate", "approx", "sketch"))
def agg_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters: estimate per-user event counts from
    a fixed d×w counter grid (d = 3 rows, w = 256 buckets) instead of a
    full per-key aggregate, and report the top-10 hottest keys with their
    true count, the sketch estimate, and the overcount. The CMS guarantee
    (est ≥ true; est ≤ true + εN w.h.p.) shows up directly as the
    ``overcount ≥ 0`` column.

    Both engines hash with the SAME portable function — the first 8 hex
    chars of ``md5(seed ':' key)`` as an integer, mod w (Spark ``conv``,
    DuckDB ``('0x'||…)::BIGINT``) — so bucket placement, collisions, and
    estimates agree bit-for-bit and the driver hash gate checks the
    sketch itself, not just bounds.

    Scale: the sketch aggregate is d·w = 768 counters after map-side
    partial aggregation — a fixed-size object no matter how many events
    stream through, which is the whole point at 100 TB (a per-key exact
    count of a high-cardinality key would shuffle every key; the sketch
    shuffles 768 rows). The exact per-key pass here exists only to verify
    the estimates; production reads candidates from the sketch."""
    ev = table(spark, sf_dir, "events").select(
        F.col("user_id"), F.col("user_id").cast("string").alias("k")
    )
    seeds = F.array(*[F.lit(i) for i in range(_CMS_SEEDS)])
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("k"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _CMS_WIDTH
    )
    hashed = ev.withColumn("seed", F.explode(seeds)).withColumn("bucket", bucket)
    sketch = hashed.groupBy("seed", "bucket").agg(F.count("*").alias("cnt"))
    keys = (
        ev.groupBy("user_id", "k")
        .agg(F.count("*").alias("true_n"))
        .withColumn("seed", F.explode(seeds))
        .withColumn("bucket", bucket)
    )
    est = (
        keys.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("cnt").alias("est_n"))
    )
    return (
        est.orderBy(F.col("true_n").desc(), "user_id")
        .limit(10)
        .select(
            "user_id",
            "true_n",
            "est_n",
            (F.col("est_n") - F.col("true_n")).alias("overcount"),
        )
    )


@register(
    "agg_sum_map",
    oracle="""
    WITH entries AS (
        SELECT user_id % 10 AS bucket, 'k' AS map_key,
               CAST(json_extract(props, '$.k') AS BIGINT) AS map_val
        FROM events
        UNION ALL
        SELECT user_id % 10, 'cents',
               CAST(floor(value * 100) AS BIGINT)
        FROM events
    )
    SELECT bucket, map_key,
           CAST(sum(map_val) AS BIGINT) AS val_sum,
           CAST(count(*) AS BIGINT) AS n_entries
    FROM entries
    GROUP BY 1, 2
    """,
    tags=("aggregate", "map", "clickhouse"),
)
def agg_sum_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sumMap`` combinator: each row carries a metric map
    and the aggregate merges maps per group by summing values key-wise.
    Here every event contributes ``{'k': props.k, 'cents': ⌊value·100⌋}``
    and groups are user-id buckets; output is the merged map exploded to
    (group, key, sum, contributing-entries) rows.

    The distributed formulation deliberately AVOIDS map-valued aggregate
    state: rows explode to (group, key, value) entries first, then a
    plain hash aggregate with map-side partial combine does the merge —
    the shuffle carries scalar entry rows, never partially-merged maps,
    so skewed groups degrade like any sum, and the final
    ``map_from_entries`` (for consumers wanting the map back) is a
    per-group local fold downstream of the aggregate."""
    ev = table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("k"),
        F.get_json_object("props", "$.k").cast("long"),
        F.lit("cents"),
        F.floor(F.col("value") * 100).cast("long"),
    )
    entries = ev.select(
        (F.col("user_id") % 10).alias("bucket"), F.explode(m)
    ).withColumnsRenamed({"key": "map_key", "value": "map_val"})
    return entries.groupBy("bucket", "map_key").agg(
        F.sum("map_val").alias("val_sum"),
        F.count("*").alias("n_entries"),
    )


@register(
    "agg_corr_regr",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               count(*)                            AS n,
               sum(l_quantity)                     AS sx,
               sum(l_extendedprice)                AS sy,
               sum(l_quantity * l_quantity)        AS sxx,
               sum(l_extendedprice * l_extendedprice) AS syy,
               sum(l_quantity * l_extendedprice)   AS sxy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           round((sxy / n - (sx / n) * (sy / n)), 4) AS covar_pop,
           round((sxy / n - (sx / n) * (sy / n))
                 / sqrt((sxx / n - (sx / n) * (sx / n))
                        * (syy / n - (sy / n) * (sy / n))), 6) AS corr,
           round((sxy / n - (sx / n) * (sy / n))
                 / (sxx / n - (sx / n) * (sx / n)), 6) AS regr_slope,
           round((sy / n) - (sxy / n - (sx / n) * (sy / n))
                 / (sxx / n - (sx / n) * (sx / n)) * (sx / n), 4) AS regr_intercept
    FROM s
    """,
    tags=("agg", "stats", "clickhouse"),
)
def agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group — ClickHouse ``corr`` /
    ``covarPop`` / ``simpleLinearRegression`` analog: Pearson correlation
    and least-squares slope/intercept of extendedprice on quantity.

    Both engines have built-ins (Spark ``corr``/``regr_slope``, DuckDB
    ``corr``/``regr_*``) but their bias corrections differ (sample vs
    population), so — exactly like agg_moments — both sides compute the
    identical closed form from the six power sums (n, Σx, Σy, Σx², Σy²,
    Σxy). That is also the scale-right plan: ONE partial+final hash
    aggregate whose shuffle carries six doubles per group (the mergeable
    sketch every bivariate stat reduces to), then the slope/corr algebra
    runs on the handful of aggregated rows."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov = F.col("sxy") / n - (sx / n) * (sy / n)
    varx = F.col("sxx") / n - (sx / n) * (sx / n)
    vary = F.col("syy") / n - (sy / n) * (sy / n)
    return s.select(
        "l_returnflag",
        n.alias("n"),
        F.round(cov, 4).alias("covar_pop"),
        F.round(cov / F.sqrt(varx * vary), 6).alias("corr"),
        F.round(cov / varx, 6).alias("regr_slope"),
        F.round(sy / n - (cov / varx) * (sx / n), 4).alias("regr_intercept"),
    )


@register(
    "agg_delta_sum",
    oracle="""
    WITH ordered AS (
        SELECT user_id, value,
               lag(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev
        FROM events
    )
    SELECT user_id,
           round(sum(CASE WHEN prev IS NOT NULL AND value > prev
                          THEN value - prev ELSE 0 END), 6) AS delta_sum,
           CAST(count(*) AS BIGINT) AS n_points
    FROM ordered
    GROUP BY user_id
    """,
    tags=("agg", "timeseries", "clickhouse"),
)
def agg_delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``deltaSum`` analog: per series, the sum of positive
    increments of an ordered metric — the counter-reset-tolerant rate
    primitive (a monitoring counter that resets to 0 contributes only
    its growth segments, never the negative reset step).

    One window (lag over the user/time ordering) + one hash aggregate,
    both riding a single user_id hash partitioning — Catalyst collapses
    the window's and aggregate's exchanges into one shuffle. Ordering
    ties break on event_id so both engines see identical neighbor
    pairs. 6-dp rounding keeps IEEE sum-order noise out of the gate."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    inc = F.when(prev.isNotNull() & (F.col("value") > prev), F.col("value") - prev)
    return (
        ev.select("user_id", inc.alias("inc"))
        .groupBy("user_id")
        .agg(
            F.round(F.coalesce(F.sum("inc"), F.lit(0.0)), 6).alias("delta_sum"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )


@register(
    "agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
                                                                 AS w_avg_price,
           ROUND(SUM(l_extendedprice * l_quantity * (1 - l_discount))
                 / SUM(l_quantity), 4)                           AS w_avg_net,
           ROUND(SUM(l_quantity), 2)                             AS total_weight
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate",),
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean as a ratio of two plain sums — the mergeable form
    (ClickHouse ``avgWeighted`` analog; Spark has no built-in weighted
    avg, but SUM(x*w)/SUM(w) gives the identical single-pass partial-
    combine plan a native implementation would).  One O(groups) shuffle.

    Both sides round the *ratio*, not the raw sums: summation order
    differs between engines, but the quotient normalizes the last-ulp
    drift back below the rounding threshold.
    """
    li = table(spark, sf_dir, "lineitem")
    w = F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.col("l_extendedprice") * w) / F.sum(w), 4).alias("w_avg_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * w * (1 - F.col("l_discount"))) / F.sum(w), 4
        ).alias("w_avg_net"),
        F.round(F.sum(w), 2).alias("total_weight"),
    )


@register(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus)    AS BIGINT)  AS g_status,
           CAST(GROUPING(o_orderpriority)  AS BIGINT)  AS g_priority,
           CAST(2 * GROUPING(o_orderstatus)
                  + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           COUNT(*)                                    AS n_orders,
           ROUND(SUM(o_totalprice), 2)                 AS sum_total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("aggregate",),
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with GROUPING()/grouping-id marker columns — the only way a
    rollup consumer can tell "subtotal over NULL-valued rows" apart from
    "this column is aggregated away" (a NULL in the output is ambiguous;
    the grouping bit is not).  Same single-shuffle Expand plan as
    agg_cube; the markers are free metadata on each expanded row.
    Spark's grouping() yields TINYINT and DuckDB's BIGINT — both sides
    cast to BIGINT so the driver's type-tagged hash agrees.

    Known cross-engine divergence (same as agg_rollup/agg_cube, pinned
    in tests/test_empty_input.py): on a ZERO-ROW input Spark's CUBE
    emits zero rows while the SQL standard (and DuckDB) emit the one
    grand-total row — the oracle diverges only on an empty corpus.
    """
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        (
            F.lit(2) * F.grouping("o_orderstatus") + F.grouping("o_orderpriority")
        ).cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
    )


_QEW_ORACLE = """
    WITH w AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v_c,
             CAST(ROUND(l_quantity) AS BIGINT)            AS wt
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    ),
    agg AS (
      SELECT flag, v_c, CAST(SUM(wt) AS BIGINT) AS wt
      FROM w GROUP BY flag, v_c
    ),
    cum AS (
      SELECT flag, v_c,
             CAST(SUM(wt) OVER (PARTITION BY flag ORDER BY v_c) AS BIGINT) AS cw,
             CAST(SUM(wt) OVER (PARTITION BY flag) AS BIGINT)              AS tw
      FROM agg
    )
    SELECT flag,
           CAST(MIN(CASE WHEN cw >= 0.5 * tw THEN v_c END) AS BIGINT) AS med_c,
           CAST(MIN(CASE WHEN cw >= 0.9 * tw THEN v_c END) AS BIGINT) AS p90_c
    FROM cum GROUP BY flag
"""


def weighted_quantiles(
    df: DataFrame, key: str, val: str, weight: str, qs: dict[str, float]
) -> DataFrame:
    """Library API: exact weighted quantiles of integer ``val`` per
    ``key`` — ClickHouse quantileExactWeighted semantics (first value
    whose cumulative weight reaches q·total over the weight-merged
    sorted values). ``qs`` maps output column name → quantile. See
    agg_quantile_exact_weighted for the plan rationale."""
    agg = df.groupBy(key, val).agg(F.sum(weight).alias("__w"))
    cum = agg.select(
        key,
        val,
        F.sum("__w").over(Window.partitionBy(key).orderBy(val)).alias("__cw"),
        F.sum("__w").over(Window.partitionBy(key)).alias("__tw"),
    )
    return cum.groupBy(key).agg(
        *[
            F.min(
                F.when(F.col("__cw") >= F.lit(q) * F.col("__tw"), F.col(val))
            ).alias(name)
            for name, q in qs.items()
        ]
    )


@register(
    "agg_quantile_exact_weighted", oracle=_QEW_ORACLE, tags=("agg", "clickhouse")
)
def agg_quantile_exact_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileExactWeighted`` analog: exact weighted median
    and p90 of the (centi-unit) extended price per return flag, weighted
    by quantity — the duplication-aware quantile (a row with weight w
    counts as w observations, without materializing w rows).

    Construction — the only exact distributed form: merge duplicate
    values first (hash groupBy (key, value): the heavy reduction, fully
    combiner-parallel — the shuffle carries DISTINCT values, bounded by
    the value domain, not row count), then one window pass over the
    per-key sorted distinct values accumulating weight, then pick the
    first value whose cumulative weight clears q·total. Ties between
    engines can't happen: values are unique per key after the merge, so
    the default RANGE window frame and a ROWS frame agree. Values ride
    in exact 10⁻²-dollar BIGINTs end-to-end (no float summation
    anywhere), so the gate needs no rounding tolerance at all."""
    li = table(spark, sf_dir, "lineitem")
    w = li.filter(
        F.col("l_extendedprice").isNotNull() & F.col("l_quantity").isNotNull()
    ).select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v_c"),
        F.round(F.col("l_quantity")).cast("long").alias("wt"),
    )
    return weighted_quantiles(
        w, "flag", "v_c", "wt", {"med_c": 0.5, "p90_c": 0.9}
    )
