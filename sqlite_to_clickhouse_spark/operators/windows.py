"""Window-function operators (SURVEY.md §2b: window functions).

Includes `dedup_replacing` — the engine analog of the reference's
ReplacingMergeTree + OPTIMIZE semantics (/root/reference/main.py:65-71,178):
keep the latest row per sort key. The reference delegates that merge to
ClickHouse; here it is a window rank + filter, which shuffles each key's
rows to one partition exactly once.

Determinism: every window ORDER BY ends in a unique column (event_id,
o_orderkey, …) so rank/lag results are stable across engines and runs —
a requirement for the driver's value-hash comparison, and good hygiene
anyway (ties = nondeterministic results under retries at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqlite_to_clickhouse_spark.io import table
from sqlite_to_clickhouse_spark.registry import register


@register(
    "window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank per customer, ordered by price."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts, value,
           LAG(value)  OVER w                    AS prev_value,
           LEAD(value) OVER w                    AS next_value,
           ROUND(value - COALESCE(LAG(value) OVER w, 0), 2) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset access along each user's event timeline."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 2).alias("delta"),
    )


@register(
    "window_running",
    oracle="""
    SELECT event_id, user_id, ts,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_sum,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
             AS moving_avg3
    FROM events
    """,
    tags=("window",),
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + 3-row moving average (ROWS frames)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias("running_sum"),
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 50000 PRECEDING AND 50000 FOLLOWING)
             AS n_similar_price
    FROM orders
    """,
    tags=("window",),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range frame: peers within ±50k of each order's price.

    RANGE frames are tie-safe (value-based), so no unique tiebreaker is
    needed for determinism here — equal prices share identical frames.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-50_000, 50_000)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_similar_price"),
    )


@register(
    "dedup_replacing",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value
    FROM (SELECT user_id, event_type, event_id, ts, value,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
    tags=("window", "dedup"),
)
def dedup_replacing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplacingMergeTree semantics (reference main.py:65-71,178): latest
    row per sort key, version = event time (tie-broken by event_id).

    The reference achieves this with an engine-side OPTIMIZE merge; here
    one hash shuffle on the key + per-partition sort does it. At 100 TB
    the shuffle is unavoidable (dedup is a global property) but it is the
    ONLY shuffle, and AQE coalesces the output partitions.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@register(
    "window_ntile",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           ntile(4) OVER w AS quartile,
           CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice ASC NULLS FIRST, o_orderkey)
    """,
    tags=("window",),
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank over a global ordering — WITHOUT the global
    single-partition window (`Window.orderBy(...)` with no partitionBy
    funnels every row through one task; a straggler-killer at scale).

    Distributed-exact plan:
      1. ``repartitionByRange`` on the sort key → partition p holds a
         contiguous key range, and partition ids order with the keys;
      2. per-partition local ``row_number`` (window PARTITIONed BY the
         range-partition id → parallel across partitions);
      3. per-partition counts → cumulative offsets (tiny: one row per
         partition) broadcast back;
      4. global rank = offset + local row number; ntile(4) and
         percent_rank are then closed-form in (rank, n).

    The sort key includes the unique o_orderkey so rank()==row_number()
    (no ties) and both engines order identically.
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranged = o.repartitionByRange(32, "o_totalprice", "o_orderkey").withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("_pid").orderBy("o_totalprice", "o_orderkey")
    with_rn = ranged.withColumn("_rn", F.row_number().over(local_w))

    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # Offsets over ≤32 rows: the single-partition window here is over the
    # per-partition COUNTS (bounded by the partition count), not the data.
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    tot_w = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(tot_w).alias("_n"),
    )

    rank = (F.col("_off") + F.col("_rn")).alias("_rank")
    joined = with_rn.join(F.broadcast(offsets), "_pid").withColumn("_rank", rank)
    # ntile(k): first n%k buckets get ceil(n/k) rows, the rest floor(n/k).
    n, rk = F.col("_n"), F.col("_rank")
    qsize, rem = (n / 4).cast("long"), n % 4
    threshold = rem * (qsize + 1)
    quartile = F.when(rk <= threshold, F.ceil(rk / (qsize + 1))).otherwise(
        rem + F.ceil((rk - threshold) / F.greatest(qsize, F.lit(1)))
    )
    pct = F.when(n == 1, F.lit(0.0)).otherwise(
        ((rk - 1) / (n - 1)).cast("double")
    )
    return joined.select(
        "o_orderkey",
        "o_totalprice",
        quartile.cast("int").alias("quartile"),
        pct.alias("pct_rank"),
    )


@register(
    "window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS latest_order_so_far,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over a running frame: each
    order row sees the customer's first, latest-so-far, and second order.
    The explicit ROWS frame matters — last_value over the default frame
    is just the current row, a classic silent-wrong-answer."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("latest_order_so_far"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@register(
    "window_cume_dist",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(cume_dist() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal), 6) AS bal_cume
    FROM customer
    """,
    tags=("window",),
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist per market segment: each customer's cumulative balance
    percentile. Tie rows share a value by definition, so the output is
    deterministic without a tiebreaker column."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.cume_dist().over(w), 6).alias("bal_cume"),
    )


@register(
    "window_time_range",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS cnt_1h,
           round(sum(value) OVER w, 2) AS sum_value_1h
    FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s FROM events) e
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "events"),
)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user activity (event count + value sum) — a
    time-interval RANGE frame (CH neighbor-window / streaming sliding
    window, computed batch-side). Ordering on integer epoch seconds keeps
    the frame arithmetic engine-independent; peers at the same second
    share a frame, so the output needs no tiebreaker."""
    ev = table(spark, sf_dir, "events").withColumn(
        "epoch_s", F.unix_timestamp("ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("cnt_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_value_1h"),
    )


@register(
    "window_median",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           ROUND(median(l_quantity)
                 OVER (PARTITION BY l_returnflag), 4)        AS med_qty,
           ROUND(quantile_cont(l_quantity, 0.25)
                 OVER (PARTITION BY l_returnflag), 4)        AS q25_qty,
           ROUND(quantile_cont(l_quantity, 0.75)
                 OVER (PARTITION BY l_returnflag), 4)        AS q75_qty
    FROM lineitem
    """,
    tags=("window",),
)
def window_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median / quartiles as analytic (whole-partition) window aggregates:
    every row carries its partition's exact linear-interpolation
    percentile (Spark percentile() == DuckDB median/quantile_cont to 4
    decimals). No ORDER BY in the window spec, so the frame is the whole
    partition and Spark evaluates the aggregate once per partition, not
    once per row. Exact percentiles require the partition's values
    together — at 100 TB use few large partitions here (or the
    approx_percentile sketch in agg_approx_percentile) rather than a
    global exact percentile."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        F.round(F.percentile("l_quantity", F.lit(0.5)).over(w), 4).alias("med_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.25)).over(w), 4).alias("q25_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.75)).over(w), 4).alias("q75_qty"),
    )


@register(
    "window_rolling_distinct",
    oracle="""
    SELECT event_id, event_type,
           count(DISTINCT user_id)
               OVER (PARTITION BY event_type ORDER BY event_id
                     ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)
               AS uniq_users_100
    FROM events
    """,
    tags=("window", "events"),
)
def window_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct-user count over the last 100 events per event
    type. Spark has no count(DISTINCT) window, so the idiom is
    size(collect_set() OVER frame) — semantically identical (DuckDB
    states it directly). The set is bounded by the 100-row frame, so
    per-row state is small regardless of table size; the partition key
    keeps the window parallel across event types."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(-99, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.size(F.collect_set("user_id").over(w)).alias("uniq_users_100"),
    )


@register(
    "window_fill_forward",
    oracle="""
    WITH gapped AS (
        SELECT event_id, user_id,
               CASE WHEN CAST(FLOOR(value * 100) AS BIGINT) % 7 = 0 THEN NULL
                    ELSE CAST(FLOOR(value * 100) AS BIGINT) END AS v
        FROM events
    )
    SELECT event_id, user_id, v,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM gapped
    """,
    tags=("window", "events"),
)
def window_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (LOCF — last observation carried forward) over a
    gappy series: nulls (synthesized deterministically as every
    cents%7==0 reading) take the most recent non-null value of the same
    user. Spark spells it last(col, ignorenulls=True) over a running
    frame; a leading null stays null. The running frame is evaluated
    incrementally per partition — no per-row rescan — and the only
    shuffle is the user_id partitioning."""
    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    gapped = ev.select(
        "event_id",
        "user_id",
        F.when(cents % 7 == 0, F.lit(None).cast("long")).otherwise(cents).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return gapped.select(
        "event_id",
        "user_id",
        "v",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )


@register(
    "window_ratio_to_report",
    oracle="""
    WITH cents AS (
        SELECT c_custkey, c_mktsegment,
               CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cb
        FROM customer
    )
    SELECT c_custkey, c_mktsegment, cb,
           FLOOR(CAST(cb AS DOUBLE)
                 / sum(cb) OVER (PARTITION BY c_mktsegment)
                 * 1000000) / 1000000 AS seg_share
    FROM cents
    """,
    tags=("window",),
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each customer's share of their segment's total
    balance — the share-of-total window every BI layer needs (Oracle
    RATIO_TO_REPORT; ClickHouse does it with a subquery join). Balances
    go through integer cents so the partition sum is exact and the
    division engine-identical; one whole-partition window, no
    self-join."""
    c = table(spark, sf_dir, "customer")
    cb = F.floor(F.col("c_acctbal") * 100).cast("long")
    w = Window.partitionBy("c_mktsegment")
    cents = c.select("c_custkey", "c_mktsegment", cb.alias("cb"))
    return cents.select(
        "c_custkey",
        "c_mktsegment",
        "cb",
        (
            F.floor(F.col("cb").cast("double") / F.sum("cb").over(w) * 1_000_000)
            / 1_000_000
        ).alias("seg_share"),
    )


@register(
    "window_distribution",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           ntile(4) OVER w                              AS qtile,
           ROUND(percent_rank() OVER w, 6)              AS pct_rank,
           ROUND(cume_dist() OVER w, 6)                 AS cum_dist
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag
                 ORDER BY l_quantity, l_orderkey, l_linenumber)
    """,
    tags=("window",),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile quartiles, percent_rank,
    cume_dist per return-flag partition.

    ntile's bucket assignment depends on ROW order (not just key order),
    so the window orders by (l_quantity, l_orderkey, l_linenumber) — a
    unique composite — making every function here deterministic and
    engine-identical under ties. One hash shuffle on the partition key,
    then a per-partition sort scan; rank family never materializes the
    partition, so a skewed flag degrades to spill-sort, not OOM."""
    li = table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity", "l_orderkey", "l_linenumber")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.ntile(4).over(w).alias("qtile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


@register(
    "window_interpolate_linear",
    oracle="""
    WITH gapped AS (
        SELECT event_id, user_id,
               CASE WHEN CAST(FLOOR(value * 100) AS BIGINT) % 7 = 0 THEN NULL
                    ELSE CAST(FLOOR(value * 100) AS BIGINT) END AS v
        FROM events
    ),
    bounded AS (
        SELECT event_id, user_id, v,
               last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN event_id END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS px,
               first_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN event_id END
                           IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
        FROM gapped
    )
    SELECT event_id, user_id, v,
           round(CASE
               WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
               WHEN px IS NOT NULL AND nx IS NOT NULL THEN
                   CAST(pv AS DOUBLE)
                   + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                     * (CAST(event_id AS DOUBLE) - CAST(px AS DOUBLE))
                     / (CAST(nx AS DOUBLE) - CAST(px AS DOUBLE))
               WHEN px IS NULL THEN CAST(nv AS DOUBLE)
               ELSE CAST(pv AS DOUBLE)
           END, 6) AS v_interp
    FROM bounded
    """,
    tags=("window", "events", "timeseries"),
)
def window_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation over a gappy per-user series (nulls
    synthesized as every cents%7==0 reading, same scheme as
    window_fill_forward): each null takes the straight line between its
    nearest non-null neighbors on the event_id axis; leading/trailing
    gaps clamp to the nearest known value. Non-null rows short-circuit
    to their own value (they'd otherwise hit 0/0: both neighbors are the
    row itself).

    Four running-frame windows over ONE user_id partitioning — Spark
    evaluates all four in a single Window node pair (forward + backward
    frame), so the cost is one shuffle and two linear passes per
    partition regardless of gap width; a per-gap subquery would be
    quadratic in gap length. The arithmetic is integer-cents promoted to
    double in the identical expression order as the oracle."""
    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    gapped = ev.select(
        "event_id",
        "user_id",
        F.when(cents % 7 == 0, F.lit(None).cast("long")).otherwise(cents).alias("v"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    x_if_known = F.when(F.col("v").isNotNull(), F.col("event_id"))
    b = gapped.select(
        "event_id",
        "user_id",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(x_if_known, ignorenulls=True).over(wb).alias("px"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(x_if_known, ignorenulls=True).over(wf).alias("nx"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v").cast("double"))
        .when(
            F.col("px").isNotNull() & F.col("nx").isNotNull(),
            F.col("pv").cast("double")
            + (F.col("nv").cast("double") - F.col("pv").cast("double"))
            * (F.col("event_id").cast("double") - F.col("px").cast("double"))
            / (F.col("nx").cast("double") - F.col("px").cast("double")),
        )
        .when(F.col("px").isNull(), F.col("nv").cast("double"))
        .otherwise(F.col("pv").cast("double"))
    )
    return b.select(
        "event_id", "user_id", "v", F.round(interp, 6).alias("v_interp")
    )


EWMA_FRAME = 16  # truncation depth: weights below 2^-16 are dropped


@register(
    "window_ewma",
    oracle=f"""
    SELECT event_id, user_id,
           FLOOR(list_aggregate(list_transform(
               list_reverse(list_filter(list(value) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN {EWMA_FRAME - 1} PRECEDING AND CURRENT ROW),
                   v -> v IS NOT NULL)),
               (v, k) -> v * 0.5 ** k), 'sum') * 1000000) / 1000000 AS ewma
    FROM events
    """,
    tags=("window", "events", "timeseries"),
)
def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α = 1/2) per user series —
    the streaming-metrics smoother ClickHouse spells
    exponentialMovingAverage. EWMA is recursive (y_i depends on y_{i-1}),
    which plain SQL windows can't express; the closed form
    y_i = Σ_k α(1−α)^k·x_{i−k} CAN be, truncated at 16 terms (the dropped
    tail is < 2^-16 of the signal).

    α = 1/2 is deliberate: the weights 2^-k are exact binary powers, so
    each product is exact (exponent shift) and both engines fold the same
    16 doubles in the same order — the differential gate gets bit-equal
    sums, where an arbitrary α would drift in the last ulp (the output
    truncates via FLOOR·1e6, not round(…, 6) — four fixture rows land
    EXACTLY on the 6-decimal rounding boundary, where Spark rounds
    half-up and DuckDB half-even). The frame's
    collect_list is bounded (16 elements), so memory per row is constant
    and the only shuffle is the user_id partitioning.

    NULL samples: Spark's collect_list silently DROPS NULLs while
    DuckDB's list() keeps them, so the oracle applies list_filter to get
    the same compacted series — EWMA-over-present-samples semantics on
    both sides (a missing reading shifts the weights to the previous
    present ones, it does not zero a term)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-(EWMA_FRAME - 1), Window.currentRow)
    )
    frame_rev = F.reverse(F.collect_list("value").over(w))
    ewma = F.aggregate(
        F.transform(
            frame_rev,
            lambda v, k: v * F.pow(F.lit(0.5), k.cast("double") + 1.0),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # No present samples in the frame (e.g. a user's first reading is
    # NULL) ⇒ the EWMA is undefined: NULL, not the fold's 0.0 seed —
    # matching the oracle, where sum-over-empty-list is NULL.
    #
    # Double-domain floor: Spark's floor(double) returns LONG and clamps
    # at ±2⁶³ (the extreme-numerics sweep caught the op pinned to exactly
    # Long.MAX/1e6 on ±1e15 inputs) while DuckDB's FLOOR stays DOUBLE.
    # Above 2⁵² every double is already an integer, so floor is the
    # identity there — branching on that bound reproduces DuckDB's
    # double floor exactly at every magnitude.  NaN must take the
    # identity branch too (abs(NaN) >= 2⁵² is false, and Spark's
    # floor(NaN) casts to LONG 0 while DuckDB's FLOOR keeps NaN).
    scaled = ewma * 1000000
    dfloor = F.when(
        F.isnan(scaled) | (F.abs(scaled) >= F.lit(float(2**52))), scaled
    ).otherwise(F.floor(scaled).cast("double"))
    return ev.select(
        "event_id",
        "user_id",
        F.when(F.size(frame_rev) > 0, dfloor / 1000000).alias("ewma"),
    )
