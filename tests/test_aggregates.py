"""Semantics tests for the approximate-sketch aggregates.

These ops render their error bound AS the gate result (boolean in-band
columns the DuckDB oracle asserts TRUE — see the op docstrings), so the
raw-estimate accuracy is additionally asserted here against independently
computed exact values."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlite_to_clickhouse_spark.io import table
from sqlite_to_clickhouse_spark.registry import all_queries

_Q = all_queries()


def test_approx_distinct_within_rsd(spark, sf_dir):
    """approx_count_distinct(rsd=0.02) must land within a conservative 5×
    multiple of the configured relative error of the exact count, per
    group (HLL guarantees ~rsd std-dev; 10% absolute bound at rsd=2%) —
    the same bound the op itself emits as ``hll_within_5rsd``."""
    rows = _Q["agg_approx_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["hll_within_5rsd"] is True, (r["l_returnflag"], r.asDict())
    # Independent recomputation of the raw estimate vs exact:
    li = table(spark, sf_dir, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    for r in both.collect():
        rel_err = abs(r["approx_parts"] - r["exact_parts"]) / r["exact_parts"]
        assert rel_err < 0.10, (r["l_returnflag"], r.asDict(), rel_err)


def test_approx_percentile_error_bound(spark, sf_dir):
    # The op's own band columns must hold, and the raw sketch p50/p95 must
    # land within 0.5% of the exact interpolated percentile
    # (accuracy=10000 bounds rank error at 1e-4; 0.5% leaves slack for
    # value-space gaps between ranks).
    rows = _Q["agg_approx_percentile"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p50_in_rank_band"] is True, r.asDict()
        assert r["p95_in_rank_band"] is True, r.asDict()

    li = table(spark, sf_dir, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("ap50"),
        F.approx_percentile("l_extendedprice", F.lit(0.95), F.lit(10000)).alias("ap95"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    )
    for r in both.collect():
        assert abs(r["ap50"] - r["p50"]) / r["p50"] < 0.005, r.asDict()
        assert abs(r["ap95"] - r["p95"]) / r["p95"] < 0.005, r.asDict()


def test_cms_overestimates_every_key(spark, sf_dir):
    # The count-min guarantee est >= true must hold for EVERY key, not
    # only the reported top-10: rebuild the estimate join without the
    # top-k cut and assert the inequality plus the epsilon-N error cap
    # (d=3, w=256 => eps = e/w ~ 0.0106; 3 independent rows make the cap
    # virtually certain on 10k events — treat a breach as a bug, not luck).
    from sqlite_to_clickhouse_spark.operators.aggregates import (
        _CMS_SEEDS,
        _CMS_WIDTH,
    )

    ev = table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    n_total = ev.count()
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
        ev.groupBy("k")
        .agg(F.count("*").alias("true_n"))
        .withColumn("seed", F.explode(seeds))
        .withColumn("bucket", bucket)
    )
    est = (
        keys.join(sketch, ["seed", "bucket"])
        .groupBy("k", "true_n")
        .agg(F.min("cnt").alias("est_n"))
        .collect()
    )
    assert est
    cap = 2.0 * 2.718281828 / _CMS_WIDTH * n_total
    for r in est:
        assert r["est_n"] >= r["true_n"], r.asDict()
        assert r["est_n"] - r["true_n"] <= cap, r.asDict()


def test_weighted_quantiles_match_expansion_reference(spark):
    """weighted_quantiles (the library under agg_quantile_exact_weighted)
    must equal the definitional reference: EXPAND each row into `weight`
    copies and take the classic exact lower quantile (first element at
    cumulative count >= q*n) — property-tested over random weighted
    multisets via hypothesis."""
    from hypothesis import given, settings, strategies as st

    from sqlite_to_clickhouse_spark.operators.aggregates import (
        weighted_quantiles,
    )

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b"]),
                st.integers(min_value=-50, max_value=50),
                st.integers(min_value=1, max_value=9),
            ),
            min_size=1,
            max_size=25,
        )
    )
    def run(rows):
        df = spark.createDataFrame(rows, "k string, v long, w long")
        got = {
            r.k: (r.q50, r.q90)
            for r in weighted_quantiles(
                df, "k", "v", "w", {"q50": 0.5, "q90": 0.9}
            ).collect()
        }
        expect = {}
        for k in {r[0] for r in rows}:
            expanded = sorted(
                v for kk, v, w in rows if kk == k for _ in range(w)
            )
            n = len(expanded)
            # first index i (1-based) with i >= q*n:
            import math

            pick = lambda q: expanded[max(0, math.ceil(q * n) - 1)]  # noqa: E731
            expect[k] = (pick(0.5), pick(0.9))
        assert got == expect

    run()
