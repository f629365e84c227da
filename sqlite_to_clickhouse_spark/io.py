"""Fixture-table loaders.

All driver tables are one parquet file per table under an sf dir
(TESTDATA.md). Parquet scans give Catalyst predicate pushdown, column
pruning, and (on a partitioned layout) partition pruning for free — the
callers just declare filters/projections and the scan narrows itself
(verify with ``df.explain``: ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table (reference R3's engine analog)."""
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name}")
    # Timestamps must mean the same instant the DuckDB oracle sees (naive);
    # pin the session timezone in case the caller's session didn't.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.ts is parquet TIMESTAMP(NANOS), which Spark refuses by default
    # (PARQUET_TYPE_ILLEGAL). Read nanos as long, then convert with integer
    # division (ns epoch values overflow double precision, so no float math).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
